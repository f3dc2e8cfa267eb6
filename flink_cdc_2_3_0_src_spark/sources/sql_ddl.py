"""SQL DDL entry point — ``CREATE TABLE ... WITH ('connector'=...)``.

The reference's MAIN user surface (SURVEY §3.1): the planner looks up a
table factory by the ``connector`` option, the factory validates the
WITH options, resolves startup mode, and builds the source with the
declared physical schema plus requested metadata columns
(MySqlTableSourceFactory.java:81-150, MySqlTableSource.java:94-251).

Spark re-expression: ``create_table_source(ddl)`` parses the DDL once
and returns a ``ResolvedTable`` — declared physical schema
(Flink-DDL-typed), the per-dialect metadata column plan, the primary
key, and a configured ``CdcSource`` built through the same builder
classes the DataStream API uses (one option-validation path, exactly
like the reference routing both APIs through the same config).

Scope: physical columns, ``METADATA [FROM 'key'] [VIRTUAL]`` columns,
computed columns (``name AS expr [COMMENT '...']``),
``WATERMARK FOR ts AS ts - INTERVAL '<n>' <unit>`` (mapped onto
Spark's ``withWatermark`` delay via ``apply_watermark``), and
``PRIMARY KEY (...) NOT ENFORCED``.  Computed columns are EXCLUDED from
the physical schema exactly like the reference (physical-schema
extraction at MySqlTableSourceFactory.java:101-102 filters to
``Column.isPhysical()``; the Flink planner applies the expressions as a
projection after decode) — here ``apply_computed`` lifts each stored
expression with ``F.expr`` onto the decoded frame, in declaration order
so later computed columns may reference earlier ones.  ``PROCTIME()``
is rejected with a clear error: a processing-time attribute has no
meaning on a replayed/batch changelog (use ``current_timestamp()``
downstream if wall-clock tagging is really wanted).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.sources import api as _api
from flink_cdc_2_3_0_src_spark.types import flink_type_to_spark

# factory registry — identifier -> builder class, mirroring Flink's
# Factory.factoryIdentifier() discovery (unknown identifiers fail with
# the same "could not find factory" shape)
FACTORIES = {
    "mysql-cdc": _api.MySqlSourceBuilder,
    "postgres-cdc": _api.PostgresSourceBuilder,
    "mongodb-cdc": _api.MongoDBSourceBuilder,
    "oracle-cdc": _api.OracleSourceBuilder,
    "sqlserver-cdc": _api.SqlServerSourceBuilder,
    "db2-cdc": _api.Db2SourceBuilder,
    "tidb-cdc": _api.TiDBSourceBuilder,
    "oceanbase-cdc": _api.OceanBaseSourceBuilder,
}

# per-dialect readable-metadata keys (§1.5): MySqlReadableMetadata,
# MongoDBReadableMetadata (collection_name), OracleReadableMetaData
# (schema_name), OceanBaseReadableMetadata (tenant_name)
_COMMON_META = {"database_name", "table_name", "op_ts"}
METADATA_KEYS = {
    "mysql-cdc": _COMMON_META,
    "postgres-cdc": _COMMON_META | {"schema_name"},
    "mongodb-cdc": {"database_name", "collection_name", "op_ts"},
    "oracle-cdc": _COMMON_META | {"schema_name"},
    "sqlserver-cdc": _COMMON_META | {"schema_name"},
    "db2-cdc": _COMMON_META | {"schema_name"},
    "tidb-cdc": _COMMON_META,
    "oceanbase-cdc": _COMMON_META | {"tenant_name"},
}

_CREATE_WITH = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>[`\"\w.]+)\s*\((?P<body>.*)\)\s*"
    r"WITH\s*\((?P<opts>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPT_PAIR = re.compile(
    r"'(?P<k>(?:[^']|'')*)'\s*=\s*'(?P<v>(?:[^']|'')*)'"
)
_META_COL = re.compile(
    r"^[`\"]?(?P<name>\w+)[`\"]?\s+(?P<type>.+?)\s+METADATA"
    r"(?:\s+FROM\s+'(?P<key>[^']+)')?(?:\s+VIRTUAL)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PHYS_COL = re.compile(
    r"^[`\"]?(?P<name>\w+)[`\"]?\s+(?P<type>.+?)"
    r"(?P<rest>(?:\s+NOT\s+NULL|\s+COMMENT\s+'(?:[^']|'')*')*)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PK_CLAUSE = re.compile(
    r"^(?:CONSTRAINT\s+[`\"\w]+\s+)?PRIMARY\s+KEY\s*\((?P<cols>[^)]*)\)"
    r"(?:\s+NOT\s+ENFORCED)?\s*$",
    re.IGNORECASE,
)
# WATERMARK FOR ts_col AS ts_col - INTERVAL '5' SECOND — Flink's
# event-time declaration; Spark's counterpart is
# df.withWatermark(ts_col, "5 seconds") on the stream
_WATERMARK_CLAUSE = re.compile(
    r"^WATERMARK\s+FOR\s+[`\"]?(?P<col>\w+)[`\"]?\s+AS\s+(?P<expr>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_WATERMARK_DELAY = re.compile(
    r"^[`\"]?(?P<col>\w+)[`\"]?\s*-\s*INTERVAL\s+'(?P<n>\d+(?:\.\d+)?)'\s+"
    r"(?P<unit>SECOND|SECONDS|MINUTE|MINUTES|HOUR|HOURS|DAY|DAYS)\s*$",
    re.IGNORECASE,
)


@dataclass
class ResolvedTable:
    name: str
    connector: str
    physical_schema: T.StructType
    primary_key: list[str]
    # (output column name, metadata key) in declaration order
    metadata_columns: list = field(default_factory=list)
    # (output column name, SQL expression string) in declaration order
    computed_columns: list = field(default_factory=list)
    # (event-time column, Spark delay string like "5 seconds"), from the
    # DDL's WATERMARK FOR clause; None when the DDL declares none
    watermark: Optional[tuple] = None
    source: object = None
    options: dict = field(default_factory=dict)

    def append_metadata(self, df: DataFrame) -> DataFrame:
        """Project the declared metadata columns onto a decoded frame
        that carries the engine's _db/_schema/_table/_tenant/_op_ts
        columns (applyReadableMetadata: metadata appended after
        physical columns, in declaration order)."""
        from pyspark.sql import functions as F

        from flink_cdc_2_3_0_src_spark.model import (
            DB_COL,
            SCHEMA_COL,
            TABLE_COL,
            TENANT_COL,
            TS_COL,
        )

        src = {
            "database_name": DB_COL,
            "schema_name": SCHEMA_COL,
            "table_name": TABLE_COL,
            "collection_name": TABLE_COL,  # Mongo: collection IS the table part
            "tenant_name": TENANT_COL,
            "op_ts": TS_COL,
        }
        out = df
        for col_name, key in self.metadata_columns:
            out = out.withColumn(col_name, F.col(src[key]))
        return out

    def apply_watermark(self, stream_df: DataFrame) -> DataFrame:
        """Apply the DDL's WATERMARK declaration to a streaming frame —
        Flink's ``WATERMARK FOR ts AS ts - INTERVAL '5' SECOND`` maps
        one-to-one onto Spark's ``withWatermark(ts, '5 seconds')`` (the
        late-data bound for windowed aggregation/dedup state eviction).
        No-op when the DDL declares no watermark."""
        if self.watermark is None:
            return stream_df
        col, delay = self.watermark
        return stream_df.withWatermark(col, delay)

    def apply_computed(self, df: DataFrame) -> DataFrame:
        """Apply the DDL's computed columns (``name AS expr``) onto a
        decoded frame, in declaration order — so a later computed
        column may reference an earlier one, as in Flink.  Mirrors the
        planner-side projection the reference delegates computed
        columns to (they are never part of the physical row the
        deserializer produces)."""
        from pyspark.sql import functions as F

        out = df
        for col_name, expr_str in self.computed_columns:
            out = out.withColumn(col_name, F.expr(expr_str))
        return out


def _split_top_level(body: str) -> list[str]:
    """Split column defs on commas outside (), <> and '...'."""
    parts, depth, cur, in_str = [], 0, [], False
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                if i + 1 < n and body[i + 1] == "'":
                    cur.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
        elif ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def parse_with_options(opts: str) -> dict:
    """The WITH ('k'='v', ...) option list ('' = escaped quote)."""
    return {
        m.group("k").replace("''", "'"): m.group("v").replace("''", "'")
        for m in _OPT_PAIR.finditer(opts)
    }


_TRAILING_COMMENT = re.compile(
    r"\s+COMMENT\s+'(?:[^']|'')*'\s*$", re.IGNORECASE
)
_PROCTIME = re.compile(r"\bPROCTIME\s*\(", re.IGNORECASE)


def _parse_computed(part: str, as_end: int) -> tuple[str, str]:
    """Split ``name AS expr [COMMENT '...']`` at the (quote-aware)
    ``AS`` whose end index is ``as_end``; returns (name, expr)."""
    name = part[: as_end - 2].strip().strip('`" ')
    if not re.fullmatch(r"\w+", name):
        raise ValueError(f"unparseable computed column def: {part!r}")
    expr_str = part[as_end:].strip()
    # a trailing column COMMENT is DDL syntax, not part of the
    # expression — strip it only when the COMMENT keyword itself sits
    # outside any quoted literal of the expression
    from flink_cdc_2_3_0_src_spark.streaming.table_changes import (
        _find_keyword_outside_quotes,
    )

    j = _find_keyword_outside_quotes(expr_str, "COMMENT")
    if j >= 0:
        m = _TRAILING_COMMENT.search(expr_str)
        if m and m.start() < j <= m.end():
            expr_str = expr_str[: m.start()].strip()
    # PROCTIME() — Flink's processing-time attribute.  The reference
    # never materializes it either: physical-schema extraction excludes
    # computed columns and delegates them to the planner
    # (MySqlTableSourceFactory.java:101-102), where PROCTIME() is
    # evaluated at row-processing time.  Map it to Spark's
    # current_timestamp(), with a documented semantic difference:
    # Spark pins current_timestamp() to QUERY-START time (constant
    # across the batch / within each micro-batch), while Flink stamps
    # each row as the operator touches it.  Both are "wall-clock when
    # processed, not event time", which is the attribute's contract;
    # row-granular drift within a batch is not reproducible in either
    # engine and must not be relied on.  Temporal-table-function joins
    # (FOR SYSTEM_TIME AS OF proc) are a query-side construct and are
    # not claimed by this mapping.
    if _PROCTIME.search(expr_str):
        bad = re.search(r"\bPROCTIME\s*\(\s*[^)\s]", expr_str, re.IGNORECASE)
        if bad:
            raise ValueError(
                f"PROCTIME takes no arguments: {part!r}"
            )
        expr_str = re.sub(
            r"\bPROCTIME\s*\(\s*\)", "current_timestamp()", expr_str,
            flags=re.IGNORECASE,
        )
    if not expr_str:
        raise ValueError(f"computed column has empty expression: {part!r}")
    return name, expr_str


def create_table_source(ddl: str) -> ResolvedTable:
    m = _CREATE_WITH.match(ddl)
    if not m:
        raise ValueError(
            "not a CREATE TABLE ... WITH (...) statement (the §3.1 SQL "
            "entry point needs both the column list and the WITH options)"
        )
    options = parse_with_options(m.group("opts"))
    connector = options.pop("connector", None)
    if connector not in FACTORIES:
        raise ValueError(
            f"could not find a factory for connector {connector!r}; "
            f"available identifiers: {sorted(FACTORIES)}"
        )
    fields: list[T.StructField] = []
    meta_cols: list = []
    computed_cols: list = []
    pk: list[str] = []
    allowed_meta = METADATA_KEYS[connector]
    watermark = None
    for part in _split_top_level(m.group("body")):
        pkm = _PK_CLAUSE.match(part)
        if pkm:
            pk = [c.strip().strip('`" ') for c in pkm.group("cols").split(",")]
            continue
        wm = _WATERMARK_CLAUSE.match(part)
        if wm:
            expr_str = wm.group("expr").strip()
            dm = _WATERMARK_DELAY.match(expr_str)
            if not dm or dm.group("col") != wm.group("col"):
                raise ValueError(
                    f"unsupported WATERMARK expression {expr_str!r}: only "
                    "the canonical '<ts_col> - INTERVAL '<n>' <unit>' form "
                    "maps onto Spark's withWatermark delay"
                )
            unit = dm.group("unit").lower().rstrip("s") + "s"
            n = dm.group("n")
            if "." in n and unit != "seconds":
                # Flink accepts INTERVAL '2.5' MINUTE; Spark's interval
                # parser only takes fractions on SECOND — normalize to
                # milliseconds (Flink watermark precision is ms anyway)
                from fractions import Fraction

                per_ms = {"minutes": 60_000, "hours": 3_600_000,
                          "days": 86_400_000}[unit]
                ms = Fraction(n) * per_ms
                if ms.denominator != 1:
                    raise ValueError(
                        f"WATERMARK delay {n!r} {unit} is finer than "
                        "millisecond precision"
                    )
                n, unit = str(ms.numerator), "milliseconds"
            watermark = (wm.group("col"), f"{n} {unit}")
            continue
        from flink_cdc_2_3_0_src_spark.streaming.table_changes import (
            _find_keyword_outside_quotes,
        )

        # quote-aware: a COMMENT 'used AS label' must not trip this
        as_end = _find_keyword_outside_quotes(part, "AS")
        if as_end >= 0 and "METADATA" not in part.upper():
            computed_cols.append(_parse_computed(part, as_end))
            continue
        mm = _META_COL.match(part)
        if mm:
            key = mm.group("key") or mm.group("name")
            if key not in allowed_meta:
                raise ValueError(
                    f"connector {connector!r} exposes no metadata key "
                    f"{key!r}; available: {sorted(allowed_meta)}"
                )
            meta_cols.append((mm.group("name"), key))
            continue
        cm = _PHYS_COL.match(part)
        if not cm:
            raise ValueError(f"unparseable column def: {part!r}")
        nullable = not re.search(r"NOT\s+NULL", cm.group("rest") or "", re.IGNORECASE)
        fields.append(
            T.StructField(
                cm.group("name"),
                flink_type_to_spark(cm.group("type")),
                nullable,
            )
        )
    phys_names = {f_.name for f_ in fields}
    missing_pk = [c for c in pk if c not in phys_names]
    if missing_pk:
        raise ValueError(f"PRIMARY KEY names unknown columns: {missing_pk}")
    from collections import Counter

    counts = Counter(
        [f_.name for f_ in fields]
        + [n for n, _ in meta_cols]
        + [n for n, _ in computed_cols]
    )
    dupes = sorted(n for n, c in counts.items() if c > 1)
    if dupes:
        raise ValueError(f"duplicate column names in DDL: {dupes}")
    if watermark is not None and watermark[0] not in counts:
        raise ValueError(
            f"WATERMARK column {watermark[0]!r} is not a declared column"
        )
    builder = FACTORIES[connector]()
    builder._c = SourceConfig.from_options(options)
    source = builder.build()
    return ResolvedTable(
        name=m.group("name").strip('`"'),
        connector=connector,
        physical_schema=T.StructType(fields),
        primary_key=pk,
        metadata_columns=meta_cols,
        computed_columns=computed_cols,
        watermark=watermark,
        source=source,
        options=options,
    )
