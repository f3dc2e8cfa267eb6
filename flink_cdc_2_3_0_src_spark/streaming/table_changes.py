"""Structured schema-change model + DDL parsing (A25 payload fidelity).

The reference persists schema history as STRUCTURED TableChange records
(FlinkJsonTableChangeSerializer.java: {type, id, table: {columns[...],
primaryKeyColumnNames}}), not opaque DDL strings — consumers can
interpret what changed.  This module supplies the Spark-side
equivalent:

  - ``TableChange`` / ``ColumnSpec``: the typed change record, with
    ``to_json``/``from_json`` in the serializer's field layout.
  - ``parse_ddl``: CREATE TABLE / ALTER TABLE ADD|DROP|MODIFY|RENAME
    COLUMN / RENAME TO / DROP TABLE → TableChange, using the shared
    MySQL type mapping (types.py, MySqlTypeUtils.java parity).
  - ``apply_change``: evolve a StructType by a TableChange — the hook
    SchemaHistory uses so a DDL payload yields the next decode schema
    instead of being carried opaquely.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.types import mysql_type_to_spark

CREATE, ALTER, DROP, NOOP = "CREATE", "ALTER", "DROP", "NOOP"


@dataclass
class ColumnSpec:
    name: str
    type_expression: str  # source-side type DDL, e.g. "DECIMAL(12,2)"
    optional: bool = True
    position: int = 0
    # raw DDL DEFAULT expression (Debezium carries this as
    # defaultValueExpression in its table-change JSON; the reference's
    # customer.sql default_value_test table exercises it) — None when
    # the column has no default
    default_value: Optional[str] = None
    # column-level CHARACTER SET (Debezium's column JSON carries this
    # as charsetName; the charset ITCase's tables declare per-column
    # charsets) — None means the table/connection default (UTF-8 here)
    charset: Optional[str] = None

    def spark_type(self) -> T.DataType:
        return mysql_type_to_spark(self.type_expression)

    def metadata(self) -> dict:
        """StructField metadata carrying the default + charset through
        schema persistence (StructType.json() round-trips metadata)."""
        md: dict = {}
        if self.default_value is not None:
            md["default"] = self.default_value
        if self.charset is not None:
            md["charset"] = self.charset
        return md


@dataclass
class TableChange:
    type: str  # CREATE | ALTER | DROP
    table_id: str
    columns: list[ColumnSpec] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    dropped_columns: list[str] = field(default_factory=list)
    renamed_columns: dict[str, str] = field(default_factory=dict)
    new_table_id: Optional[str] = None

    # -- FlinkJsonTableChangeSerializer-shaped JSON ------------------
    def to_json(self) -> str:
        doc = {
            "type": self.type,
            "id": self.table_id,
            "table": {
                "primaryKeyColumnNames": list(self.primary_key),
                "columns": [
                    {
                        "name": c.name,
                        "typeExpression": c.type_expression,
                        "optional": c.optional,
                        "position": c.position,
                        **(
                            {"defaultValueExpression": c.default_value}
                            if c.default_value is not None
                            else {}
                        ),
                        **(
                            {"charsetName": c.charset}
                            if c.charset is not None
                            else {}
                        ),
                    }
                    for c in self.columns
                ],
            },
        }
        if self.dropped_columns:
            doc["droppedColumns"] = list(self.dropped_columns)
        if self.renamed_columns:
            doc["renamedColumns"] = dict(self.renamed_columns)
        if self.new_table_id:
            doc["newId"] = self.new_table_id
        return json.dumps(doc, separators=(",", ":"))

    @classmethod
    def from_json(cls, s: str) -> "TableChange":
        doc = json.loads(s)
        t = doc.get("table", {})
        return cls(
            type=doc["type"],
            table_id=doc["id"],
            columns=[
                ColumnSpec(
                    name=c["name"],
                    type_expression=c.get("typeExpression", "TEXT"),
                    optional=c.get("optional", True),
                    position=c.get("position", i + 1),
                    default_value=c.get("defaultValueExpression"),
                    charset=c.get("charsetName"),
                )
                for i, c in enumerate(t.get("columns", []))
            ],
            primary_key=list(t.get("primaryKeyColumnNames", [])),
            dropped_columns=list(doc.get("droppedColumns", [])),
            renamed_columns=dict(doc.get("renamedColumns", {})),
            new_table_id=doc.get("newId"),
        )

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(c.name, c.spark_type(), c.optional, c.metadata())
                for c in sorted(self.columns, key=lambda c: c.position)
            ]
        )


_IDENT = r"(?:`(?P<q{n}>[^`]+)`|(?P<u{n}>[A-Za-z_][A-Za-z0-9_$]*))"


def _ident(n: int) -> str:
    return _IDENT.format(n=n)


def _get_ident(m: re.Match, n: int) -> str:
    return m.group(f"q{n}") or m.group(f"u{n}")


_COL_DEF = re.compile(
    r"^\s*" + _ident(1) + r"\s+(?P<type>[A-Za-z]+(?:\s*\([^)]*\))?(?:\s+unsigned)?)"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)

_CREATE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<id>\S+)\s*\((?P<body>.*)\)\s*"
    r"(?:[A-Za-z]+=\S+\s*)*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<id>\S+)\s+(?P<rest>.*?);?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<id>\S+)\s*;?\s*$", re.IGNORECASE
)
# statements that change no column layout: recognized so a binlog replay
# does not crash on them (Debezium likewise passes them through)
_SCHEMA_NOOP = re.compile(
    r"^\s*(?:TRUNCATE\s+TABLE\s+(?P<id1>\S+)"
    r"|CREATE\s+(?:UNIQUE\s+)?INDEX\s+\S+\s+ON\s+(?P<id2>\S+)"
    r"|DROP\s+INDEX\s+\S+\s+ON\s+(?P<id3>\S+)"
    r"|ANALYZE\s+TABLE\s+(?P<id4>\S+)"
    r"|OPTIMIZE\s+TABLE\s+(?P<id5>\S+))",
    re.IGNORECASE,
)
# ALTER clauses that add/drop INDEXES or CONSTRAINTS, not columns — the
# ADD-COLUMN regex must never see these (it would misparse 'ADD INDEX
# idx_v (v)' as a column named INDEX)
_ALTER_NOOP = re.compile(
    r"^(?:ADD|DROP)\s+(?:UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?"
    r"(?:INDEX|KEY|CONSTRAINT|PRIMARY\s+KEY|FOREIGN\s+KEY|CHECK)\b",
    re.IGNORECASE,
)

_ADD_COL = re.compile(
    r"^ADD\s+(?:COLUMN\s+)?" + _ident(1) + r"\s+(?P<type>[A-Za-z]+(?:\s*\([^)]*\))?"
    r"(?:\s+unsigned)?)(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_COL = re.compile(
    r"^DROP\s+(?:COLUMN\s+)?" + _ident(1) + r"\s*$", re.IGNORECASE
)
_MODIFY_COL = re.compile(
    r"^MODIFY\s+(?:COLUMN\s+)?" + _ident(1) + r"\s+(?P<type>[A-Za-z]+(?:\s*\([^)]*\))?"
    r"(?:\s+unsigned)?)(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_RENAME_COL = re.compile(
    r"^RENAME\s+COLUMN\s+" + _ident(1) + r"\s+TO\s+" + _ident(2) + r"\s*$",
    re.IGNORECASE,
)
_CHANGE_COL = re.compile(
    r"^CHANGE\s+(?:COLUMN\s+)?" + _ident(1) + r"\s+" + _ident(2)
    + r"\s+(?P<type>[A-Za-z]+(?:\s*\([^)]*\))?(?:\s+unsigned)?)(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_RENAME_TABLE = re.compile(
    r"^RENAME\s+(?:TO|AS)\s+(?P<new>\S+)\s*$", re.IGNORECASE
)


_DEFAULT_VALUE = re.compile(
    r"^\s*(?:'(?P<s>(?:[^']|'')*)'"                # 'string' ('' escape)
    r'|"(?P<d>[^"]*)"'                             # "string"
    r"|(?P<h>0[xX][0-9A-Fa-f]+)"                   # hex literal (opaque)
    r"|(?P<e>[A-Za-z_][A-Za-z0-9_]*(?:\s*\(\s*\d*\s*\))?"  # bare word/fn
    r"|[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?))",        # number
    re.IGNORECASE,
)

# non-constant defaults: MySQL evaluates these per-row at write time, so
# a metadata-only backfill has no single value to fill — Debezium's
# default-value converters likewise surface them as NULL for backfill
_NON_CONSTANT_DEFAULTS = re.compile(
    r"^(?:CURRENT_TIMESTAMP|CURRENT_DATE|CURRENT_TIME|NOW|LOCALTIME(?:STAMP)?|"
    r"UUID|UUID_SHORT|RAND)\s*(?:\(\s*\d*\s*\))?$",
    re.IGNORECASE,
)


def _find_keyword_outside_quotes(s: str, kw: str) -> int:
    """Index just past ``kw`` at top level (outside '...'/"..."
    literals), or -1.  The quote-aware scan keeps keywords inside a
    COMMENT '...' (or any quoted literal) from being parsed as column
    attributes.  Multi-word keywords ('CHARACTER SET') match across ANY
    run of whitespace between the words, as MySQL's parser does."""
    words = kw.split(" ")
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in ("'", '"'):
            q = c
            i += 1
            while i < n:
                if s[i] == "\\" and i + 1 < n:
                    # MySQL backslash escape (\' \" \\ ...): the next
                    # char is part of the literal, never a terminator —
                    # 'it\'s DEFAULT 5' must not end at the \'
                    i += 2
                    continue
                if s[i] == q:
                    if q == "'" and i + 1 < n and s[i + 1] == "'":
                        i += 2  # '' escape inside 'string'
                        continue
                    break
                i += 1
            i += 1  # past the closing quote
            continue
        if i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"):
            j = i
            matched = True
            for w_idx, w in enumerate(words):
                if w_idx > 0:
                    k = j
                    while k < n and s[k].isspace():
                        k += 1
                    if k == j:  # words must be whitespace-separated
                        matched = False
                        break
                    j = k
                if s[j : j + len(w)].upper() != w:
                    matched = False
                    break
                j += len(w)
            if matched and (j >= n or not (s[j].isalnum() or s[j] == "_")):
                return j
        i += 1
    return -1


def _parse_default(rest: str) -> Optional[str]:
    """Extract the DEFAULT expression from a column-def tail, or None."""
    s = rest or ""
    j = _find_keyword_outside_quotes(s, "DEFAULT")
    if j < 0:
        return None
    m = _DEFAULT_VALUE.match(s[j:])
    if not m:
        return None
    if m.group("s") is not None:
        return m.group("s").replace("''", "'")
    if m.group("d") is not None:
        return m.group("d")
    if m.group("h") is not None:
        return m.group("h")  # opaque: backfill treats as non-constant
    return m.group("e")


_CHARSET_NAME = re.compile(r"^\s*=?\s*([A-Za-z0-9_\-]+)")


def _parse_charset(rest: str) -> Optional[str]:
    """Column-level CHARACTER SET / CHARSET name from a column-def
    tail, or None (table/connection default)."""
    s = rest or ""
    j = _find_keyword_outside_quotes(s, "CHARACTER SET")
    if j < 0:
        j = _find_keyword_outside_quotes(s, "CHARSET")
    if j < 0:
        return None
    m = _CHARSET_NAME.match(s[j:])
    return m.group(1).lower() if m else None


def default_fill_expr(f: T.StructField):
    """Backfill Column for a field added by schema evolution: its typed
    DEFAULT literal when the field metadata carries a constant default,
    else typed NULL (no default, DEFAULT NULL, or a non-constant default
    like CURRENT_TIMESTAMP, which has no single backfill value)."""
    from pyspark.sql import functions as F

    md = f.metadata or {}
    dv = md.get("default")
    if (
        dv is None
        or str(dv).strip().upper() == "NULL"
        or _NON_CONSTANT_DEFAULTS.match(str(dv).strip())
        # hex literals are type-dependent in MySQL (int for numeric
        # columns, bytes for strings) — no single portable backfill
        or re.match(r"^0[xX][0-9A-Fa-f]+$", str(dv).strip())
    ):
        return F.lit(None).cast(f.dataType)
    return F.lit(str(dv)).cast(f.dataType)


def _strip_ticks(ident: str) -> str:
    return ".".join(p.strip("`\"") for p in ident.split("."))


def _split_top_level(body: str) -> list[str]:
    """Split a CREATE TABLE body on commas not inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_ddl(ddl: str) -> TableChange:
    """Parse a DDL statement into a structured TableChange.

    Covers the statements the reference's history actually sees from
    MySQL (MySqlAntlrDdlParser by way of Debezium): CREATE TABLE with
    column defs + PRIMARY KEY clause, ALTER TABLE ADD/DROP/MODIFY/
    CHANGE/RENAME COLUMN and RENAME TO, DROP TABLE.  Raises ValueError
    on statements outside that surface (callers keep the opaque-payload
    path as the fallback)."""
    m = _CREATE.match(ddl)
    if m:
        cols: list[ColumnSpec] = []
        pk: list[str] = []
        for i, part in enumerate(_split_top_level(m.group("body"))):
            up = part.upper()
            pkm = re.match(r"^PRIMARY\s+KEY\s*\((?P<cols>[^)]*)\)", part, re.IGNORECASE)
            if pkm:
                pk = [c.strip().strip("`\"") for c in pkm.group("cols").split(",")]
                continue
            if up.startswith(("UNIQUE", "KEY", "INDEX", "CONSTRAINT", "FOREIGN")):
                continue
            cm = _COL_DEF.match(part)
            if not cm:
                raise ValueError(f"unparseable column def: {part!r}")
            rest = cm.group("rest") or ""
            inline_pk = re.search(r"PRIMARY\s+KEY", rest, re.IGNORECASE)
            notnull = re.search(r"NOT\s+NULL", rest, re.IGNORECASE)
            name = _get_ident(cm, 1)
            cols.append(
                ColumnSpec(
                    name=name,
                    type_expression=cm.group("type").strip(),
                    optional=not (notnull or inline_pk),
                    position=len(cols) + 1,
                    default_value=_parse_default(rest),
                    charset=_parse_charset(rest),
                )
            )
            if inline_pk:
                pk.append(name)
        # inline PRIMARY KEY + a PRIMARY KEY(...) clause may both name a
        # column — keep first occurrence order, deduped
        pk = list(dict.fromkeys(pk))
        return TableChange(
            CREATE, _strip_ticks(m.group("id")), columns=cols, primary_key=pk
        )

    nm = _SCHEMA_NOOP.match(ddl)
    if nm:
        tid = next(g for g in nm.groups() if g)
        return TableChange(NOOP, _strip_ticks(tid))

    m = _ALTER.match(ddl)
    if m:
        tid = _strip_ticks(m.group("id"))
        rest = m.group("rest").strip()
        if _ALTER_NOOP.match(rest):
            return TableChange(NOOP, tid)
        am = _ADD_COL.match(rest)
        if am:
            notnull = re.search(r"NOT\s+NULL", am.group("rest") or "", re.IGNORECASE)
            return TableChange(
                ALTER,
                tid,
                columns=[
                    ColumnSpec(
                        name=_get_ident(am, 1),
                        type_expression=am.group("type").strip(),
                        optional=not notnull,
                        default_value=_parse_default(am.group("rest")),
                        charset=_parse_charset(am.group("rest")),
                    )
                ],
            )
        dm = _DROP_COL.match(rest)
        if dm:
            return TableChange(ALTER, tid, dropped_columns=[_get_ident(dm, 1)])
        mm = _MODIFY_COL.match(rest)
        if mm:
            notnull = re.search(r"NOT\s+NULL", mm.group("rest") or "", re.IGNORECASE)
            return TableChange(
                ALTER,
                tid,
                columns=[
                    ColumnSpec(
                        name=_get_ident(mm, 1),
                        type_expression=mm.group("type").strip(),
                        optional=not notnull,
                        default_value=_parse_default(mm.group("rest")),
                        charset=_parse_charset(mm.group("rest")),
                    )
                ],
            )
        rm = _RENAME_COL.match(rest)
        if rm:
            return TableChange(
                ALTER, tid, renamed_columns={_get_ident(rm, 1): _get_ident(rm, 2)}
            )
        chm = _CHANGE_COL.match(rest)
        if chm:
            old, new = _get_ident(chm, 1), _get_ident(chm, 2)
            notnull = re.search(r"NOT\s+NULL", chm.group("rest") or "", re.IGNORECASE)
            return TableChange(
                ALTER,
                tid,
                renamed_columns={old: new},
                columns=[
                    ColumnSpec(
                        name=new,
                        type_expression=chm.group("type").strip(),
                        optional=not notnull,
                        default_value=_parse_default(chm.group("rest")),
                        charset=_parse_charset(chm.group("rest")),
                    )
                ],
            )
        rt = _RENAME_TABLE.match(rest)
        if rt:
            return TableChange(ALTER, tid, new_table_id=_strip_ticks(rt.group("new")))
        raise ValueError(f"unsupported ALTER clause: {rest!r}")

    m = _DROP.match(ddl)
    if m:
        return TableChange(DROP, _strip_ticks(m.group("id")))
    raise ValueError(f"unsupported DDL statement: {ddl!r}")


def apply_change(schema: Optional[T.StructType], change: TableChange) -> Optional[T.StructType]:
    """Evolve a decode schema by one structured change.  CREATE replaces
    the schema; ALTER applies adds/modifies/renames/drops in the
    reference's order (rename first, then type changes, then drops);
    DROP TABLE returns None (table gone)."""
    if change.type == CREATE:
        return change.to_struct()
    if change.type == NOOP:
        return schema
    if change.type == DROP:
        return None
    if schema is None:
        raise ValueError(f"ALTER against unknown table {change.table_id!r}")
    fields = list(schema.fields)
    if change.renamed_columns:
        fields = [
            T.StructField(change.renamed_columns.get(f.name, f.name), f.dataType, f.nullable)
            for f in fields
        ]
    for c in change.columns:
        existing = [i for i, f in enumerate(fields) if f.name == c.name]
        nf = T.StructField(c.name, c.spark_type(), c.optional, c.metadata())
        if existing:
            fields[existing[0]] = nf  # MODIFY / CHANGE retype
        else:
            fields.append(nf)  # ADD appends
    if change.dropped_columns:
        fields = [f for f in fields if f.name not in change.dropped_columns]
    return T.StructType(fields)


def charset_converters(schema: T.StructType) -> dict:
    """``from_debezium_json`` converters map for every column whose
    field metadata names a non-UTF8 charset: the envelope carries the
    raw column bytes base64-encoded and the decode lifts them through
    the table's declared charset (MysqlConnectorCharsetITCase end to
    end: DDL -> ColumnSpec.charset -> StructField metadata -> this map
    -> charset-correct strings).  UTF-8-family charsets need no
    converter (the JSON envelope already carries them as text)."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_converter

    out = {}
    for f in schema.fields:
        cs = (f.metadata or {}).get("charset")
        if cs and cs.lower() not in ("utf8", "utf-8", "utf8mb3", "utf8mb4"):
            out[f.name] = charset_converter(cs)
    return out
