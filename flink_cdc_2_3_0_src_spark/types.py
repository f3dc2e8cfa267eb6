"""Dialect type → Spark DataType mapping (SURVEY.md §1.4).

Mirrors the reference's MySQL mapping
(MySqlTypeUtils.java:105-180; docs/content/connectors/mysql-cdc.md:701-950)
re-expressed against Spark's type system. Notable decisions, same as the
survey's Spark column:

  - BIGINT UNSIGNED / SERIAL → DecimalType(20, 0)
  - DECIMAL(p>38)            → StringType (Spark's max precision is 38)
  - TIME(p)                  → IntegerType millis-of-day (Spark has no
                               TimeType; documented convention)
  - DATETIME/TIMESTAMP       → TimestampNTZType (server-TZ interpreted)
  - SET                      → ArrayType(StringType)
  - JSON / ENUM / GEOMETRY   → StringType (GeoJSON for geometry)
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import types as T

_SIMPLE = {
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "BIT": T.BooleanType(),
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "MEDIUMINT": T.IntegerType(),
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "REAL": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "DATE": T.DateType(),
    "YEAR": T.IntegerType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "TINYTEXT": T.StringType(),
    "TEXT": T.StringType(),
    "MEDIUMTEXT": T.StringType(),
    "LONGTEXT": T.StringType(),
    "JSON": T.StringType(),
    "ENUM": T.StringType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    "TINYBLOB": T.BinaryType(),
    "BLOB": T.BinaryType(),
    "MEDIUMBLOB": T.BinaryType(),
    "LONGBLOB": T.BinaryType(),
    "SET": T.ArrayType(T.StringType()),
    "GEOMETRY": T.StringType(),
    "POINT": T.StringType(),
    "LINESTRING": T.StringType(),
    "POLYGON": T.StringType(),
    "MULTIPOINT": T.StringType(),
    "MULTILINESTRING": T.StringType(),
    "MULTIPOLYGON": T.StringType(),
    "GEOMETRYCOLLECTION": T.StringType(),
}

_TYPE_RE = re.compile(
    r"^\s*([A-Za-z ]+?)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?"
    r"(\s+UNSIGNED)?(\s+ZEROFILL)?\s*$",
    re.IGNORECASE,
)


def mysql_type_to_spark(decl: str) -> T.DataType:
    """Map a MySQL column declaration (e.g. 'DECIMAL(10,2) UNSIGNED',
    'TINYINT(1)', 'BIGINT UNSIGNED') to a Spark DataType."""
    m = _TYPE_RE.match(decl)
    if not m:
        return T.StringType()
    base = m.group(1).strip().upper()
    p = int(m.group(2)) if m.group(2) else None
    s = int(m.group(3)) if m.group(3) else 0
    unsigned = bool(m.group(4))

    if base in ("TINYINT",) and p == 1 and not unsigned:
        return T.BooleanType()  # TINYINT(1) → BOOLEAN (MySqlTypeUtils.java:109)
    if base == "BIT":
        return T.BooleanType() if (p or 1) == 1 else T.BinaryType()
    if unsigned:
        # unsigned widening (MySqlTypeUtils.java:110-128)
        widen = {
            "TINYINT": T.ShortType(),
            "SMALLINT": T.IntegerType(),
            "MEDIUMINT": T.IntegerType(),
            "INT": T.LongType(),
            "INTEGER": T.LongType(),
            "BIGINT": T.DecimalType(20, 0),
        }
        if base in widen:
            return widen[base]
    if base == "SERIAL":
        return T.DecimalType(20, 0)
    if base in ("DECIMAL", "NUMERIC", "FIXED", "DEC"):
        p = p or 10
        return T.DecimalType(p, s) if p <= 38 else T.StringType()
    if base == "TIME":
        return T.IntegerType()  # millis-of-day (no Spark TimeType)
    if base in ("DATETIME", "TIMESTAMP"):
        return T.TimestampNTZType()
    if base in _SIMPLE:
        return _SIMPLE[base]
    return T.StringType()


def mysql_schema_to_struct(columns: list[tuple[str, str]]) -> T.StructType:
    """[(name, mysql_type_decl)] → StructType (discovery output, A1)."""
    return T.StructType(
        [T.StructField(n, mysql_type_to_spark(t), True) for n, t in columns]
    )


# ---------------------------------------------------------------------------
# Flink SQL DDL types (the CREATE TABLE ... WITH () surface, §3.1)
# ---------------------------------------------------------------------------

def _split_angle_args(s: str) -> list[str]:
    """Split 'a, b<c, d>, e' on top-level commas (angle- and
    paren-aware)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def flink_type_to_spark(decl: str) -> T.DataType:
    """Flink SQL DDL type -> Spark type (the declared-schema side of the
    reference's CREATE TABLE path — LogicalTypeParser by way of the
    planner; TIME maps to IntegerType millis-of-day and TIMESTAMP to
    NTZ per SURVEY §1.4's documented Spark mapping)."""
    s = decl.strip()
    up = s.upper()
    if up.endswith(" NOT NULL"):
        s, up = s[: -len(" NOT NULL")].rstrip(), up[: -len(" NOT NULL")].rstrip()
    m = re.match(r"^ROW\s*<(?P<body>.*)>$", s, re.IGNORECASE | re.DOTALL)
    if m:
        fields = []
        for part in _split_angle_args(m.group("body")):
            fm = re.match(r"^[`\"]?(?P<n>[\w]+)[`\"]?\s+(?P<t>.+)$", part, re.DOTALL)
            if not fm:
                raise ValueError(f"unparseable ROW field: {part!r}")
            fields.append(
                T.StructField(fm.group("n"), flink_type_to_spark(fm.group("t")))
            )
        return T.StructType(fields)
    m = re.match(r"^ARRAY\s*<(?P<e>.*)>$", s, re.IGNORECASE | re.DOTALL)
    if m:
        return T.ArrayType(flink_type_to_spark(m.group("e")))
    m = re.match(r"^MAP\s*<(?P<body>.*)>$", s, re.IGNORECASE | re.DOTALL)
    if m:
        kv = _split_angle_args(m.group("body"))
        if len(kv) != 2:
            raise ValueError(f"MAP needs exactly <key, value>: {decl!r}")
        return T.MapType(flink_type_to_spark(kv[0]), flink_type_to_spark(kv[1]))
    # Flink also spells precision mid-form: TIMESTAMP(3) WITH LOCAL
    # TIME ZONE / TIME(0) WITHOUT TIME ZONE — normalize to suffix form
    mz = re.match(
        r"^(?P<b>TIMESTAMP|TIME)\s*(?:\((?P<p>\d+)\))?\s+"
        r"(?P<tz>WITH(?:OUT)?\s+LOCAL\s+TIME\s+ZONE|WITH(?:OUT)?\s+TIME\s+ZONE)$",
        up,
    )
    if mz:
        with_ltz = "WITHOUT" not in mz.group("tz") and "LOCAL" in mz.group("tz")
        if mz.group("b") == "TIMESTAMP":
            return T.TimestampType() if with_ltz else T.TimestampNTZType()
        return T.IntegerType()  # TIME: millis-of-day
    m = re.match(r"^(?P<base>[A-Z_ ]+?)\s*(?:\((?P<args>[\d,\s]*)\))?$", up)
    if not m:
        raise ValueError(f"unparseable Flink type: {decl!r}")
    base = " ".join(m.group("base").split())
    args = [int(a) for a in (m.group("args") or "").replace(" ", "").split(",") if a]
    if base in ("STRING", "CHAR", "VARCHAR"):
        return T.StringType()
    if base == "BOOLEAN":
        return T.BooleanType()
    if base in ("BYTES", "BINARY", "VARBINARY"):
        return T.BinaryType()
    if base in ("DECIMAL", "NUMERIC", "DEC"):
        p = args[0] if args else 10
        sc = args[1] if len(args) > 1 else 0
        return T.DecimalType(p, sc)
    if base == "TINYINT":
        return T.ByteType()
    if base == "SMALLINT":
        return T.ShortType()
    if base in ("INT", "INTEGER"):
        return T.IntegerType()
    if base == "BIGINT":
        return T.LongType()
    if base == "FLOAT":
        return T.FloatType()
    if base == "DOUBLE":
        return T.DoubleType()
    if base == "DATE":
        return T.DateType()
    if base == "TIME":
        return T.IntegerType()  # millis-of-day (SURVEY §1.4: no TimeType)
    if base == "TIMESTAMP":
        return T.TimestampNTZType()
    if base in ("TIMESTAMP_LTZ", "TIMESTAMP WITH LOCAL TIME ZONE"):
        return T.TimestampType()
    raise ValueError(f"unsupported Flink DDL type: {decl!r}")
