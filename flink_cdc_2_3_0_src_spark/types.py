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
