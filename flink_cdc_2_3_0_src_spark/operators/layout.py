"""Z-order (Morton curve) data layout — multi-dimensional clustering so
file-level min/max statistics prune scans on EVERY listed column, not
just the first sort key.

At 100 TB a table sorted by one column prunes scans only on that
column; interleaving the bits of N columns into one sort key gives each
file a tight min/max envelope in all N dimensions (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` technique).  The operator computes the z-value
as a pure column expression (literal shift/mask terms — fully
codegen'd, zero shuffle) and the layout-quality report buckets the
z-sorted table (one range-partitioned sort, the same cost as any
write-time sort) and measures the per-bucket envelope of each
dimension.

Everything is exact integer arithmetic: the per-column quantization is
an exact floor-div over a collected (min, max) pair — 2 tiny aggregate
rows per column, data-size independent — so the DuckDB oracle
reproduces the curve bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def _quantize(col, mn: int, mx: int, bits: int):
    """Exact floor((x - mn) * (2^bits - 1) / (mx - mn)) for integer
    inputs: the scaled numerator is exact in int64 and the remainder is
    subtracted before dividing, so the (double) divide is integral."""
    span = max(int(mx) - int(mn), 1)
    a = (col.cast("long") - F.lit(int(mn))) * F.lit((1 << bits) - 1)
    return ((a - (a % span)) / span).cast("long")


def _check_zorder_params(n_cols: int, bits: int, n_buckets: int = 2) -> None:
    # the Morton code lives in a signed int64: bits*n_cols must stay
    # below 63 or the top term weights overflow LongType (and DuckDB
    # would silently widen to HUGEINT, diverging)
    if bits * n_cols > 63:
        raise ValueError(
            f"bits*n_cols = {bits * n_cols} exceeds 63 (signed int64 Morton code); "
            "lower bits for higher arity"
        )
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")


def zorder_value(qcols: Sequence, bits: int = ZORDER_BITS):
    """Interleave pre-quantized columns (each in [0, 2^bits)) into one
    Morton code.  bits * n_cols literal terms, all JVM-side."""
    _check_zorder_params(len(qcols), bits)
    n = len(qcols)
    terms = []
    for b in range(bits):
        for i, q in enumerate(qcols):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1).cast("long"))
            terms.append(bit * F.lit(1 << (b * n + i)).cast("long"))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_layout_stats(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 16,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Bucket the table by z-curve range and report each bucket's
    (count, min, max) envelope per dimension — the file-statistics view
    a scan planner would prune against."""
    _check_zorder_params(len(cols), bits, n_buckets)
    stats = df.agg(
        *[f(c).alias(f"{f.__name__}_{c}") for c in cols for f in (F.min, F.max)]
    ).collect()[0]
    for c in cols:
        mn, mx = stats[f"min_{c}"], stats[f"max_{c}"]
        if mn is None or mx is None:
            # empty input or all-NULL dimension: no envelope to build
            raise ValueError(
                f"zorder column {c!r} has no non-NULL values (empty input?) — "
                "cannot quantize"
            )
        # the scaled numerator (mx - mn) * (2^bits - 1) must stay in
        # int64: Spark would silently wrap while DuckDB raises
        if (int(mx) - int(mn)) * ((1 << bits) - 1) > (1 << 63) - 1:
            raise ValueError(
                f"zorder column {c!r} range {int(mx) - int(mn)} overflows int64 "
                f"when scaled by 2^{bits}-1; lower bits or pre-bucket the column"
            )
    qcols = [
        _quantize(F.col(c), stats[f"min_{c}"], stats[f"max_{c}"], bits)
        for c in cols
    ]
    zdf = df.select(*cols, zorder_value(qcols, bits).alias("_z"))
    # bucket = the z-value's TOP bits: curve-range partitioning, the way
    # z-ordered file boundaries are actually drawn.  A pure projection —
    # no global sort, no sampled range boundaries, deterministic on any
    # engine and any partitioning (the id_col tiebreak ntile would need
    # a single-task window; top-bit ranges need nothing).
    import math

    shift = bits * len(cols) - int(math.log2(n_buckets))
    bucketed = zdf.withColumn("bucket", F.shiftright(F.col("_z"), shift))
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return bucketed.groupBy("bucket").agg(*aggs)


def zorder_layout_sql(
    table: str,
    cols: Sequence[str],
    n_buckets: int = 16,
    bits: int = ZORDER_BITS,
) -> str:
    """DuckDB twin: identical quantization, interleave, top-bit buckets."""
    _check_zorder_params(len(cols), bits, n_buckets)
    mins = ", ".join(f"MIN({c}) AS mn_{c}, MAX({c}) AS mx_{c}" for c in cols)
    q_exprs = []
    for c in cols:
        span = f"greatest(s.mx_{c} - s.mn_{c}, 1)"
        a = f"(CAST(t.{c} AS BIGINT) - s.mn_{c}) * {(1 << bits) - 1}"
        q_exprs.append(f"CAST(({a}) // {span} AS BIGINT) AS q_{c}")
    n = len(cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(f"((q_{c} >> {b}) & 1) * {1 << (b * n + i)}")
    z = " + ".join(terms)
    col_aggs = ", ".join(
        f"MIN({c}) AS min_{c}, MAX({c}) AS max_{c}" for c in cols
    )
    import math

    shift = bits * len(cols) - int(math.log2(n_buckets))
    return f"""
    WITH s AS (SELECT {mins} FROM {table}),
    q AS (
        SELECT t.*, {', '.join(q_exprs)}
        FROM {table} t CROSS JOIN s
    ),
    z AS (
        SELECT *, {z} AS _z FROM q
    ),
    b AS (
        SELECT *, CAST(_z >> {shift} AS BIGINT) AS bucket FROM z
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, {col_aggs}
    FROM b GROUP BY bucket
    """
