"""Count-Min sketch — sublinear frequency estimation for heavy-hitter
queries over streams/corpora too large for exact per-key counts.

The 100 TB shape: exact token counts need a corpus-wide shuffle keyed by
token (unbounded key cardinality); a CMS needs ONE aggregation into a
fixed d × w counter matrix (d hash rows, w buckets — kilobytes), which
partial-aggregates map-side and merges by cell addition (the sketch is
a commutative monoid, so executor-local sketches combine exactly).
Estimates only ever OVER-count (min over d rows bounds collisions).

Determinism: the hash family is the same fixed affine-mod-P family the
bloom filter uses, over the engine-portable polynomial string hash — so
the DuckDB oracle builds the identical matrix cell for cell, and the
estimate/overestimate columns match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.functions.hashing import (
    POLY_MOD,
    POLY_MULT,
    poly_hash_expr,
    sql_poly_hash,
    sql_tokens,
    tokens,
)

_P = 2_147_483_647
_ROWS = [(998_244_353, 12_289), (805_306_457, 37), (1_000_000_007, 65_537)]
CMS_WIDTH = 1_024


def _cms_bucket(hcol, a: int, b: int, width: int):
    x = (hcol % _P + _P) % _P
    return ((F.lit(a) * x + F.lit(b)) % _P) % width


def cms_build(hashed, width: int = CMS_WIDTH, weight_col: str | None = None) -> dict:
    """Build the d × w counter matrix from a DataFrame with an ``h``
    hash column.  One aggregation: explode each value into its d
    (row, bucket) cells, count per cell.  The matrix is a commutative
    monoid under cell-wise addition — sketches built on partitions of
    the data merge EXACTLY into the whole-data sketch (pinned by
    tests), which is why executor-local partial aggregation is lossless
    here.

    ``weight_col``: build from PRE-AGGREGATED (value, count) rows
    instead of one row per occurrence — cell n becomes SUM(weight),
    bit-identical to the occurrence-level build (cells are sums either
    way) while hashing each distinct value exactly once."""
    cells = hashed.select(
        *( [F.col(weight_col).alias("_w")] if weight_col else [] ),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ri).alias("r"),
                        _cms_bucket(F.col("h"), a, b, width).alias("c"),
                    )
                    for ri, (a, b) in enumerate(_ROWS)
                ]
            )
        ).alias("cell"),
    ).groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c")).agg(
        (F.sum("_w") if weight_col else F.count(F.lit(1))).alias("n")
    )
    return {(int(r["r"]), int(r["c"])): int(r["n"]) for r in cells.collect()}


def cms_merge(a: dict, b: dict) -> dict:
    """Cell-wise sum — the sketch monoid's merge."""
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    return out


def cms_heavy_hitters(docs: DataFrame, top_k: int = 20, width: int = CMS_WIDTH) -> DataFrame:
    """Estimate the corpus's top-k token frequencies through a Count-Min
    sketch and report estimate vs exact (the overestimate is the
    sketch's collision cost — never negative).

    Build: one explode + ONE fixed-size aggregation (d*w cells max) —
    collected to the driver (kilobytes, data-size independent) and
    folded into the probe as literal arrays, like the bloom bitmap and
    the kmeans centroids.  Probe: the exact top-k tokens (computed here
    for the comparison; a production probe set is whatever keys you
    care about).

    Cost shape: tokens are counted FIRST (cheap codegen'd groupBy), so
    the per-character polynomial hash runs once per DISTINCT token
    (vocabulary-sized) instead of once per occurrence, and the matrix
    is built from (hash, count) weighted rows — bit-identical cells,
    ~corpus/vocabulary times less hash work.  One localCheckpoint keeps
    the vocabulary pass shared between the matrix build and the exact
    top-k (it would otherwise recompute)."""
    from flink_cdc_2_3_0_src_spark.io import spread_small_scan

    toks = spread_small_scan(docs.select("text")).select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .select("tok", "exact_n", poly_hash_expr(F.col("tok")).alias("h"))
        .localCheckpoint()
    )
    mat = cms_build(vocab, width, weight_col="exact_n")
    # ONE array literal per sketch row (not w nested Literal nodes —
    # a 3×1024-literal expression tree costs more to compile than the
    # probe costs to run)
    row_arrays = [
        F.lit([int(mat.get((ri, c), 0)) for c in range(width)]).cast("array<bigint>")
        for ri in range(len(_ROWS))
    ]
    exact = vocab.orderBy(F.col("exact_n").desc(), F.col("tok")).limit(top_k)
    est = F.least(
        *[
            F.element_at(
                row_arrays[ri],
                _cms_bucket(F.col("h"), a, b, width).cast("int") + 1,
            )
            for ri, (a, b) in enumerate(_ROWS)
        ]
    )
    return exact.select(
        "tok",
        "exact_n",
        est.alias("cms_n"),
        (est - F.col("exact_n")).alias("overestimate"),
    )


def cms_heavy_hitters_sql(top_k: int = 20, width: int = CMS_WIDTH) -> str:
    """DuckDB twin: identical hash family, matrix, min-over-rows probe."""
    buckets = [
        f"((({a} * ((h % {_P} + {_P}) % {_P}) + {b}) % {_P}) % {width})"
        for a, b in _ROWS
    ]
    cell_rows = " UNION ALL ".join(
        f"SELECT {ri} AS r, {buckets[ri]} AS c, h FROM th"
        for ri in range(len(_ROWS))
    )
    ests = [
        f"(SELECT n FROM cells WHERE r = {ri} AND c = {buckets[ri]})"
        for ri in range(len(_ROWS))
    ]
    est = f"least({', '.join(ests)})"
    return f"""
    WITH tk AS (
        SELECT unnest({sql_tokens('text')}) AS tok FROM documents
    ),
    th AS (SELECT tok, {sql_poly_hash('tok')} AS h FROM tk),
    cells AS (
        SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n
        FROM ({cell_rows}) GROUP BY r, c
    ),
    exact AS (
        SELECT tok, h, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM th GROUP BY tok, h
        ORDER BY exact_n DESC, tok LIMIT {top_k}
    )
    SELECT tok, exact_n,
           CAST({est} AS BIGINT) AS cms_n,
           CAST({est} - exact_n AS BIGINT) AS overestimate
    FROM exact
    """


__all__ = ["cms_heavy_hitters", "cms_heavy_hitters_sql", "CMS_WIDTH"]
_ = (POLY_MOD, POLY_MULT)  # re-exported hash constants used by tests
