"""Embedding quantization for large-scale vector corpora.

Int8 scalar quantization (per-dimension min/max affine codes) — the
standard storage/bandwidth reduction before ANN indexing at corpus
scale (a 100 TB float32 embedding store shrinks 4x; recall loss is
negligible for retrieval-style workloads).

Scale shape — two passes, no per-row regroup:
  1. dimension stats: posexplode -> groupBy(dim).min/max. Partial
     (map-side) aggregation keeps the shuffle at n_dims rows per
     partition; the result is n_dims rows total (tiny).
  2. encode: collect the tiny stats to the driver, embed them as
     LITERAL arrays in a single narrow projection over the corpus —
     zero shuffle, whole-stage codegen, no second pass over exploded
     rows. (The naive join-back-and-regroup alternative would shuffle
     rows x dims twice.)

Cross-engine float parity: codes are floor(t * 255 + 0.5) on IEEE
doubles — identical in Spark and DuckDB (no rounding-mode divergence,
unlike half-even round()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (1-based) min/max over the corpus."""
    d = emb.select(
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "dim", "x"
        )
    ).withColumn("dim", F.col("dim") + 1)
    return d.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))


def _affine_code(x: Column, mn: Column, mx: Column) -> Column:
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(F.floor((x - mn) / (mx - mn) * F.lit(255.0) + F.lit(0.5)))
        .cast("long")
    )


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to int8 codes; emit (vec_id, n_dims, code_sum,
    codes) with codes serialized to a comma string (driver-canonicalizable,
    and the exact layout a columnar int8 store would hold)."""
    stats = sorted(dim_stats(emb, vec_col).collect())  # n_dims rows — tiny
    mns = F.array(*[F.lit(r["mn"]) for r in stats])
    mxs = F.array(*[F.lit(r["mx"]) for r in stats])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # element-wise encode via index transform (element_at is 1-based)
    codes = F.transform(
        v,
        lambda x, i: _affine_code(
            x, F.element_at(mns, i + 1), F.element_at(mxs, i + 1)
        ),
    )
    return emb.select(
        id_col,
        F.size(F.col(vec_col)).alias("n_dims"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda acc, c: acc + c).alias(
            "code_sum"
        ),
        F.concat_ws(",", F.transform(codes, lambda c: c.cast("string"))).alias(
            "codes"
        ),
    )


QUANTIZE_INT8_SQL = """
    WITH e AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings
    ),
    d AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v)+1)) AS dim FROM e),
    s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY dim),
    c AS (
        SELECT vec_id, d.dim,
               CASE WHEN mx = mn THEN 0
                    ELSE CAST(floor((x - mn) / (mx - mn) * 255.0 + 0.5) AS BIGINT)
               END AS code
        FROM d JOIN s USING (dim)
    )
    SELECT vec_id, COUNT(*) AS n_dims, CAST(SUM(code) AS BIGINT) AS code_sum,
           array_to_string(list(code ORDER BY dim), ',') AS codes
    FROM c GROUP BY vec_id
"""
