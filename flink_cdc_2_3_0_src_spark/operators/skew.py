"""Skew-mitigation operators for 100 TB-scale shuffles.

Two standard techniques, exposed as reusable primitives:

  salted_agg  — two-stage aggregation for skewed group keys: stage 1
                aggregates on (key, salt) spreading a hot key over N
                reducers, stage 2 combines the partials. Exact for
                decomposable aggregates (SUM/COUNT/MIN/MAX).
  salted_join — replicate the small side N ways and salt the big side,
                so one hot join key fans out over N tasks instead of
                one straggler.

AQE's skew-join handles sort-merge cases automatically (enabled in
session.py); these are for aggregation skew and for explicit control.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    combiners: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` are stage-1 aggregate expressions; ``combiners`` maps each
    output name to the stage-2 combining function name ('sum', 'min',
    'max'). COUNT combines with 'sum'. Results are identical to a direct
    groupBy because the aggregates are decomposable.
    """
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    stage2 = stage1.groupBy(*group_cols).agg(
        *[getattr(F, combiners[name])(F.col(name)).alias(name) for name in aggs]
    )
    return stage2


# join modes whose results are unchanged by replicating the SMALL side:
# inner/cross emit only matches; left-outer keeps unmatched BIG rows (not
# replicated); semi/anti never emit small-side rows. Right/full outer
# would emit each unmatched small-side row once PER SALT REPLICA — wrong.
_SALTED_JOIN_MODES = frozenset(
    {"inner", "cross", "left", "left_outer", "leftouter",
     "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: big side gets a random-ish (partition-derived,
    deterministic) salt; small side is exploded n_salts ways so every
    (key, salt) pair finds its partner. Exact same rows as a plain join
    for every allowed ``how``; right/full outer are rejected because the
    replicated small side would duplicate its unmatched rows n_salts
    times (swap the sides and use a left join instead)."""
    if how.lower().replace("_", "") not in {m.replace("_", "") for m in _SALTED_JOIN_MODES}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side "
            f"rows would be emitted once per salt replica. Supported: "
            f"inner/cross/left/left_semi/left_anti (swap sides for right outer)."
        )
    big_s = big.withColumn("__salt", F.spark_partition_id() % n_salts)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")


def skew_diagnose(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution diagnosis: the pre-flight check that decides
    whether a join/agg needs salting — the runtime analogue of the chunk
    planner's distribution-factor guard (plans/chunking.py, reference
    MySqlChunkSplitter.calculateDistributionFactor:453-478).

    Emits one row: key cardinality, row count, the heaviest key's share,
    and skew_ratio = max_count * n_keys / n_rows (1.0 = perfectly
    uniform; >> 1 = salt it). Two hash aggregations, the second over
    n_keys rows only.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_count"),
        (
            F.max("cnt").cast("double")
            * F.count(F.lit(1)).cast("double")
            / F.sum("cnt").cast("double")
        ).alias("skew_ratio"),
    )
