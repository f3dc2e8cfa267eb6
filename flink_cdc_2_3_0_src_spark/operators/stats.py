"""Catalog statistics operators (A2 extended to the CBO surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def analyze_column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Catalog-grade column statistics in ONE aggregation pass: per
    column — non-null count, null count, exact NDV, min/max (as strings
    for a uniform schema).  The chunk planner's analyze (A2) computes
    min/max/rowcount for the split key; this is the full-table ANALYZE a
    cost-based optimizer consumes.

    Scale shape: a single partial-aggregated pass; exact NDV shuffles
    one (col, value)-distinct stream per column — swap in
    approx_count_distinct at 100 TB (same output contract, documented
    estimator), everything else stays map-side."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stacked = []
    for c in cols:
        stacked.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nn").alias("n_non_null"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.col(f"{c}__min").alias("min_repr"),
                F.col(f"{c}__max").alias("max_repr"),
            )
        )
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")


def analyze_column_stats_sql(table: str, cols: list[str]) -> str:
    sel = " UNION ALL ".join(
        f"""SELECT '{c}' AS column,
               CAST(COUNT({c}) AS BIGINT) AS n_non_null,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
               CAST(MIN({c}) AS VARCHAR) AS min_repr,
               CAST(MAX({c}) AS VARCHAR) AS max_repr
        FROM {table}"""
        for c in cols
    )
    return sel
