"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001
queries()     — every implemented operator from SURVEY.md §2
oracle_sql()  — DuckDB-equivalent SQL for the correctness gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_cdc_2_3_0_src_spark import queries as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the engine's heart: the full hybrid snapshot+stream
    pipeline (watermark-bracketed chunked snapshot, backfill merge,
    chunk-HW stream filter, upsert materialization — the DBLog offset
    signal algorithm end to end)."""
    return _catalog.cdc_hybrid_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
