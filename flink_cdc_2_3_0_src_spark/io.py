"""Table loading helpers shared by sources and the query catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing TIMESTAMP(NANOS) columns.

    Under ``spark.sql.legacy.parquet.nanosAsLong`` a nanos timestamp
    column surfaces as LongType; convert to a microsecond timestamp with
    the same truncation DuckDB applies when reading nanos parquet.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and isinstance(f_.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
