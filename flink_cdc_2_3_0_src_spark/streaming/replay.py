"""Changelog replay as a Structured Streaming file source.

Writes a changelog DataFrame into N sequence-ordered parquet files so
``readStream`` + ``maxFilesPerTrigger=1`` replays it as N microbatches —
the test stand-in for a Kafka/Debezium topic or binlog tailer. Batch
boundaries follow _seq order, preserving per-key event order (the same
guarantee a partitioned log gives per key).
"""

from __future__ import annotations

import os
from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.model import SEQ_COL


def write_replay_files(log: DataFrame, out_dir: str, n_files: int = 5) -> T.StructType:
    """Split the log into n sequence-range files; returns the schema
    (readStream needs it declared — §1.3 'declared schema')."""
    os.makedirs(out_dir, exist_ok=True)
    rows = log.orderBy(SEQ_COL).collect()
    schema = log.schema
    spark = log.sparkSession
    per = max(1, (len(rows) + n_files - 1) // n_files)
    for i in range(0, len(rows), per):
        chunk = rows[i : i + per]
        df = spark.createDataFrame(chunk, schema)
        # one parquet file per batch, names sorted in seq order
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_{i // per:05d}")
        )
    return schema


def read_replay_stream(
    spark: SparkSession, out_dir: str, schema: T.StructType
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(out_dir)
    )
