"""SparkSession factory tuned for the CDC engine.

Defaults are chosen for correctness parity with the DuckDB oracle
(UTC session time zone) and for scale (AQE on, skew-join on, partition
coalescing on). On a real cluster the same builder is used with a
cluster master; tests use local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned defaults. At 100 TB these are overridden per-job, but every value
# here is chosen to survive a scale-up: AQE handles skew + partition count
# at runtime, 128 MB target file split keeps scan partitions memory-safe.
_DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # prefer shuffled-hash over sort-merge when a side's per-partition
    # build fits memory: no sort phase, 2-3x faster on our join shapes;
    # SHJ spills since Spark 3.2 and AQE still falls back per-stage
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    # testdata events.parquet uses TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert explicitly (queries.ld)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "flink-cdc-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default ``*``).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = dict(_DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
