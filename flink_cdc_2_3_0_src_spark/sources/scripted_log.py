"""Scripted DML log: the test-dialect "binlog".

The driver's deterministic ``events`` table plays the role of a database
changelog (SURVEY.md §5 testing plan: "a scripted DML log as the
binlog"). Event types map onto upsert-changelog operations keyed by
``user_id`` — the Mongo/TiDB upsert shape (§1.1: +I/+U/-D, after-images
only, no -U):

    signup                → +I  (key appears)
    click|view|purchase   → +U  (new after-image for the key)
    error                 → -D  (key removed)

``event_id`` is the total-order log sequence (the SequenceOffset of the
test dialect). Consumers recover -U images via
``operators.changelog.normalize_upsert`` exactly like Flink's
ChangelogNormalize does for upsert sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import (
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    SEQ_COL,
)

# Shared op-mapping expression — kept in one place so Spark queries and the
# DuckDB oracle SQL (see __spark_entry__.oracle_sql) stay in lockstep.
OP_CASE_SQL = (
    "CASE WHEN event_type = 'signup' THEN '+I' "
    "WHEN event_type = 'error' THEN '-D' "
    "ELSE '+U' END"
)


#: Declared changelog mode of this source (§1.1): upsert — +I/+U/-D
#: after-images only, no -U; consumers recover retractions via
#: operators.changelog.ensure_retractions.
from flink_cdc_2_3_0_src_spark.model import ChangelogMode  # noqa: E402

CHANGELOG_MODE = ChangelogMode.UPSERT


def split_heartbeats(log: DataFrame, heartbeat_op: str = "+H"):
    """A23: heartbeat handling — heartbeat records advance the source
    offset without emitting data (reference MySqlRecordEmitter.java:132-134,
    isHeartbeatEvent RecordUtils.java:226-230).

    Returns (data_log, latest_offset): the data stream with heartbeats
    removed, and the offset the source should report — which includes
    heartbeat positions, so an idle stream still advances.
    """
    from pyspark.sql import functions as F

    data = log.filter(F.col(OP_COL) != heartbeat_op)
    tip = log.agg(F.max(SEQ_COL).alias("mx")).collect()[0]["mx"]
    return data, (tip if tip is not None else 0)


def scripted_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet → upsert changelog (user_id, value, ts, _op, _seq)."""
    from flink_cdc_2_3_0_src_spark.io import load_table

    events = load_table(spark, sf_dir, "events")
    return events.select(
        F.col("user_id"),
        F.col("value"),
        F.col("ts"),
        F.when(F.col("event_type") == "signup", F.lit(OP_INSERT))
        .when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE_AFTER))
        .alias(OP_COL),
        F.col("event_id").alias(SEQ_COL),
    )
