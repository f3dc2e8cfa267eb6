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


# ---- TiKV-style two-phase (Percolator) scripted log (A29 test dialect) ----
#
# Each event becomes raw TiKV CDC rows: normally a PREWRITE carrying the
# after-image plus a COMMIT binding (key, start_ts) -> commit_ts; every
# 37th event is rolled back (PREWRITE + ROLLBACK, never emitted); every
# 11th arrives pre-resolved as a single COMMITTED row — the three row
# shapes handleRow treats (TiKVRichParallelSourceFunction.java:173-193).
# start_ts/commit_ts are derived deterministically from the log sequence
# so the DuckDB oracle can fabricate the identical raw stream.

TWO_PHASE_SQL = """
    SELECT user_id, value, ts,
           CASE WHEN event_type = 'signup' THEN '+I'
                WHEN event_type = 'error' THEN '-D'
                ELSE '+U' END AS _op,
           CASE WHEN event_id % 11 = 0 AND event_id % 37 <> 0
                THEN 'COMMITTED' ELSE 'PREWRITE' END AS row_type,
           event_id * 10 AS start_ts,
           CASE WHEN event_id % 11 = 0 AND event_id % 37 <> 0
                THEN event_id * 10 + 5 END AS commit_ts
    FROM events
    UNION ALL
    SELECT user_id, NULL, NULL, NULL,
           CASE WHEN event_id % 37 = 0 THEN 'ROLLBACK' ELSE 'COMMIT' END,
           event_id * 10,
           CASE WHEN event_id % 37 <> 0 THEN event_id * 10 + 5 END
    FROM events
    WHERE NOT (event_id % 11 = 0 AND event_id % 37 <> 0)
"""


def scripted_two_phase_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet → raw TiKV-shaped 2PC rows (see TWO_PHASE_SQL)."""
    from flink_cdc_2_3_0_src_spark.io import load_table

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_type", "event_id"
    )
    op = (
        F.when(F.col("event_type") == "signup", F.lit(OP_INSERT))
        .when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE_AFTER))
    )
    single = (F.col("event_id") % 11 == 0) & (F.col("event_id") % 37 != 0)
    images = e.select(
        "user_id",
        "value",
        "ts",
        op.alias(OP_COL),
        F.when(single, F.lit("COMMITTED")).otherwise(F.lit("PREWRITE")).alias("row_type"),
        (F.col("event_id") * 10).alias("start_ts"),
        F.when(single, F.col("event_id") * 10 + 5).alias("commit_ts"),
    )
    ts_type = dict(e.dtypes)["ts"]  # TIMESTAMP or TIMESTAMP_NTZ per parquet metadata
    marks = e.filter(~single).select(
        "user_id",
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast(ts_type).alias("ts"),
        F.lit(None).cast("string").alias(OP_COL),
        F.when(F.col("event_id") % 37 == 0, F.lit("ROLLBACK"))
        .otherwise(F.lit("COMMIT"))
        .alias("row_type"),
        (F.col("event_id") * 10).alias("start_ts"),
        F.when(F.col("event_id") % 37 != 0, F.col("event_id") * 10 + 5).alias(
            "commit_ts"
        ),
    )
    return images.unionByName(marks)


# ---- Scripted dimension-table changelog (second join input) ----
#
# A deterministic upsert log over `customer`, keyed by user_id =
# c_custkey - 1 (the same key domain scripted_changelog uses), so a
# two-changelog join has a second scripted "binlog" whose DuckDB twin
# is trivial to fabricate: every customer inserts, every 5th later
# updates its segment, every 7th is finally deleted.  Sequence numbers
# interleave as c_custkey*3 (+0 insert, +1 update, +2 delete).

DIM_LOG_SQL = """
    SELECT c_custkey - 1 AS user_id, c_name, c_mktsegment,
           '+I' AS _op, c_custkey * 3 AS _seq
    FROM customer
    UNION ALL
    SELECT c_custkey - 1, c_name, 'UPDATED', '+U', c_custkey * 3 + 1
    FROM customer WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey - 1, c_name, c_mktsegment, '-D', c_custkey * 3 + 2
    FROM customer WHERE c_custkey % 7 = 0
"""


def scripted_dim_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer.parquet → upsert changelog
    (user_id, c_name, c_mktsegment, _op, _seq) — see DIM_LOG_SQL."""
    from flink_cdc_2_3_0_src_spark.io import load_table

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    key = (F.col("c_custkey") - 1).alias("user_id")
    base = c.select(
        key, F.col("c_name"), F.col("c_mktsegment"),
        F.lit(OP_INSERT).alias(OP_COL),
        (F.col("c_custkey") * 3).cast("long").alias(SEQ_COL),
    )
    upd = c.filter(F.col("c_custkey") % 5 == 0).select(
        key, F.col("c_name"), F.lit("UPDATED").alias("c_mktsegment"),
        F.lit(OP_UPDATE_AFTER).alias(OP_COL),
        (F.col("c_custkey") * 3 + 1).cast("long").alias(SEQ_COL),
    )
    dele = c.filter(F.col("c_custkey") % 7 == 0).select(
        key, F.col("c_name"), F.col("c_mktsegment"),
        F.lit(OP_DELETE).alias(OP_COL),
        (F.col("c_custkey") * 3 + 2).cast("long").alias(SEQ_COL),
    )
    return base.unionByName(upd).unionByName(dele)
