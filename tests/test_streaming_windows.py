"""Streaming event-time windows + custom stateful operator tests: the
streaming results must converge to the batch truth."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.io import load_table
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from flink_cdc_2_3_0_src_spark.streaming.replay import (
    read_replay_stream,
    write_replay_files,
)
from flink_cdc_2_3_0_src_spark.streaming.windows import (
    first_seen_dedup,
    windowed_counts,
)
from tests.conftest import SF_SMOKE


def test_windowed_counts_streaming_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    replay_dir = str(tmp_path / "replay")
    schema = None
    # replay the raw events table (ts, event_type, value, ...)
    from flink_cdc_2_3_0_src_spark.model import SEQ_COL

    log = events.withColumn(SEQ_COL, F.col("event_id"))
    write_replay_files(log, replay_dir, n_files=4)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = windowed_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expect = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events.groupBy(
            F.window("ts", "1 hour").start.alias("win_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == expect


def test_stream_distinct_first_occurrence_only(spark, tmp_path):
    """Streaming exact dedup: exactly one row per key survives — the
    first by sequence — across microbatches."""
    from flink_cdc_2_3_0_src_spark.streaming.windows import stream_distinct

    log = scripted_changelog(spark, SF_SMOKE)
    replay_dir = str(tmp_path / "replay_sd")
    write_replay_files(log, replay_dir, n_files=4)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = stream_distinct(stream, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("sdistinct")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sdistinct").collect()
    got = {r["user_id"]: r["_seq"] for r in rows}
    assert len(rows) == len(got)  # one row per key, no dupes
    expect = {
        r["user_id"]: r["first_seq"]
        for r in log.groupBy("user_id")
        .agg(F.min("_seq").alias("first_seq"))
        .collect()
    }
    assert got == expect


def test_first_seen_dedup_stateful(spark, tmp_path):
    log = scripted_changelog(spark, SF_SMOKE)
    replay_dir = str(tmp_path / "replay2")
    write_replay_files(log, replay_dir, n_files=4)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = first_seen_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode: last emitted row per key is the final state
    rows = spark.sql("SELECT * FROM first_seen").collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["first_seq"], r["n_events"])
    expect = {
        r["user_id"]: (r["first_seq"], r["n_events"])
        for r in log.groupBy("user_id")
        .agg(F.min("_seq").alias("first_seq"), F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    # every key's cumulative count must end at the batch truth
    assert set(final) == set(expect)
    for k in expect:
        assert final[k][0] == expect[k][0], f"first_seq mismatch for {k}"
    # n_events: the last update row per key reflects all batches; memory
    # sink appends updates, so take max observed count per key
    maxn = {}
    for r in rows:
        maxn[r["user_id"]] = max(maxn.get(r["user_id"], 0), r["n_events"])
    for k in expect:
        assert maxn[k] == expect[k][1], f"count mismatch for {k}"
