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


def test_windowed_counts_append_mode_evicts_late_rows(spark, tmp_path):
    """State-boundedness contract: in append mode a window finalizes
    (emits) once the watermark passes its end, and rows arriving later
    than the watermark are DROPPED — not silently re-aggregated into
    ever-growing state. Regression test for grouping on window.start,
    which detached the watermark and kept every window's state forever."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.model import SEQ_COL

    d = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return d + dt.timedelta(hours=h, minutes=m)

    rows = [
        # file 0: the [00:00,01:00) window gets its 2 on-time rows.
        (1, ts(0, 0), "a", 10.0),
        (2, ts(0, 30), "a", 10.0),
        # files 1-2: 10:xx rows push max event time so the watermark
        # reaches 08:01. Two batches are needed because Spark filters
        # late events with the PREVIOUS batch's starting watermark
        # (SPARK-40925 splits late-event vs eviction watermarks).
        (3, ts(10, 0), "a", 1.0),
        (4, ts(10, 1), "a", 1.0),
        (5, ts(10, 5), "a", 1.0),
        (6, ts(10, 6), "a", 1.0),
        # file 3: 00:15 is ~10h late, far past the 2h watermark -> must
        # be dropped; 10:30 keeps the stream moving.
        (7, ts(0, 15), "a", 100.0),
        (8, ts(10, 30), "a", 1.0),
    ]
    log = spark.createDataFrame(
        rows, f"{SEQ_COL} long, ts timestamp, event_type string, value double"
    )
    replay_dir = str(tmp_path / "replay_late")
    write_replay_files(log, replay_dir, n_files=4)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = windowed_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["win_start"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_late").collect()
    }
    # the finalized 00:00 window contains ONLY the 2 on-time rows; the
    # late value (100.0) appears nowhere in the emitted results.
    assert got[ts(0, 0)] == (2, 20.0)
    assert all(v[1] < 100.0 for v in got.values())


def test_session_windows_streaming(spark, tmp_path):
    """Event-time session windows via applyInPandasWithState: a session
    row is appended once the watermark passes sess_end + gap (via data
    batches or the event-time timeout) — never earlier."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.streaming.windows import session_windows

    d = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return d + dt.timedelta(hours=h, minutes=m)

    rows = [
        # user 1, session A: 00:00 + 00:10 (gap 10m <= 30m)
        (1, 1, ts(0, 0)),
        (2, 1, ts(0, 10)),
        # user 2, session C: single event
        (3, 2, ts(0, 5)),
        # user 1, session B: 01:00 (50m > 30m after session A)
        (4, 1, ts(1, 0)),
        # watermark pumps: 12:00 advances the watermark far past every
        # session's end+gap; 20:00 triggers one more batch in which the
        # timeouts actually fire (timeouts use the previous batch's wm)
        (5, 99, ts(12, 0)),
        (6, 99, ts(20, 0)),
    ]
    log = spark.createDataFrame(rows, f"{SEQ_COL} long, user_id long, ts timestamp")
    replay_dir = str(tmp_path / "replay_sess")
    write_replay_files(log, replay_dir, n_files=6)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = session_windows(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions WHERE user_id <> 99").collect()
    )
    assert got == [
        (1, ts(0, 0), ts(0, 10), 2),
        (1, ts(1, 0), ts(1, 0), 1),
        (2, ts(0, 5), ts(0, 5), 1),
    ]


def test_session_windows_crash_resume(spark, tmp_path):
    """Stateful-operator recovery: kill the session-window query after
    the first microbatch, restart from the same checkpoint — per-key
    session state must survive the restart (a session spanning the kill
    point is emitted once, with the pre-crash events included)."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.streaming.windows import session_windows

    d = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return d + dt.timedelta(hours=h, minutes=m)

    rows = [
        (1, 1, ts(0, 0)),    # file 0 (processed before the kill)
        (2, 1, ts(0, 10)),   # file 1 — same session, lands after restart
        (3, 1, ts(0, 20)),   # file 2
        (4, 99, ts(12, 0)),  # file 3: watermark pump
        (5, 99, ts(20, 0)),  # file 4: timeout-firing batch
    ]
    log = spark.createDataFrame(rows, f"{SEQ_COL} long, user_id long, ts timestamp")
    replay_dir = str(tmp_path / "replay_scr")
    write_replay_files(log, replay_dir, n_files=5)
    ckpt = str(tmp_path / "ckpt_scr")

    out_dir = str(tmp_path / "sessions_out")

    # phase 1: exactly one microbatch, then stop (parquet sink — memory
    # sink does not support checkpoint recovery)
    out1 = session_windows(read_replay_stream(spark, replay_dir, log.schema))
    q1 = (
        out1.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and not q1.recentProgress:
        time.sleep(0.5)
    q1.stop()
    q1.awaitTermination(30)

    # phase 2: restart from the checkpoint, drain the rest
    out2 = session_windows(read_replay_stream(spark, replay_dir, log.schema))
    q2 = (
        out2.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = [
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
        if r["user_id"] != 99
    ]
    # one session, all three events, emitted exactly once across restarts
    assert got == [(1, ts(0, 0), ts(0, 20), 3)]


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


def test_session_windows_out_of_order_merge(spark, tmp_path):
    """Out-of-order events under a nonzero watermark (the round-3 ADVICE
    defect): an event OLDER than the stored session start but within the
    gap must extend the session BACKWARDS (start_ms lowered so the
    emitted interval covers all counted events); an event late by more
    than the gap before every session must open its own session, not be
    glued onto the newer one."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.streaming.windows import session_windows

    d = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return d + dt.timedelta(hours=h, minutes=m)

    rows = [
        # batch 1: session seed at 03:00
        (1, 1, ts(3, 0)),
        # batch 2: 02:45 is OLDER than the stored start but within the
        # 30m gap -> backward extension to [02:45, 03:00]
        (2, 1, ts(2, 45)),
        # batch 3: 00:30 is > gap older than everything -> own session
        (3, 1, ts(0, 30)),
        # watermark pumps (user 99): under the 10h watermark delay, the
        # [02:45, 03:00] session is sealed only once wm >= 03:30, i.e.
        # after a batch whose max event time is >= 13:30 — so two pumps
        # past that line, plus one more batch for the timeout to fire
        (4, 99, ts(12, 0)),
        (5, 99, ts(20, 0)),
        (6, 99, ts(22, 0)),
    ]
    log = spark.createDataFrame(rows, f"{SEQ_COL} long, user_id long, ts timestamp")
    replay_dir = str(tmp_path / "replay_ooo")
    write_replay_files(log, replay_dir, n_files=6)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    # 10h watermark: every out-of-order event above is still admissible
    out = session_windows(stream, gap_minutes=30, watermark="10 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_ooo")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_ooo WHERE user_id <> 99").collect()
    )
    assert got == [
        (1, ts(0, 30), ts(0, 30), 1),
        (1, ts(2, 45), ts(3, 0), 2),
    ]


def test_session_windows_no_fragmentation_on_late_event(spark, tmp_path):
    """A late event within the gap of a session that an eager emitter
    would ALREADY have flushed (because a later session existed in the
    same batch) must still merge into it — watermark-gated emission
    means at most one session row per true session, never a fragment."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.streaming.windows import session_windows

    d = dt.datetime(2024, 1, 1)

    def ts(h, m=0):
        return d + dt.timedelta(hours=h, minutes=m)

    rows = [
        # batch 1: two sessions at once — [1:00] and [3:00] (gap 30m)
        (1, 1, ts(1, 0)),
        (2, 1, ts(3, 0)),
        # batch 2: 1:10 is late but within gap of [1:00] — an eager
        # emitter has already flushed [1:00] and must fragment; the
        # gated emitter merges to [1:00, 1:10]
        (3, 1, ts(1, 10)),
        # pumps: seal everything, then fire timeouts
        (4, 99, ts(20, 0)),
        (5, 99, ts(22, 0)),
    ]
    log = spark.createDataFrame(rows, f"{SEQ_COL} long, user_id long, ts timestamp")
    replay_dir = str(tmp_path / "replay_frag")
    write_replay_files(log, replay_dir, n_files=5)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = session_windows(stream, gap_minutes=30, watermark="6 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_frag")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_frag"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_frag WHERE user_id <> 99").collect()
    )
    assert got == [
        (1, ts(1, 0), ts(1, 10), 2),
        (1, ts(3, 0), ts(3, 0), 1),
    ]


def test_session_windows_converge_to_batch_sessionizer(spark, tmp_path):
    """The streaming session operator must produce EXACTLY the batch
    sessionizer's sessions on the real events table (same strict-gap
    rule): replay events as 6 microbatches, pump the watermark past
    every end+gap, and compare the full session sets."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.streaming.windows import session_windows

    events = load_table(spark, SF_SMOKE, "events")
    far = dt.datetime(2024, 6, 1)
    pump = spark.createDataFrame(
        [(10_000_001, -99, far), (10_000_002, -99, far + dt.timedelta(hours=1))],
        "event_id long, user_id long, ts timestamp",
    )
    log = (
        events.select("event_id", "user_id", "ts")
        .unionByName(pump)
        .withColumn(SEQ_COL, F.col("event_id"))
    )
    replay_dir = str(tmp_path / "replay_conv")
    write_replay_files(log, replay_dir, n_files=6)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    out = session_windows(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_conv")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_conv"))
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(180)
    if not finished:
        q.stop()
    assert finished, "convergence stream did not finish within 180s"

    got = {
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sessions_conv WHERE user_id <> -99"
        ).collect()
    }
    from flink_cdc_2_3_0_src_spark.queries import events_sessionize

    expect = {
        (r["user_id"], r["sess_start"], r["sess_end"], r["n_events"])
        for r in events_sessionize(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert len(expect) > 10  # non-vacuous


def test_hll_registers_merge_across_microbatches(spark, tmp_path):
    """The HLL monoid through Structured Streaming: per-source register
    states min-merged incrementally across 4 microbatches converge to
    the batch hll_distinct answer exactly — the property that lets a
    streaming pipeline keep a live distinct-count per key with O(m)
    state and no token-keyed shuffle."""
    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        HLL_M,
        hll_distinct,
        hll_doc_registers,
        hll_merge_registers,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    batch_truth = {
        r["source"]: (r["zero_registers"], r["sum_scaled"], r["est_distinct"])
        for r in hll_distinct(docs).collect()
    }

    replay_dir = str(tmp_path / "replay")
    log = docs.withColumn(SEQ_COL, F.col("doc_id"))
    write_replay_files(log, replay_dir, n_files=4)
    stream = read_replay_stream(spark, replay_dir, log.schema)

    regs = stream.select(
        "source", hll_doc_registers(F.col("text")).alias("regs")
    )
    merged = regs.groupBy("source").agg(*hll_merge_registers())
    q = (
        merged.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    from flink_cdc_2_3_0_src_spark.operators import sketch as S

    got = {}
    for r in spark.sql("SELECT * FROM hll_stream").collect():
        regs_row = [r[f"_r{j}"] for j in range(HLL_M)]
        ss = sum(regs_row)
        zeros = sum(1 for x in regs_row if x == S._HLL_EMPTY)
        raw = S._HLL_NUM // (S._HLL_DEN * ss)
        est = (
            S._HLL_LINEAR[zeros - 1]
            if zeros > 0 and raw <= S._HLL_SMALL
            else raw
        )
        got[r["source"]] = (zeros, ss, est)
    assert got == batch_truth


def test_histogram_cells_merge_across_microbatches(spark, tmp_path):
    """The histogram-sketch monoid through Structured Streaming:
    per-(source, bin) counts summed incrementally across microbatches
    equal the batch cells, so the quantile report derived from the
    streamed state matches sketch_quantile_histogram exactly."""
    from flink_cdc_2_3_0_src_spark.model import SEQ_COL
    from flink_cdc_2_3_0_src_spark.operators.sketch import histogram_quantiles

    docs = load_table(spark, SF_SMOKE, "documents")
    batch_truth = {
        (r["source"], r["q"]): (r["n"], r["bin_idx"], r["est_lo"], r["est_hi"])
        for r in histogram_quantiles(docs).collect()
    }

    # global (min, max) fixed up front (the two-pass contract); bin the
    # stream with the same literals
    from flink_cdc_2_3_0_src_spark.functions.hashing import tokens as _toks

    vals = docs.select(F.size(_toks(F.col("text"))).cast("long").alias("v"))
    mm = vals.agg(F.min("v"), F.max("v")).collect()[0]
    vmin, vmax = int(mm[0]), int(mm[1])
    wdt = max(1, -((vmin - vmax - 1) // 256))

    replay_dir = str(tmp_path / "replay")
    log = docs.withColumn(SEQ_COL, F.col("doc_id"))
    write_replay_files(log, replay_dir, n_files=4)
    stream = read_replay_stream(spark, replay_dir, log.schema)
    cells = (
        stream.select(
            "source",
            F.least(
                F.lit(255),
                F.floor(
                    (F.size(_toks(F.col("text"))).cast("long") - F.lit(vmin))
                    / F.lit(wdt)
                ),
            ).cast("long").alias("bin"),
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q = (
        cells.writeStream.format("memory")
        .queryName("qh_cells")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import math
    from collections import defaultdict

    per_src = defaultdict(dict)
    for r in spark.sql("SELECT * FROM qh_cells").collect():
        per_src[r["source"]][r["bin"]] = r["c"]
    got = {}
    for src, binmap in per_src.items():
        n = sum(binmap.values())
        cum, hit = 0, {}
        for b in sorted(binmap):
            cum += binmap[b]
            for qq in (50, 90, 99):
                r_rank = (qq * n + 99) // 100
                if qq not in hit and cum >= r_rank:
                    hit[qq] = (b, r_rank)
        for qq, (b, r_rank) in hit.items():
            got[(src, qq)] = (
                n, b, vmin + b * wdt, min(vmin + b * wdt + wdt - 1, vmax)
            )
    assert got == batch_truth
