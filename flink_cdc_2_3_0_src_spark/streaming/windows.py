"""Event-time windowed aggregation + custom stateful operators for
changelog streams.

The reference exposes op_ts as metadata and delegates event-time
processing to Flink (SURVEY §2 note). Our engine owns that surface in
Spark: watermarked tumbling windows over the stream, and
``applyInPandasWithState`` for operators Structured Streaming lacks
(keyed first-seen dedup, running per-key state).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window with a watermark for late data.

    On an unbounded stream the watermark bounds state: windows older
    than (max event time - watermark) are finalized and dropped.

    State-boundedness requires grouping by ``F.window(ts, w)`` ITSELF:
    the window struct keeps its link to the watermarked event-time
    column, so Spark plans a streaming window aggregate with eviction.
    Grouping by ``.start`` (a derived timestamp) detaches that link —
    the plan degrades to an ordinary keyed aggregate whose state grows
    forever and which never finalizes/evicts late windows. ``.start`` is
    projected AFTER the agg instead.
    """
    # Watermarks require TIMESTAMP; naive parquet timestamps surface as
    # TIMESTAMP_NTZ (session TZ is UTC, so the cast is value-preserving).
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("sess_start", T.TimestampType()),
        T.StructField("sess_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def session_windows(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Event-time SESSION windows over an unbounded stream — the
    stateful operator Structured Streaming's built-in window() cannot
    express (no session gap in batch-compatible form pre-3.2 semantics
    we need); implemented with applyInPandasWithState + event-time
    timeouts.

    A session = maximal run of a key's events where consecutive gaps
    are <= gap_minutes (strictly-greater gap splits — same rule as the
    batch sessionizer in queries.events_sessionize). Emission is
    WATERMARK-GATED: a session row is appended only once
    ``sess_end + gap <= watermark`` — the proof that no admissible
    event (on-time or late within the watermark delay) can still merge
    into it, forward OR backward.  Emitting "sessions closed within the
    batch" eagerly would fragment under late data: an event later than
    an already-emitted session but within its gap would have to open a
    spurious second session.

    State is the key's list of OPEN sessions as (start, end, count)
    arrays — bounded by the number of sessions inside the watermark
    horizon (one, under the default 0-second watermark); the event-time
    timeout at the earliest open ``end + gap`` flushes without new data.
    """
    if dict(stream.dtypes).get(ts_col) == "timestamp_ntz":
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    # all interval arithmetic in MICROS: event timestamps carry µs and
    # truncating to ms would emit sessions whose bounds disagree with
    # the batch sessionizer (the convergence test pins this)
    gap_us = gap_minutes * 60 * 1_000_000

    def _row(key, start_us: int, end_us: int, n: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key],
                "sess_start": [pd.Timestamp(start_us, unit="us")],
                "sess_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )

    def _flush(k, sessions: list[list[int]], state: GroupState, wm_ms: int):
        """Emit every session the watermark has sealed; keep the rest in
        state with a timeout at the earliest open end + gap."""
        keep: list[list[int]] = []
        for s in sessions:
            if s[1] + gap_us <= wm_ms * 1000:
                yield _row(k, s[0], s[1], s[2])
            else:
                keep.append(s)
        if keep:
            state.update(
                ([s[0] for s in keep], [s[1] for s in keep], [s[2] for s in keep])
            )
            # kept sessions have end+gap > wm (in µs), so the CEIL of
            # the earliest end+gap in ms is strictly > wm — a valid
            # timeout that cannot re-fire without watermark progress
            next_us = min(s[1] for s in keep) + gap_us
            state.setTimeoutTimestamp(-(-next_us // 1000))
        else:
            state.remove()

    def fn(key, pdfs, state: GroupState):
        k = key[0]
        wm = state.getCurrentWatermarkMs()
        sessions: list[list[int]] = []  # [start_us, end_us, n]
        if state.exists:
            starts, ends, ns = state.get
            sessions = [[int(a), int(b), int(c)] for a, b, c in zip(starts, ends, ns)]
        if state.hasTimedOut:
            yield from _flush(k, sessions, state, wm)
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                vals = pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000
                ts_us.extend(int(v) for v in vals)
        if not ts_us:
            return
        ts_us.sort()
        # Interval-merge sessionization (Flink session-window merge
        # semantics): an event merges into any open session it lies
        # within `gap` of — INCLUDING backwards (watermark > 0 admits
        # events older than a stored start; a forward-only fold would
        # glue those onto the newer session without lowering start_ms,
        # emitting an interval that did not cover its own events).  An
        # event > gap away from every session opens its own.
        for t in ts_us:
            for s in sessions:
                # gap == threshold extends (strictly-greater splits),
                # symmetric in both directions
                if s[0] - gap_us <= t <= s[1] + gap_us:
                    s[0] = min(s[0], t)
                    s[1] = max(s[1], t)
                    s[2] += 1
                    break
            else:
                sessions.append([t, t, 1])
        # an event can bridge two sessions — merge adjacent intervals
        sessions.sort(key=lambda s: s[0])
        merged = [sessions[0]]
        for s in sessions[1:]:
            if s[0] <= merged[-1][1] + gap_us:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)
        yield from _flush(k, merged, state, wm)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            # field names carry the unit: a checkpoint written by the old
            # millis-unit state schema is INCOMPATIBLE by name and fails
            # loudly on restore instead of silently reinterpreting ms as µs
            stateStructType="starts_us ARRAY<LONG>, ends_us ARRAY<LONG>, ns ARRAY<LONG>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_distinct(
    stream: DataFrame,
    key_col: str,
    seq_col: str = "_seq",
) -> DataFrame:
    """Streaming exact dedup: emit each key's FIRST occurrence only,
    across all microbatches (per-key seen-flag state) — the streaming
    form of the exact-dedup pipeline stage (a new document is kept the
    first time its fingerprint appears, dropped forever after).

    applyInPandasWithState keyed on the dedup key; state is one boolean
    per key (bounded by distinct-key count, spillable via RocksDB state
    store on a real cluster).
    """

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            # already emitted: consume and drop
            for _ in pdfs:
                pass
            return iter(())
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf[seq_col].idxmin()]
            if first is None or cand[seq_col] < first[seq_col]:
                first = cand
        if first is None:
            return iter(())
        state.update((True,))
        return iter([first.to_frame().T])

    out_schema = stream.schema
    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen BOOLEAN",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("first_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = "first_seq LONG, n_events LONG"


def first_seen_dedup(stream: DataFrame, keys: Sequence[str] = ("user_id",)) -> DataFrame:
    """Custom stateful operator: per-key first-seen tracking + running
    event count via applyInPandasWithState (the escape hatch for
    operators Spark's built-ins can't express — reference equivalent is
    the Flink keyed-state operators its SQL planner inserts).

    Emits one row per key per microbatch with the stable first-seen
    sequence and the cumulative event count.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        first_seq, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            batch_min = int(pdf["_seq"].min())
            n += len(pdf)
            first_seq = batch_min if first_seq is None else min(first_seq, batch_min)
        state.update((first_seq, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "first_seq": [first_seq], "n_events": [n]}
        )

    return stream.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
