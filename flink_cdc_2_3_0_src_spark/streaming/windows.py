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
