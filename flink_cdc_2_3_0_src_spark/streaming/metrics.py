"""Source metrics (A32).

Reference exposes currentFetchEventTimeLag / currentEmitEventTimeLag /
sourceIdleTime (MySqlSourceReaderMetrics.java). Spark mapping: a
StreamingQueryListener aggregating per-batch progress, plus an
event-time lag computed inside foreachBatch (now - max event ts).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BatchMetric:
    batch_id: int
    n_rows: int
    emit_lag_ms: float  # wall-clock now - max event-time in batch
    wall_ms: float


@dataclass
class CdcMetrics:
    """Collects per-batch metrics; wrap a foreachBatch function."""

    batches: list[BatchMetric] = field(default_factory=list)

    def wrap(self, inner, ts_col: str = "ts"):
        def _f(df: DataFrame, batch_id: int) -> None:
            t0 = time.time()
            # single pass over the (already materialized) batch
            agg = df.agg(
                F.count(F.lit(1)).alias("n"), F.max(ts_col).alias("mx")
            ).collect()[0]
            inner(df, batch_id)
            now = time.time()
            mx = agg["mx"]
            lag = (now - mx.timestamp()) * 1000 if mx is not None else 0.0
            self.batches.append(
                BatchMetric(batch_id, agg["n"], lag, (now - t0) * 1000)
            )

        return _f

    @property
    def total_rows(self) -> int:
        return sum(b.n_rows for b in self.batches)

    @property
    def last_emit_lag_ms(self) -> float:
        return self.batches[-1].emit_lag_ms if self.batches else 0.0


def listener(log: list):
    """StreamingQueryListener capturing progress rows/sec (attach with
    spark.streams.addListener)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            log.append(("started", event.id))

        def onQueryProgress(self, event):
            p = event.progress
            log.append(("progress", p.batchId, p.numInputRows))

        def onQueryIdle(self, event):
            log.append(("idle",))

        def onQueryTerminated(self, event):
            log.append(("terminated", event.id))

    return _L()


def observe_cdc(df: DataFrame, ts_col: str = "ts", name: str = "cdc") -> DataFrame:
    """Attach the A32 metrics as ``Dataset.observe`` accumulators —
    computed DURING the sink pass, no extra job per batch (the scale
    form of ``CdcMetrics.wrap``, whose agg().collect() re-scans each
    microbatch).  Read results per batch via ``observed_listener``."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.max(ts_col).alias("max_event_ts"),
    )


def observed_listener(sink: list, name: str = "cdc"):
    """StreamingQueryListener draining the ``observe`` metrics of each
    batch into ``sink`` as (batch_id, n_rows, max_event_ts)."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            om = event.progress.observedMetrics
            if name in om:
                row = om[name]
                sink.append(
                    (event.progress.batchId, row["n_rows"], row["max_event_ts"])
                )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return _L()
