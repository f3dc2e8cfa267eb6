"""Startup-mode resolution (A21/B9, reference StartupOptions.java:29-95).

Given the full scripted log and a SourceConfig, produce the changelog a
source started in that mode would emit:

  initial          — snapshot (hybrid pipeline) + stream from snapshot HW
  earliest-offset  — no snapshot; replay the whole log
  latest-offset    — no snapshot; only events after the current tip
  specific-offset  — stream from a given offset (exclusive), A22 ordering
  timestamp        — stream from the first event with ts >= t0 (A11:
                     drop earlier events, keep heartbeats)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import SEQ_COL, StartupMode


def apply_startup_mode(
    log: DataFrame,
    config: SourceConfig,
    current_tip: Optional[int] = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Filter the log stream according to the startup mode. For INITIAL
    the caller runs the hybrid snapshot first; this function handles the
    stream-side filter for every mode."""
    mode = config.startup_mode
    if mode in (StartupMode.INITIAL, StartupMode.EARLIEST):
        return log
    if mode == StartupMode.LATEST:
        if current_tip is None:
            current_tip = log.agg(F.max(SEQ_COL)).collect()[0][0] or 0
        return log.filter(F.col(SEQ_COL) > current_tip)
    if mode == StartupMode.SPECIFIC_OFFSET:
        pos = config.startup_specific_offset_pos
        if pos is None:
            raise ValueError("specific-offset startup requires a position")
        return log.filter(F.col(SEQ_COL) > pos)
    if mode == StartupMode.TIMESTAMP:
        if config.startup_timestamp_ms is None:
            raise ValueError("timestamp startup requires startup_timestamp_ms")
        # A11: drop events older than t0 (heartbeat events carry no data
        # and would pass through in a real source; the scripted log has
        # no heartbeats)
        # Parquet readers may surface the column as TIMESTAMP or
        # TIMESTAMP_NTZ depending on file metadata; session TZ is UTC so
        # casting NTZ -> TIMESTAMP is value-preserving and unix_millis
        # only accepts TIMESTAMP.
        return log.filter(
            F.unix_millis(F.col(ts_col).cast("timestamp"))
            >= F.lit(config.startup_timestamp_ms)
        )
    raise ValueError(f"unsupported startup mode {mode}")
