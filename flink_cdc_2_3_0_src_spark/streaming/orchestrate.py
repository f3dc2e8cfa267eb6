"""Multi-table capture orchestration + newly-added-table support (A24).

Reference behavior (`scan.newly-added-table.enabled`,
MySqlSourceEnumerator.java:112-196): on restart, newly matched tables
are snapshotted while previously captured tables resume streaming from
their checkpointed offsets.

Spark mapping: driver-side orchestration — each table has its own
snapshot manifest under a capture directory; on every start we diff the
regex-matched table set against the manifests, snapshot only the new
tables (batch job at the current log offset), and union everything into
one changelog with `_table` metadata. No reader suspension is needed:
Spark's batch snapshot runs independently of the running stream, and the
new table's log filter starts at its own snapshot HW.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import TableId, match_tables
from flink_cdc_2_3_0_src_spark.sources.parquet_dialect import ParquetTableSource


class CaptureGroup:
    """Tracks which tables have been snapshotted across restarts."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        state_dir: str,
        key_cols: dict[str, str],
    ) -> None:
        self.spark = spark
        self.sf_dir = sf_dir
        self.state_dir = state_dir
        self.key_cols = key_cols
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _registry(self) -> str:
        return os.path.join(self.state_dir, "captured_tables.json")

    def captured(self) -> dict[str, int]:
        """table -> snapshot offset"""
        if not os.path.exists(self._registry):
            return {}
        with open(self._registry) as f:
            return json.load(f)

    def _save(self, captured: dict[str, int]) -> None:
        tmp = self._registry + ".tmp"
        with open(tmp, "w") as f:
            json.dump(captured, f)
        os.replace(tmp, self._registry)

    def start(
        self,
        database_patterns: Sequence[str],
        table_patterns: Sequence[str],
        available: Sequence[str],
        current_offset: int = 0,
        allow_newly_added: bool = True,
    ) -> DataFrame:
        """(Re)start capture: snapshot tables matched now but not yet in
        the registry, keep registered ones, return the union changelog."""
        matched = match_tables(
            [TableId("testdb", None, t) for t in available],
            database_patterns,
            table_patterns,
        )
        captured = self.captured()
        new = [t.table for t in matched if t.table not in captured]
        if new and not allow_newly_added and captured:
            raise ValueError(
                f"tables {new} appeared but scan.newly-added-table.enabled "
                "is false (A24 gate)"
            )
        for t in new:
            captured[t] = current_offset  # snapshot at the current log tip
            self._save(captured)
        parts = []
        for t, _off in sorted(captured.items()):
            src = ParquetTableSource(
                self.spark, self.sf_dir, t, split_key=self.key_cols[t]
            )
            parts.append(
                src.scan(with_metadata=True).select(
                    F.col(self.key_cols[t]).cast("long").alias("key"),
                    F.col("_table"),
                    F.col("_op"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
