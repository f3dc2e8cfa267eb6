"""Upsert (MERGE-style) sink for changelog streams (B5/B13).

``foreachBatch`` + keyed merge: each microbatch of changelog rows is
merged into a versioned parquet state table — read current state, union
with the batch, keep the latest image per key, write a NEW version
directory, then atomically swap a pointer file. Idempotent under batch
replay: re-merging the same batch yields the same state, which is what
makes Structured Streaming's at-least-once delivery exactly-once
end-to-end (the reference gets this from Flink checkpoints +
notifyCheckpointComplete, DebeziumSourceFunction.java:106-576; we get it
from SS checkpointing + an idempotent sink).

On a real cluster this would be Delta/Iceberg MERGE INTO; the versioned
parquet + pointer file reproduces the same atomic-visibility contract
with no extra dependency.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import OP_COL, OP_DELETE, OP_UPDATE_BEFORE, SEQ_COL
from flink_cdc_2_3_0_src_spark.operators.changelog import materialize


class UpsertParquetSink:
    def __init__(self, spark: SparkSession, path: str, keys: Sequence[str]) -> None:
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_version(self) -> Optional[str]:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return f.read().strip() or None

    def read_state(self) -> Optional[DataFrame]:
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, v))

    def merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch target: keyed merge of one changelog microbatch."""
        state = self.read_state()
        # state rows re-enter the merge as +I images with seq below any
        # batch row (their effects are already folded in)
        incoming = batch
        if state is not None:
            as_log = (
                state.withColumn(OP_COL, F.lit("+I"))
                .withColumn(SEQ_COL, F.lit(-1).cast("long"))
            )
            incoming = as_log.unionByName(
                batch.select(*as_log.columns), allowMissingColumns=False
            )
        else:
            incoming = batch
        new_state = materialize(incoming, self.keys)
        version = f"v{batch_id:010d}"
        out_dir = os.path.join(self.path, version)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)  # replayed batch: overwrite, same result
        new_state.write.mode("overwrite").parquet(out_dir)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer)

    def foreach_batch(self):
        return lambda df, bid: self.merge_batch(df, bid)
