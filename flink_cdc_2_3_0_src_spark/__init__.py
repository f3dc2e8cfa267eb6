"""flink_cdc_2_3_0_src_spark — a PySpark-native CDC analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
``tanbingshi666/flink-cdc-2.3.0-src`` (Ververica flink-cdc-connectors 2.3):
change-data-capture sources that produce changelog row streams
(+I / -U / +U / -D), a parallel chunked snapshot planner, snapshot/log
reconciliation, and a changelog-aware relational operator layer — all
expressed Spark-first (DataFrame / SQL / Structured Streaming), not as a
translation of the reference's Flink/Java runtime.

Layout (mirrors SURVEY.md §7):
    model        — offsets, splits, table ids, changelog schema (A22, §1.2)
    plans/       — chunk planner + snapshot manifest (A2-A4, A18)
    sources/     — dialects: parquet test dialect, scripted DML log, JDBC (A1, A5)
    operators/   — changelog materialize / signed aggs / dedup / similarity / text
    functions/   — debezium JSON codec, portable hashing (A13, A15)
    streaming/   — hybrid snapshot→stream orchestration (A16-A17, B13)
"""

__version__ = "0.1.0"

from flink_cdc_2_3_0_src_spark.model import (  # noqa: F401
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    BinlogOffset,
    ChunkRange,
    SnapshotSplit,
    StartupMode,
    StreamSplit,
    TableId,
)
from flink_cdc_2_3_0_src_spark.session import get_spark  # noqa: F401
