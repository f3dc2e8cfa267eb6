"""Schema-change records flowing through the stream (includeSchemaChanges,
reference MySqlRecordEmitter.java:109-121) + A27 chunking twins."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.model import (
    OP_COL,
    OP_SCHEMA,
    SEQ_COL,
    ChunkRange,
)
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from flink_cdc_2_3_0_src_spark.streaming.hybrid import HybridPipeline
from flink_cdc_2_3_0_src_spark.streaming.schema_history import (
    SchemaHistory,
    apply_schema_change_stream,
)
from tests.conftest import SF_SMOKE


def _schema_json(fields):
    return T.StructType(
        [T.StructField(n, t, True) for n, t in fields]
    ).json()


def _log_with_ddl(spark):
    v1 = _schema_json([("user_id", T.LongType()), ("value", T.DoubleType())])
    v2 = _schema_json(
        [("user_id", T.LongType()), ("value", T.DoubleType()), ("note", T.StringType())]
    )
    rows = [
        (1, "a", "+I", 10),
        (None, v1, OP_SCHEMA, 15),
        (1, "b", "+U", 20),
        (2, "c", "+I", 30),
        (None, v2, OP_SCHEMA, 35),
        (2, "d", "+U", 40),
    ]
    return spark.createDataFrame(
        rows, f"user_id long, value string, {OP_COL} string, {SEQ_COL} long"
    ), (v1, v2)


def test_schema_changes_recorded_and_dropped_by_default(spark, tmp_path):
    log, (v1, v2) = _log_with_ddl(spark)
    hist = SchemaHistory(str(tmp_path / "history.json"))
    out = apply_schema_change_stream(log, hist, "t")
    assert hist.versions("t") == [15, 35]
    assert [f.name for f in hist.schema_at("t", 20).fields] == ["user_id", "value"]
    assert [f.name for f in hist.schema_at("t", 40).fields] == [
        "user_id", "value", "note",
    ]
    ops = {r[OP_COL] for r in out.collect()}
    assert OP_SCHEMA not in ops and len(out.collect()) == 4


def test_schema_changes_emitted_when_enabled(spark, tmp_path):
    log, _ = _log_with_ddl(spark)
    hist = SchemaHistory(str(tmp_path / "history2.json"))
    out = apply_schema_change_stream(log, hist, "t", include_schema_changes=True)
    rows = sorted(out.collect(), key=lambda r: r[SEQ_COL])
    assert [r[OP_COL] for r in rows] == ["+I", "+S", "+U", "+I", "+S", "+U"]
    # history recorded regardless of emission
    assert hist.versions("t") == [15, 35]


def test_stream_filter_always_passes_schema_events(spark):
    """A10: schema/signal records bypass the chunk-HW emission filter in
    BOTH filter forms (reference shouldEmit always passes non-data
    events)."""
    log = scripted_changelog(spark, SF_SMOKE)
    p = HybridPipeline(spark, log, ["user_id"])
    chunks = [ChunkRange(None, 10), ChunkRange(10, None)]
    _snap, manifest = p.run_snapshot_phase(
        chunks, "user_id", watermarks=lambda i: (400, 500 + 100 * i)
    )
    # a schema event EARLIER than every chunk HW — data at that seq would
    # be suppressed, the schema record must not be
    ddl = spark.createDataFrame(
        [(None, None, None, OP_SCHEMA, 50)], log.schema
    )
    events = log.unionByName(ddl)
    for out in (p.stream_filter(events, manifest),
                p.stream_filter_join(events, manifest)):
        got = out.filter(F.col(OP_COL) == OP_SCHEMA).collect()
        assert len(got) == 1 and got[0][SEQ_COL] == 50


def test_sharded_and_splitvector_chunks(spark):
    from flink_cdc_2_3_0_src_spark.plans.chunking import (
        sharded_chunks,
        splitvector_chunks,
    )

    # sharded: pre-existing bounds become tiling ranges
    chunks = sharded_chunks([10, 20, 20, 30])
    assert [(c.start, c.end) for c in chunks] == [
        (None, 10), (10, 20), (20, 30), (30, None),
    ]
    # splitvector: approx boundaries still tile; every key in exactly one
    df = spark.range(1, 1001).select(F.col("id").alias("k"))
    sv = splitvector_chunks(df, "k", chunk_size=100)
    assert len(sv) > 1
    for probe in (1, 250, 999, 1000):
        assert sum(1 for c in sv if c.contains(probe)) == 1
