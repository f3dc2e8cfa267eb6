"""A24 newly-added tables, A25 schema history, A26 percentile chunking,
A32 metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.io import load_table
from flink_cdc_2_3_0_src_spark.plans.chunking import percentile_chunks
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from flink_cdc_2_3_0_src_spark.streaming.metrics import CdcMetrics
from flink_cdc_2_3_0_src_spark.streaming.orchestrate import CaptureGroup
from flink_cdc_2_3_0_src_spark.streaming.schema_history import SchemaHistory
from tests.conftest import SF_SMOKE

KEYS = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey"}


def test_percentile_chunks_cover_all_rows(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    chunks = percentile_chunks(li, "l_orderkey", 8)
    assert 2 <= len(chunks) <= 8
    assert chunks[0].start is None and chunks[-1].end is None
    total = 0
    for c in chunks:
        total += li.filter(F.expr(c.predicate_sql("l_orderkey"))).count()
    assert total == li.count()


def test_percentile_chunks_skewed_key(spark):
    # massively skewed: one hot key — boundaries collapse, dedup keeps
    # the plan valid
    df = spark.createDataFrame([(1,)] * 50 + [(2,), (99,)], ["k"])
    chunks = percentile_chunks(df, "k", 8)
    total = sum(df.filter(F.expr(c.predicate_sql("k"))).count() for c in chunks)
    assert total == df.count()


def test_newly_added_table_capture(spark, tmp_path):
    g = CaptureGroup(spark, SF_SMOKE, str(tmp_path), KEYS)
    # first start: only customer matches
    df1 = g.start(["testdb"], ["testdb\\.customer"], list(KEYS))
    tables1 = {r["_table"] for r in df1.select("_table").distinct().collect()}
    assert tables1 == {"customer"}
    # restart with a widened include list: supplier is newly added →
    # snapshotted; customer remains (registry, not re-snapshotted)
    df2 = g.start(["testdb"], ["testdb\\.(customer|supplier)"], list(KEYS),
                  current_offset=777)
    tables2 = {r["_table"] for r in df2.select("_table").distinct().collect()}
    assert tables2 == {"customer", "supplier"}
    assert g.captured()["supplier"] == 777
    assert g.captured()["customer"] == 0


def test_newly_added_gate(spark, tmp_path):
    g = CaptureGroup(spark, SF_SMOKE, str(tmp_path), KEYS)
    g.start(["testdb"], ["testdb\\.customer"], list(KEYS))
    with pytest.raises(ValueError, match="newly-added"):
        g.start(["testdb"], ["testdb\\..*"], list(KEYS), allow_newly_added=False)


def test_schema_history(tmp_path):
    h = SchemaHistory(str(tmp_path / "history.json"))
    v1 = T.StructType([T.StructField("id", T.LongType())])
    v2 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    h.record("db.t", 0, v1, "CREATE TABLE t(id BIGINT)")
    h.record("db.t", 500, v2, "ALTER TABLE t ADD COLUMN name VARCHAR")
    assert h.schema_at("db.t", 100) == v1
    assert h.schema_at("db.t", 500) == v2
    assert h.schema_at("db.t", 9999) == v2
    assert h.schema_at("db.other", 100) is None
    # persisted across restarts
    h2 = SchemaHistory(str(tmp_path / "history.json"))
    assert h2.schema_at("db.t", 9999) == v2
    assert h2.versions("db.t") == [0, 500]


def test_schema_evolution_decode(spark, tmp_path):
    """A25 as a data path: a log whose payload gains a column mid-stream
    decodes correctly — v1 rows under the v1 schema (new column null),
    v2 rows under v2 — and materializes to the right final state."""
    import json

    from flink_cdc_2_3_0_src_spark.operators.changelog import materialize
    from flink_cdc_2_3_0_src_spark.streaming.schema_history import (
        SchemaHistory,
        decode_with_history,
    )

    h = SchemaHistory(str(tmp_path / "hist.json"))
    v1 = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    v2 = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    h.record("db.t", 0, v1, "CREATE TABLE t(id, v)")
    h.record("db.t", 100, v2, "ALTER TABLE t ADD COLUMN tag")

    def env(op, after, seq):
        return (json.dumps({"after": after, "op": op, "ts_ms": seq}), seq)

    rows = [
        env("c", {"id": 1, "v": 10.0}, 10),                       # v1 era
        env("c", {"id": 2, "v": 20.0}, 20),                       # v1 era
        env("u", {"id": 1, "v": 11.0, "tag": "x"}, 150),          # v2 era
        env("c", {"id": 3, "v": 30.0, "tag": "y"}, 200),          # v2 era
    ]
    envelopes = spark.createDataFrame(rows, "value string, _seq long")
    decoded = decode_with_history(envelopes, h, "db.t")
    state = materialize(decoded, ["id"])
    got = {(r["id"], r["v"], r["tag"]) for r in state.collect()}
    assert got == {(1, 11.0, "x"), (2, 20.0, None), (3, 30.0, "y")}


def test_metrics_wrap(spark):
    log = scripted_changelog(spark, SF_SMOKE)
    m = CdcMetrics()
    seen = []
    fn = m.wrap(lambda df, bid: seen.append((bid, df.count())))
    fn(log.limit(100), 0)
    fn(log.limit(100), 1)
    assert m.total_rows == 200
    assert len(m.batches) == 2
    assert m.last_emit_lag_ms > 0  # events are from 2024 → huge lag
    assert seen[0][0] == 0 and seen[0][1] == 100
