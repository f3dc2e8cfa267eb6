"""Canal-JSON / Maxwell-JSON / changelog-json decoders
(functions/cdc_formats.py) — the CDC formats the reference's own docs
point users at (docs/content/formats/changelog-json.md deprecation
note), decoded as pure Spark expressions."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.functions.cdc_formats import (
    from_canal_json,
    from_changelog_json,
    from_maxwell_json,
    to_canal_json,
)
from flink_cdc_2_3_0_src_spark.model import OP_COL, SEQ_COL
from flink_cdc_2_3_0_src_spark.operators.changelog import materialize

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("s", T.StringType()),
    ]
)


def _rows(df):
    return sorted(
        [(r["id"], r["v"], r["s"], r[OP_COL]) for r in df.collect()]
    )


def test_canal_decode_batch_insert_update_delete(spark):
    msgs = [
        json.dumps(
            {
                "data": [
                    {"id": 1, "v": 1.5, "s": "a"},
                    {"id": 2, "v": 2.5, "s": "b"},
                ],
                "old": None,
                "type": "INSERT",
                "ts": 100,
                "database": "d",
                "table": "t",
                "pkNames": ["id"],
            }
        ),
        json.dumps(
            {
                # batch UPDATE: old[i] carries ONLY the changed fields
                "data": [
                    {"id": 1, "v": 9.5, "s": "a"},
                    {"id": 2, "v": 2.5, "s": "bb"},
                ],
                "old": [{"v": 1.5}, {"s": "b"}],
                "type": "UPDATE",
                "ts": 200,
                "database": "d",
                "table": "t",
                "pkNames": ["id"],
            }
        ),
        json.dumps(
            {
                "data": [{"id": 2, "v": 2.5, "s": "bb"}],
                "old": None,
                "type": "DELETE",
                "ts": 300,
                "database": "d",
                "table": "t",
                "pkNames": ["id"],
            }
        ),
        "not json",
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = from_canal_json(df, PAYLOAD)
    got = _rows(out)
    assert (1, 1.5, "a", "+I") in got and (2, 2.5, "b", "+I") in got
    # -U images: data overridden by old's changed fields
    assert (1, 1.5, "a", "-U") in got and (1, 9.5, "a", "+U") in got
    assert (2, 2.5, "b", "-U") in got and (2, 2.5, "bb", "+U") in got
    assert (2, 2.5, "bb", "-D") in got
    assert len(got) == 7  # malformed message dropped
    # materialized end state: id 1 updated, id 2 deleted
    state = {(r["id"], r["v"]) for r in materialize(out, ["id"]).collect()}
    assert state == {(1, 9.5)}


def test_maxwell_decode(spark):
    msgs = [
        json.dumps(
            {"database": "d", "table": "t", "type": "insert", "ts": 1,
             "data": {"id": 5, "v": 1.0, "s": "x"}}
        ),
        json.dumps(
            {"database": "d", "table": "t", "type": "update", "ts": 2,
             "data": {"id": 5, "v": 2.0, "s": "x"}, "old": {"v": 1.0}}
        ),
        json.dumps(
            {"database": "d", "table": "t", "type": "delete", "ts": 3,
             "data": {"id": 5, "v": 2.0, "s": "x"}}
        ),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    got = _rows(from_maxwell_json(df, PAYLOAD))
    assert got == [
        (5, 1.0, "x", "+I"),
        (5, 1.0, "x", "-U"),
        (5, 2.0, "x", "+U"),
        (5, 2.0, "x", "-D"),
    ]


def test_changelog_json_decode(spark):
    msgs = [
        json.dumps({"data": {"id": 1, "v": 1.0, "s": "a"}, "op": "+I"}),
        json.dumps({"data": {"id": 1, "v": 1.0, "s": "a"}, "op": "-U"}),
        json.dumps({"data": {"id": 1, "v": 2.0, "s": "a"}, "op": "+U"}),
        json.dumps({"data": {"id": 1, "v": 2.0, "s": "a"}, "op": "??"}),  # dropped
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    got = _rows(from_changelog_json(df, PAYLOAD))
    # sorted by (id, v, s, op): (1.0,+I), (1.0,-U), (2.0,+U); '??' dropped
    assert [op for _, _, _, op in got] == ["+I", "-U", "+U"]


def test_canal_roundtrip_preserves_state(spark):
    """encode(changelog) -> decode == same materialized state, on the
    full scripted log (the cdc_dbz_roundtrip shape for canal)."""
    from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
    from tests.conftest import SF_SMOKE

    log = scripted_changelog(spark, SF_SMOKE).select(
        "user_id", "value", OP_COL, SEQ_COL
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    enc = to_canal_json(log, ["user_id", "value"], key_cols=["user_id"])
    dec = from_canal_json(enc, schema)
    got = {
        (r["user_id"], r["value"])
        for r in materialize(dec, ["user_id"]).collect()
    }
    exp = {
        (r["user_id"], r["value"])
        for r in materialize(log, ["user_id"]).collect()
    }
    assert len(exp) > 0 and got == exp


def test_format_decoders_stay_jvm_side(spark):
    df = spark.createDataFrame([("{}",)], "value string")
    for fn in (from_canal_json, from_maxwell_json, from_changelog_json):
        plan = (
            fn(df, PAYLOAD)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan, fn.__name__


def test_canal_truncated_old_array_does_not_crash(spark):
    """Hostile/truncated producer: old shorter than data must yield a
    NULL old entry (before = data) — plain element_at would throw under
    Spark 4's default ANSI mode and kill the scan."""
    msg = json.dumps(
        {
            "data": [{"id": 1, "v": 2.0, "s": "a"}, {"id": 2, "v": 3.0, "s": "b"}],
            "old": [{"v": 1.0}],
            "type": "UPDATE",
            "ts": 100,
        }
    )
    df = spark.createDataFrame([(msg,)], "value string")
    got = _rows(from_canal_json(df, PAYLOAD))
    assert (1, 1.0, "a", "-U") in got and (1, 2.0, "a", "+U") in got
    # second row had no old entry: before falls back to the data image
    assert (2, 3.0, "b", "-U") in got and (2, 3.0, "b", "+U") in got


def test_to_canal_json_key_aware_pairing(spark):
    """Two keys updated at the SAME seq (one transaction/commit
    position) must pair -U/+U per key — seq-only pairing cross-matches
    into phantom UPDATEs with wrong old blocks."""
    rows = [
        (1, 1.0, "x", "-U", 10),
        (1, 2.0, "x", "+U", 10),
        (2, 5.0, "y", "-U", 10),
        (2, 6.0, "y", "+U", 10),
    ]
    log = spark.createDataFrame(
        rows, "id long, v double, s string, _op string, _seq long"
    )
    enc = to_canal_json(log, ["id", "v", "s"], key_cols=["id"])
    msgs = [json.loads(r["value"]) for r in enc.collect()]
    upds = [m for m in msgs if m["type"] == "UPDATE"]
    assert len(upds) == 2  # no phantom cross-matches
    by_id = {m["data"][0]["id"]: m for m in upds}
    assert by_id[1]["old"][0]["v"] == 1.0
    assert by_id[2]["old"][0]["v"] == 5.0


def test_to_canal_json_requires_key_cols(spark):
    """Seq-only -U/+U pairing cross-matches keys sharing a commit
    position (phantom UPDATEs) — the unsafe mode must not be reachable:
    omitting key_cols raises at plan time."""
    import pytest

    log = spark.createDataFrame(
        [(1, 1.0, "+I", 10)], "id long, v double, _op string, _seq long"
    )
    with pytest.raises(ValueError, match="key_cols"):
        to_canal_json(log, ["id", "v"])


def test_mongodb_changestream_decode(spark):
    """Reference MongoDBConnectorDeserializationSchema.java:120-167:
    insert -> +I from fullDocument; update/replace -> +U only (upsert
    mode, no -U); update with null fullDocument skipped (deleted before
    the lookup); delete -> -D from documentKey (non-key columns NULL);
    drop/invalidate dropped; _seq = clusterTime t*2^32 + i.  Nested
    fields decode through the recursive BSON converters."""
    from flink_cdc_2_3_0_src_spark.functions.cdc_formats import (
        from_mongodb_changestream_json,
    )

    def env(op, full=None, key=None, t=1, i=0):
        d = {"operationType": op,
             "clusterTime": {"$timestamp": {"t": t, "i": i}}}
        if full is not None:
            d["fullDocument"] = json.dumps(full)
        if key is not None:
            d["documentKey"] = json.dumps(key)
        return json.dumps(d)

    doc1 = {"_id": {"$numberLong": "1"}, "name": "a",
            "tags": ["x", "y"],
            "meta": {"n": {"$numberInt": "7"}}}
    doc1b = {"_id": {"$numberLong": "1"}, "name": "a2",
             "tags": ["x"], "meta": {"n": {"$numberInt": "8"}}}
    msgs = [
        env("insert", full=doc1, key={"_id": {"$numberLong": "1"}}, t=1, i=1),
        env("update", full=doc1b, key={"_id": {"$numberLong": "1"}}, t=1, i=2),
        env("update", full=None, key={"_id": {"$numberLong": "1"}}, t=1, i=3),
        env("replace", full=doc1b, key={"_id": {"$numberLong": "1"}}, t=2, i=0),
        env("delete", key={"_id": {"$numberLong": "1"}}, t=2, i=1),
        env("drop", t=3, i=0),
    ]
    declared = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "meta", T.StructType([T.StructField("n", T.IntegerType())])
            ),
        ]
    )
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    rows = sorted(
        from_mongodb_changestream_json(df, declared).collect(),
        key=lambda r: r[SEQ_COL],
    )
    ops = [(r["_id"], r["name"], r[OP_COL]) for r in rows]
    assert ops == [
        (1, "a", "+I"),
        (1, "a2", "+U"),   # update; the null-fullDocument update skipped
        (1, "a2", "+U"),   # replace
        (1, None, "-D"),   # documentKey only: non-key columns NULL
    ]
    assert list(rows[0]["tags"]) == ["x", "y"] and rows[0]["meta"]["n"] == 7
    assert rows[1]["meta"]["n"] == 8
    # clusterTime total order: (t=1,i=1) < (1,2) < (2,0) < (2,1)
    seqs = [r[SEQ_COL] for r in rows]
    assert seqs == sorted(seqs) and seqs[0] == (1 << 32) + 1


def test_mongodb_changestream_stays_jvm_side(spark):
    from flink_cdc_2_3_0_src_spark.functions.cdc_formats import (
        from_mongodb_changestream_json,
    )

    declared = T.StructType([T.StructField("_id", T.LongType())])
    df = spark.createDataFrame([("{}",)], "value string")
    plan = (
        from_mongodb_changestream_json(df, declared)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_mongodb_changestream_decode_streaming(spark, tmp_path):
    """The change-stream decoder is pure expressions, so it runs
    unchanged under Structured Streaming: replay envelope files through
    readStream -> decode -> memory sink and get the same changelog as
    the batch path (availableNow microbatches)."""
    from flink_cdc_2_3_0_src_spark.functions.cdc_formats import (
        from_mongodb_changestream_json,
    )
    from flink_cdc_2_3_0_src_spark.streaming.replay import (
        read_replay_stream,
        write_replay_files,
    )

    def env(op, doc, t, i):
        d = {"operationType": op,
             "clusterTime": {"$timestamp": {"t": t, "i": i}},
             "documentKey": json.dumps({"_id": {"$numberLong": str(doc["_id"])}})}
        if op != "delete":
            d["fullDocument"] = json.dumps(
                {"_id": {"$numberLong": str(doc["_id"])}, "v": doc.get("v")}
            )
        return json.dumps(d)

    msgs = [
        env("insert", {"_id": 1, "v": "a"}, 1, 0),
        env("update", {"_id": 1, "v": "b"}, 1, 1),
        env("insert", {"_id": 2, "v": "c"}, 2, 0),
        env("delete", {"_id": 2}, 2, 1),
    ]
    schema = T.StructType(
        [
            T.StructField("value", T.StringType()),
            T.StructField("_seq", T.LongType()),  # replay-file ordering
        ]
    )
    log = spark.createDataFrame(
        [(m, i) for i, m in enumerate(msgs)], schema
    )
    replay_dir = str(tmp_path / "cs_replay")
    write_replay_files(log, replay_dir, n_files=2)
    stream = read_replay_stream(spark, replay_dir, schema).select("value")

    declared = T.StructType(
        [T.StructField("_id", T.LongType()), T.StructField("v", T.StringType())]
    )
    out = from_mongodb_changestream_json(stream, declared)
    q = (
        out.writeStream.format("memory")
        .queryName("cs_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        spark.sql("SELECT * FROM cs_out").collect(), key=lambda r: r[SEQ_COL]
    )
    assert [(r["_id"], r["v"], r[OP_COL]) for r in got] == [
        (1, "a", "+I"),
        (1, "b", "+U"),
        (2, "c", "+I"),
        (2, None, "-D"),
    ]
