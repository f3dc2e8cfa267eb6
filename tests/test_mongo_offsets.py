"""Mongo ChangeStreamOffset / resume-token model (A22 for Mongo;
reference ChangeStreamOffset.java, ResumeTokenUtils.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.sources.mongo import (
    ChangeStreamOffset,
    decode_resume_token,
    encode_resume_token,
    resume_from_offset,
)


def test_decode_resume_token_hex_and_bytes():
    tok = encode_resume_token(1_700_000_000, 7, suffix=b"\x46\x64\x5f\x1d")
    assert decode_resume_token(tok) == (1_700_000_000, 7)
    assert decode_resume_token(bytes.fromhex(tok)) == (1_700_000_000, 7)


def test_decode_rejects_unknown_keytype_and_short_tokens():
    with pytest.raises(ValueError, match="keyType"):
        decode_resume_token("7f" + "00" * 8)  # kType 127, not 130
    with pytest.raises(ValueError, match="too short"):
        decode_resume_token("82" + "00" * 3)
    with pytest.raises(ValueError, match="unknown resume token format"):
        decode_resume_token(12345)


def test_offset_total_order_by_timestamp_only():
    """compareTo uses the BSON timestamp only; the verbatim token rides
    along for exact positioning (reference :131-138)."""
    a = ChangeStreamOffset.from_resume_token(encode_resume_token(100, 1))
    b = ChangeStreamOffset.from_resume_token(encode_resume_token(100, 2))
    c = ChangeStreamOffset.from_resume_token(encode_resume_token(101, 0))
    ts_only = ChangeStreamOffset.from_timestamp(100, 2)
    assert a < b < c
    assert not (b < ts_only) and not (ts_only < b)  # ordering ties
    assert b != ts_only  # equals() compares token too
    assert ChangeStreamOffset.no_stopping() > c
    assert sorted([c, a, b]) == [a, b, c]
    # round trip through the timestamp_value packing
    assert b.seconds == 100 and b.increment == 2


def test_resume_from_token_mid_stream(spark):
    """Mid-stream resume: replaying the stand-in change stream from a
    captured token yields exactly the strict suffix — the token's own
    event is NOT re-emitted (resumeAfter), later same-second increments
    are."""
    rows = [
        # (cluster_ts seconds, increment, key)
        (100, 0, 1), (100, 1, 2), (100, 2, 3),
        (101, 0, 4), (102, 0, 5), (102, 1, 6),
    ]
    stream = spark.createDataFrame(
        rows, "cluster_ts bigint, cluster_inc bigint, k bigint"
    )
    # the consumer saw the (100, 1) event and checkpointed its token
    tok = encode_resume_token(100, 1, suffix=b"opaque-doc-key")
    off = ChangeStreamOffset.from_resume_token(tok)
    got = sorted(r["k"] for r in resume_from_offset(stream, off).collect())
    assert got == [3, 4, 5, 6]
    # resuming from the LAST event's token yields nothing
    last = ChangeStreamOffset.from_resume_token(encode_resume_token(102, 1))
    assert resume_from_offset(stream, last).count() == 0
    # no_stopping dominates every event
    assert (
        resume_from_offset(stream, ChangeStreamOffset.no_stopping()).count() == 0
    )


def test_resume_filter_is_pure_predicate(spark):
    """Scale guard: the resume filter is scan-level — no exchange, no
    Python eval in the plan."""
    stream = spark.createDataFrame(
        [(100, 0, 1)], "cluster_ts bigint, cluster_inc bigint, k bigint"
    )
    off = ChangeStreamOffset.from_timestamp(100, 0)
    plan = (
        resume_from_offset(stream, off)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# copy.existing option surface (MongoDBSourceOptions.java:71-85,
# MongoDBSource.java:181-226)
# ---------------------------------------------------------------------------
import pytest

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.sources.api import MongoDBSource
from flink_cdc_2_3_0_src_spark.sources.mongo import (
    apply_copy_existing,
    match_pipeline_filter,
)


def test_copy_existing_options_parsed():
    c = SourceConfig.from_options(
        {
            "copy.existing": "false",
            "copy.existing.pipeline": '[{"$match": {"closed": false}}]',
            "copy.existing.queue.size": "20480",
            "copy.existing.max.threads": "4",
        }
    ).validate()
    assert c.copy_existing is False
    assert c.copy_existing_queue_size == 20480
    assert c.copy_existing_max_threads == 4
    assert '"$match"' in c.copy_existing_pipeline
    # defaults match the reference (queue 10240, copy on)
    d = SourceConfig()
    assert d.copy_existing is True and d.copy_existing_queue_size == 10240


def test_copy_existing_validation_errors():
    with pytest.raises(ValueError, match="queue.size"):
        SourceConfig.from_options({"copy.existing.queue.size": "0"}).validate()
    with pytest.raises(ValueError, match="max.threads"):
        SourceConfig.from_options({"copy.existing.max.threads": "-1"}).validate()
    with pytest.raises(ValueError, match="not valid JSON"):
        SourceConfig.from_options({"copy.existing.pipeline": "{nope"}).validate()
    with pytest.raises(ValueError, match="JSON ARRAY"):
        SourceConfig.from_options(
            {"copy.existing.pipeline": '{"$match": {}}'}
        ).validate()


def test_copy_existing_builder_routing():
    src = (
        MongoDBSource.builder()
        .copy_existing(True)
        .copy_existing_pipeline('[{"$match": {"o_orderstatus": "F"}}]')
        .copy_existing_queue_size(4096)
        .copy_existing_max_threads(2)
        .build()
    )
    c = src.config
    assert c.copy_existing and c.copy_existing_queue_size == 4096
    assert c.copy_existing_max_threads == 2
    assert "o_orderstatus" in c.copy_existing_pipeline


def test_match_pipeline_filter_semantics(spark):
    from flink_cdc_2_3_0_src_spark.io import load_table

    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    pipeline = (
        '[{"$match": {"o_orderstatus": "F", "o_totalprice": {"$gt": 100000}}},'
        ' {"$match": {"$or": [{"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}},'
        '                     {"o_custkey": {"$lte": 500}}]}}]'
    )
    got = match_pipeline_filter(o, pipeline)
    import pyspark.sql.functions as F

    want = o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 100000)
        & (
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            | (F.col("o_custkey") <= 500)
        )
    )
    n = got.count()
    assert n == want.count() and 0 < n < o.count()


def test_match_pipeline_filter_is_scan_predicate(spark):
    """The $match lands as a pushed scan filter — no exchange, no
    Python eval (the index-friendly pre-filter intent at scale)."""
    from flink_cdc_2_3_0_src_spark.io import load_table

    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    got = match_pipeline_filter(o, '[{"$match": {"o_orderstatus": "F"}}]')
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_match_pipeline_rejects_non_match_stages(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="only .?\\$match"):
        match_pipeline_filter(df, '[{"$project": {"id": 1}}]')
    with pytest.raises(ValueError, match="unsupported operator"):
        match_pipeline_filter(df, '[{"$match": {"id": {"$regex": "x"}}}]')
    with pytest.raises(ValueError, match="single-key"):
        match_pipeline_filter(df, '[{"$match": {}, "$limit": 5}]')


def test_match_exists_maps_to_nullness(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, v string")
    keep = match_pipeline_filter(df, '[{"$match": {"v": {"$exists": true}}}]')
    drop = match_pipeline_filter(df, '[{"$match": {"v": {"$exists": false}}}]')
    assert [r["id"] for r in keep.collect()] == [1]
    assert [r["id"] for r in drop.collect()] == [2]


def test_apply_copy_existing_gate(spark):
    df = spark.range(10)
    on = SourceConfig(copy_existing=True)
    off = SourceConfig(copy_existing=False)
    filt = SourceConfig(
        copy_existing=True,
        copy_existing_pipeline='[{"$match": {"id": {"$lt": 3}}}]',
    )
    assert apply_copy_existing(df, on).count() == 10
    assert apply_copy_existing(df, off) is None
    assert apply_copy_existing(df, filt).count() == 3


def test_match_null_semantics_follow_mongo(spark):
    """Mongo's query semantics on null/absent fields: $ne and $nin
    MATCH documents whose field is null; {f: null} / {$eq: null} match
    nulls.  Spark's <> / isin drop nulls, so a naive translation would
    silently copy LESS data than the pipeline asked for."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id int, v string"
    )

    def ids(pipeline):
        return sorted(
            r["id"] for r in match_pipeline_filter(df, pipeline).collect()
        )

    assert ids('[{"$match": {"v": {"$ne": "a"}}}]') == [2, 3]
    assert ids('[{"$match": {"v": {"$nin": ["a", "b"]}}}]') == [3]
    assert ids('[{"$match": {"v": null}}]') == [3]
    assert ids('[{"$match": {"v": {"$eq": null}}}]') == [3]
    assert ids('[{"$match": {"v": {"$ne": null}}}]') == [1, 2]
    # comparison operators exclude nulls, matching Mongo
    assert ids('[{"$match": {"v": {"$gte": "a"}}}]') == [1, 2]
    # null INSIDE an $in array matches null/absent fields in Mongo;
    # Spark's isin would drop the null row silently
    assert ids('[{"$match": {"v": {"$in": ["a", null]}}}]') == [1, 3]
    assert ids('[{"$match": {"v": {"$in": [null]}}}]') == [3]
    # ... and null inside $nin EXCLUDES null fields (the complement)
    assert ids('[{"$match": {"v": {"$nin": ["a", null]}}}]') == [2]
    assert ids('[{"$match": {"v": {"$nin": [null]}}}]') == [1, 2]
    # empty arrays: $in matches nothing, $nin matches everything
    assert ids('[{"$match": {"v": {"$in": []}}}]') == []
    assert ids('[{"$match": {"v": {"$nin": []}}}]') == [1, 2, 3]
