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
