"""Multimodal plumbing: mapInPandas batch shape, schema, stub behavior."""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.io import load_table
from flink_cdc_2_3_0_src_spark.operators.multimodal import (
    _byte_feature,
    _content_hash,
    _decode_image,
    documents_as_assets,
    extract_features,
)
from tests.conftest import SF_SMOKE


def test_decode_stub_raises():
    import pytest

    with pytest.raises(NotImplementedError, match="Pillow|decode"):
        _decode_image(b"\x89PNG...")


def test_byte_feature_deterministic():
    assert _byte_feature(b"") == [0.0] * 8
    f1 = _byte_feature(b"hello world, this is a payload")
    assert len(f1) == 8 and all(0.0 <= x <= 1.0 for x in f1)
    assert f1 == _byte_feature(b"hello world, this is a payload")


def test_extract_features_end_to_end(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    feats = extract_features(documents_as_assets(docs))
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert r["media_type"] == "image"
    assert r["n_bytes"] > 0
    assert len(r["feature"]) == 8
    # content hash matches the pure-python reference
    doc = {d["doc_id"]: d["text"] for d in docs.collect()}[r["asset_id"]]
    assert r["content_hash"] == _content_hash(doc.encode("utf-8"))
