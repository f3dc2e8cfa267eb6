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


def test_sample_frames_stride_and_content(spark):
    from flink_cdc_2_3_0_src_spark.functions.hashing import _py_poly_hash
    from flink_cdc_2_3_0_src_spark.operators.multimodal import sample_frames

    payload = bytes(range(256)) * 10  # 2560 bytes -> 3 frames of 1024/1024/512
    assets = spark.createDataFrame(
        [(1, "video", payload), (2, "video", b""), (3, "video", b"xy")],
        "asset_id long, media_type string, content binary",
    )
    rows = {
        (r["asset_id"], r["frame_idx"]): (r["n_bytes"], r["frame_hash"])
        for r in sample_frames(assets, frame_size=1024, stride=2).collect()
    }
    # stride 2 keeps frames 0 and 2 of asset 1; empty payload -> no rows
    assert set(rows) == {(1, 0), (1, 2), (3, 0)}
    assert rows[(1, 0)][0] == 1024 and rows[(1, 2)][0] == 512
    assert rows[(3, 0)] == (2, _py_poly_hash("xy"))
    # frame content hash matches a driver-side recompute
    expect = _py_poly_hash(payload[2048:].decode("latin-1"))
    assert rows[(1, 2)][1] == expect


def test_resize_media_shape_and_determinism(spark):
    from flink_cdc_2_3_0_src_spark.operators.multimodal import resize_media

    assets = spark.createDataFrame(
        [(1, "image", bytes(range(200))), (2, "image", b"")],
        "asset_id long, media_type string, content binary",
    )
    out = {r["asset_id"]: r for r in resize_media(assets, 8, 8).collect()}
    assert len(out[1]["content"]) == 64 and len(out[2]["content"]) == 64
    assert out[1]["meta"]["width"] == 8 and out[1]["meta"]["height"] == 8
    # deterministic: same input -> same resized bytes
    again = {r["asset_id"]: r for r in resize_media(assets, 8, 8).collect()}
    assert bytes(out[1]["content"]) == bytes(again[1]["content"])
