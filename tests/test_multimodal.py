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


# --- r5: REAL container probing (no codec libs needed) ---------------


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02"
        + b"\x00" * 7
    )


def _jpeg(w, h):
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + (17).to_bytes(2, "big")
        + b"\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03"
        + b"\x00" * 10
    )
    return b"\xff\xd8" + app0 + sof0


def _wav(channels, rate, n_samples, bits=16):
    frame = channels * bits // 8
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * frame).to_bytes(4, "little")
        + frame.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + (n_samples * frame).to_bytes(4, "little")
    return b"RIFF" + (36 + n_samples * frame).to_bytes(4, "little") + b"WAVE" + fmt + data


def test_probe_container_real_headers():
    from flink_cdc_2_3_0_src_spark.operators.multimodal import probe_container

    assert probe_container(_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480,
        "n_channels": None, "sample_rate": None, "n_samples": None,
    }
    j = probe_container(_jpeg(1920, 1080))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 1920, 1080)
    w = probe_container(_wav(2, 44100, 1000))
    assert (w["format"], w["n_channels"], w["sample_rate"], w["n_samples"]) == (
        "wav", 2, 44100, 1000,
    )
    g = probe_container(b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little"))
    assert (g["format"], g["width"], g["height"]) == ("gif", 320, 200)
    b = probe_container(
        b"BM" + b"\x00" * 16 + (12).to_bytes(4, "little") + (-34).to_bytes(4, "little", signed=True)
    )
    assert (b["format"], b["width"], b["height"]) == ("bmp", 12, 34)
    # malformed / truncated / empty degrade to unknown, never raise
    for junk in (b"", b"garbage", _png(1, 1)[:10], b"\xff\xd8\xff", b"RIFFxxxx"):
        assert probe_container(junk)["format"] in ("unknown", "wav", "jpeg")


def test_probe_media_distributed(spark):
    from flink_cdc_2_3_0_src_spark.operators.multimodal import probe_media

    assets = spark.createDataFrame(
        [
            (1, "image", _png(64, 32)),
            (2, "image", _jpeg(320, 240)),
            (3, "audio", _wav(1, 16000, 16000)),
            (4, "image", b"not media"),
        ],
        "asset_id long, media_type string, content binary",
    )
    got = {r["asset_id"]: r.asDict() for r in probe_media(assets).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 64, 32)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 320, 240)
    assert (
        got[3]["format"], got[3]["n_channels"], got[3]["sample_rate"], got[3]["n_samples"]
    ) == ("wav", 1, 16000, 16000)
    assert got[4]["format"] == "unknown"
    plan = probe_media(assets)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_probe_container_hostile_and_edge_headers():
    """Second-review regressions: hostile 32-bit-overflow dimensions
    degrade to NULL (never a task-killing Int32 cast), fill-padded
    JPEG markers still parse, sub-byte-depth WAV keeps channels/rate
    with NULL n_samples."""
    from flink_cdc_2_3_0_src_spark.operators.multimodal import probe_container

    hostile_png = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + b"\xff\xff\xff\xff" + (480).to_bytes(4, "big") + b"\x08\x02" + b"\x00" * 7
    )
    r = probe_container(hostile_png)
    assert (r["format"], r["width"], r["height"]) == ("png", None, 480)

    padded_jpeg = (
        b"\xff\xd8" + b"\xff\xff\xff\xc0" + (17).to_bytes(2, "big")
        + b"\x08" + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + b"\x03" + b"\x00" * 10
    )
    r = probe_container(padded_jpeg)
    assert (r["format"], r["width"], r["height"]) == ("jpeg", 640, 480)

    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (2).to_bytes(2, "little")
        + (1).to_bytes(2, "little") + (8000).to_bytes(4, "little")
        + (4000).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (4).to_bytes(2, "little")  # 4-bit ADPCM
    )
    wav = (
        b"RIFF" + (136).to_bytes(4, "little") + b"WAVE" + fmt
        + b"data" + (100).to_bytes(4, "little") + b"\x00" * 100
    )
    r = probe_container(wav)
    assert (r["format"], r["n_channels"], r["sample_rate"], r["n_samples"]) == (
        "wav", 1, 8000, None,
    )


def test_probe_media_handles_hostile_rows(spark):
    """The distributed path survives hostile headers in the batch."""
    from flink_cdc_2_3_0_src_spark.operators.multimodal import probe_media

    hostile = (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + b"\xff\xff\xff\xff" + b"\xff\xff\xff\xff" + b"\x08\x02" + b"\x00" * 7
    )
    assets = spark.createDataFrame(
        [(1, "image", hostile), (2, "image", _png(8, 8))],
        "asset_id long, media_type string, content binary",
    )
    got = {r["asset_id"]: r for r in probe_media(assets).collect()}
    assert got[1]["width"] is None and got[1]["format"] == "png"
    assert (got[2]["width"], got[2]["height"]) == (8, 8)
