"""Multimodal (image/audio/video) column plumbing.

Policy for a 100 TB training-data pipeline: media lives in opaque
``binary`` columns with typed metadata alongside; decode/resize/
frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes move
executor-local in columnar batches (never through the driver, never
row-at-a-time). The image/audio codecs aren't installed in this
container, so the decode kernels are STUBBED behind import guards with
deterministic fakes — the Spark-side plumbing (schema, batch iteration,
partitioning, UDF signatures) is real and tested.

Asset schema convention:
    asset_id   long
    media_type string ('image' | 'audio' | 'video')
    content    binary          -- opaque payload
    meta       struct(...)     -- typed, e.g. width/height/sample_rate
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_hash", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image(content: bytes) -> "object":
    """Decode an image payload. STUB: no codec libs in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image decode requires Pillow; install it on the cluster image. "
            "Tests use extract_features' deterministic byte-level fallback."
        )
    raise NotImplementedError("real decode path not exercised in this environment")


def _byte_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding': mean of each byte stripe. Stands
    in for a real vision/audio encoder with the same shape contract."""
    if not content:
        return [0.0] * dim
    stride = max(1, len(content) // dim)
    out = []
    for i in range(dim):
        chunk = content[i * stride : (i + 1) * stride] or content[-stride:]
        out.append(float(sum(chunk)) / (255.0 * max(1, len(chunk))))
    return out


def _content_hash(content: bytes) -> int:
    acc = 0
    for b in content:
        acc = (acc * 31 + b) % 1_000_000_007
    return acc


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real plumbing: Arrow batches of (asset_id, media_type, content) in,
    typed feature rows out; decode errors isolated per asset. The
    decode step itself falls back to the deterministic byte-level
    feature when codec libraries are absent.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, sizes = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                sizes.append(len(b))
                hashes.append(_content_hash(b))
                try:
                    _decode_image(b)  # real path (unavailable here)
                    feats.append(_byte_feature(b))
                except NotImplementedError:
                    feats.append(_byte_feature(b))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "content_hash": pd.Series(hashes, dtype="int64"),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def sample_frames(
    assets: DataFrame, frame_size: int = 1024, stride: int = 1
) -> DataFrame:
    """Video frame sampling as a 1→N mapInPandas explode.

    The frame DECODE is stubbed (no codecs in this container): a "frame"
    is a fixed-size byte window of the payload, every ``stride``-th one
    kept — a real decoder swaps in behind the same batch iteration,
    output schema, and executor-local byte movement. ``frame_hash`` is
    the shared cross-engine polynomial hash of the frame bytes so tests
    and the DuckDB oracle can verify content, not just counts.
    """
    from flink_cdc_2_3_0_src_spark.functions.hashing import _py_poly_hash

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, hashes = [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                n_frames = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, n_frames, stride):
                    fb = b[fi * frame_size : (fi + 1) * frame_size]
                    ids.append(asset_id)
                    idxs.append(fi)
                    sizes.append(len(fb))
                    hashes.append(_py_poly_hash(fb.decode("latin-1")))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return assets.mapInPandas(run, FRAME_SCHEMA)


def resize_media(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize plumbing: mapInPandas in, (content, meta) out.

    Decode/resample is stubbed (import-guarded like _decode_image): the
    fake 'resized' payload is a deterministic width*height byte
    downsample of the input, so the stage is testable end-to-end; a real
    Pillow/ffmpeg kernel replaces only the inner function on a cluster
    image that has codecs.
    """

    def _fake_resize(b: bytes) -> bytes:
        target = width * height
        if not b:
            return b"\x00" * target
        stride = max(1, len(b) // target)
        out = bytes(b[min(i * stride, len(b) - 1)] for i in range(target))
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                try:
                    _decode_image(b)
                except NotImplementedError:
                    pass
                contents.append(_fake_resize(b))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "content": contents,
                    "meta": [
                        {"width": width, "height": height} for _ in contents
                    ],
                }
            )

    return assets.mapInPandas(run, RESIZED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)

AUDIO_SAMPLE_RATE = 8000


def _decode_audio(content: bytes):
    """Decode an audio payload → (float samples in [-1, 1], sample_rate).

    Real branch: ``soundfile`` (libsndfile) when the cluster image ships
    it — parses WAV/FLAC/OGG containers.  Raises NotImplementedError when
    the lib is absent (this container) and ValueError when the payload
    isn't a parseable audio container; callers fall back to the
    deterministic unsigned-8-bit-PCM interpretation in both cases."""
    try:
        import soundfile
    except ImportError:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg on the cluster image; "
            "the fallback interprets the payload as unsigned 8-bit PCM."
        )
    import io

    try:
        samples, rate = soundfile.read(io.BytesIO(content), dtype="float64")
    except Exception as e:  # not a valid container — caller falls back
        raise ValueError(f"unparseable audio payload: {e}") from e
    if samples.ndim > 1:  # downmix channels
        samples = samples.mean(axis=1)
    return samples, int(rate)


def audio_features(assets: DataFrame) -> DataFrame:
    """Loudness/duration features per audio asset — the silence/clipping
    screen an audio training pipeline runs before transcription.

    Decode: real soundfile branch when the cluster image ships libsndfile
    (float samples at the container's true rate); otherwise — lib absent
    or payload unparseable — the deterministic fallback treats the
    payload as unsigned 8-bit PCM at 8 kHz with exact integer sample
    math, so the DuckDB oracle bit-matches the rounded doubles.

    Scale: mapInPandas, numpy-vectorized per Arrow batch, bytes stay
    executor-local; output is 5 scalars per asset (narrow).
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, durs, rmss, peaks = [], [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                # 6dp quantization via floor(x*1e6 + 0.5): Python round()
                # is half-even, DuckDB round() half-away — this identical
                # floor formula is the only tie-safe cross-engine choice
                q6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
                try:
                    fsamples, rate = _decode_audio(b)
                except (NotImplementedError, ValueError):
                    fsamples, rate = None, AUDIO_SAMPLE_RATE
                if fsamples is not None:
                    # real codec path: float samples already in [-1, 1]
                    n = int(fsamples.shape[0])
                    dur = n / rate
                    rms = float(np.sqrt((fsamples * fsamples).sum() / max(n, 1)))
                    peak = float(np.abs(fsamples).max()) if n else 0.0
                else:
                    # deterministic fallback: unsigned 8-bit PCM @ 8 kHz;
                    # exact integer sample math so DuckDB bit-matches
                    s = np.frombuffer(b, dtype=np.uint8).astype(np.int64) - 128
                    n = int(s.shape[0])
                    sum_sq = int((s * s).sum())
                    dur = n / AUDIO_SAMPLE_RATE
                    rms = (sum_sq / (max(n, 1) * 16384.0)) ** 0.5
                    peak = (int(np.abs(s).max()) if n else 0) / 128.0
                ids.append(asset_id)
                ns.append(n)
                durs.append(q6(dur))
                rmss.append(q6(rms))
                peaks.append(q6(peak))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                    "peak": pd.Series(peaks, dtype="float64"),
                }
            )

    return assets.mapInPandas(run, AUDIO_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Test adapter: document text bytes as opaque media payloads."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


# ---------------------------------------------------------------------------
# Container probing (r5) — REAL, dependency-free header parsing.
# ---------------------------------------------------------------------------
# The first stage of every real multimodal pipeline is an ffprobe-style
# metadata pass: format, dimensions, channels, sample rate — none of
# which needs a codec.  PNG/GIF/BMP/WAV carry them at fixed offsets and
# JPEG in its SOF marker, so this path is NOT a stub: it parses genuine
# container bytes and is tested against genuine headers.

_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


_MAX_I32 = 2**31 - 1


def _i32_or_none(v):
    """Hostile/corrupt headers can encode values past int32 (a PNG
    width of 0xFFFFFFFF) — surfacing them would blow up the Int32
    output arrays and kill the task; a dimension that big is corrupt by
    definition, so it degrades to NULL."""
    return int(v) if v is not None and 0 <= int(v) <= _MAX_I32 else None


def probe_container(content: bytes) -> dict:
    """Parse a media container header: ``{format, width, height,
    n_channels, sample_rate, n_samples}`` (irrelevant fields None;
    ``format`` 'unknown' when no signature matches; malformed payloads
    of a recognized signature degrade to NULL fields or 'unknown'
    rather than raising — a 100 TB scan must not die on one truncated
    or hostile file)."""
    out = {
        "format": "unknown",
        "width": None,
        "height": None,
        "n_channels": None,
        "sample_rate": None,
        "n_samples": None,
    }
    b = bytes(content or b"")
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            out.update(
                format="png",
                width=_i32_or_none(int.from_bytes(b[16:20], "big")),
                height=_i32_or_none(int.from_bytes(b[20:24], "big")),
            )
        elif b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                # spec-legal fill padding: any run of 0xFF precedes the
                # marker byte — skip to the last 0xFF of the run
                while i + 1 < len(b) and b[i + 1] == 0xFF:
                    i += 1
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in _JPEG_SOF and i + 9 <= len(b):
                    out.update(
                        format="jpeg",
                        height=_i32_or_none(int.from_bytes(b[i + 5 : i + 7], "big")),
                        width=_i32_or_none(int.from_bytes(b[i + 7 : i + 9], "big")),
                    )
                    break
                i += 2 + seg_len
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            out.update(
                format="gif",
                width=_i32_or_none(int.from_bytes(b[6:8], "little")),
                height=_i32_or_none(int.from_bytes(b[8:10], "little")),
            )
        elif b[:2] == b"BM" and len(b) >= 26:
            out.update(
                format="bmp",
                width=_i32_or_none(int.from_bytes(b[18:22], "little")),
                height=_i32_or_none(
                    abs(int.from_bytes(b[22:26], "little", signed=True))
                ),
            )
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out["format"] = "wav"
            i = 12
            n_channels = sample_rate = bits = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    n_channels = int.from_bytes(b[i + 10 : i + 12], "little")
                    sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    bits = int.from_bytes(b[i + 22 : i + 24], "little")
                elif cid == b"data" and n_channels and bits and bits >= 8:
                    # sub-byte bit depths (4-bit ADPCM) have no integral
                    # frame size — n_samples stays NULL, the already-
                    # parsed channels/rate survive
                    out["n_samples"] = clen // (n_channels * (bits // 8))
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            out["n_channels"] = _i32_or_none(n_channels)
            out["sample_rate"] = _i32_or_none(sample_rate)
    except IndexError:
        # truncated header mid-parse: keep whatever was parsed before
        # the cut (fields are only assigned once complete)
        pass
    return out


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def probe_media(assets: DataFrame) -> DataFrame:
    """ffprobe-style metadata pass over an asset table — Arrow-batched
    ``mapInPandas``, bytes stay executor-local."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [probe_container(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "format": [r["format"] for r in rows],
                    "width": pd.array(
                        [r["width"] for r in rows], dtype="Int32"
                    ),
                    "height": pd.array(
                        [r["height"] for r in rows], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [r["n_channels"] for r in rows], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [r["sample_rate"] for r in rows], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [r["n_samples"] for r in rows], dtype="Int64"
                    ),
                }
            )

    return assets.select("asset_id", "media_type", "content").mapInPandas(
        run, PROBE_SCHEMA
    )
