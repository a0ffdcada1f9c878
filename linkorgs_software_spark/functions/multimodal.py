"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are opaque ``binary`` columns with a metadata
struct; decode/resize/frame-sample run as Arrow-batched ``mapInPandas``
stages. Decoding is feature-gated: real PIL / soundfile featurizers wire in
automatically when those libraries are importable (``_autodetect_decoders``),
and ``register_decoder`` plugs any custom kernel; environments without codec
libraries (this sandbox) fall back to a deterministic content-sensitive fake
with the same shape contract, so the Spark-side plumbing — schema, batch
shape, partitioning — is identical and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),     # image | audio | video
        T.StructField("payload", T.BinaryType()),  # opaque encoded bytes
        T.StructField("meta", T.StructType([
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer.

    Real implementation would decode with PIL/ffmpeg (absent here) — the
    fake hashes payload bytes into a fixed-dim histogram so tests have a
    stable, content-sensitive vector with the same shape contract.
    """
    v = np.zeros(dim, dtype=np.float64)
    if payload:
        arr = np.frombuffer(payload, dtype=np.uint8)
        np.add.at(v, arr % dim, 1.0)
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
    return v.astype(np.float32)


# ---------------------------------------------------------------------------
# Decoder registry: real codecs when importable, deterministic fake otherwise.
# ---------------------------------------------------------------------------

_DECODERS: dict[str, object] = {}


def register_decoder(kind: str, fn) -> None:
    """Plug a real ``payload: bytes -> np.ndarray[FEATURE_DIM]`` featurizer
    for a media kind; overrides the deterministic fallback for that kind."""
    _DECODERS[kind] = fn


def _pil_image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real image path (used iff PIL importable): decode → grayscale
    luminance histogram, L2-normalized to the same feature contract."""
    import io

    from PIL import Image  # gated import — see _autodetect_decoders

    img = Image.open(io.BytesIO(payload)).convert("L").resize((32, 32))
    arr = np.asarray(img, dtype=np.float64).ravel()
    hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _soundfile_audio_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real audio path (used iff soundfile importable): decode → per-segment
    RMS energy over ``dim`` equal time slices, L2-normalized."""
    import io

    import soundfile as sf  # gated import — see _autodetect_decoders

    data, _sr = sf.read(io.BytesIO(payload))
    if data.ndim > 1:
        data = data.mean(axis=1)
    segs = np.array_split(data.astype(np.float64), dim)
    v = np.array([np.sqrt(np.mean(s**2)) if len(s) else 0.0 for s in segs])
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _wave_audio_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real audio path with ZERO dependencies: stdlib ``wave`` parses
    RIFF/WAV PCM, then per-segment RMS energy over ``dim`` equal time slices,
    L2-normalized — the same feature contract as the soundfile path. Non-WAV
    payloads raise and fall back upstream in ``decode_features``."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        data = data.reshape(-1, nch).mean(axis=1)
    segs = np.array_split(data, dim)
    v = np.array([np.sqrt(np.mean(s**2)) if len(s) else 0.0 for s in segs])
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _bmp_image_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real image path with ZERO dependencies: parse uncompressed 24/32-bit
    BMP (the format is a fixed little-endian header + padded BGR rows — no
    codec needed), then an L2-normalized luminance histogram, the same
    feature contract as the PIL path. Non-BMP payloads raise and fall back
    upstream in ``decode_features``."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise ValueError("unsupported BMP variant")
    nch = bpp // 8
    stride = ((w * nch + 3) // 4) * 4
    rows = abs(h)
    px = np.frombuffer(payload, dtype=np.uint8, count=stride * rows, offset=off)
    px = px.reshape(rows, stride)[:, : w * nch].reshape(rows, w, nch)
    lum = 0.114 * px[..., 0] + 0.587 * px[..., 1] + 0.299 * px[..., 2]  # BGR(A)
    hist, _ = np.histogram(lum.ravel(), bins=dim, range=(0, 256))
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _autodetect_decoders() -> None:
    """Wire real decoders for whichever codec libs this environment has.
    Audio and image ALWAYS get a real decoder: soundfile/PIL when
    importable, else the stdlib parsers (``wave`` for RIFF/WAV PCM, a
    header+raster reader for uncompressed BMP) — so a genuine decode byte
    runs even in codec-less environments, with non-matching payloads
    falling back to the deterministic fake per payload. The gate itself is
    also tested through ``register_decoder``."""
    try:
        import PIL.Image  # noqa: F401

        _DECODERS.setdefault("image", _pil_image_features)
    except ImportError:
        _DECODERS.setdefault("image", _bmp_image_features)
    try:
        import soundfile  # noqa: F401

        _DECODERS.setdefault("audio", _soundfile_audio_features)
    except ImportError:
        _DECODERS.setdefault("audio", _wave_audio_features)


_autodetect_decoders()


def decode_features(payload: bytes, kind: str, decoders: dict | None = None) -> np.ndarray:
    """Featurize one payload: the registered real decoder for ``kind`` when
    available, else the deterministic fake (same shape contract)."""
    fn = (_DECODERS if decoders is None else decoders).get(kind)
    if fn is not None:
        try:
            return fn(payload)
        except Exception:
            # undecodable bytes (or synthetic fixtures) fall back rather
            # than failing the whole Arrow batch
            return _fake_decode_features(payload)
    return _fake_decode_features(payload)


def extract_features(media: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas featurization: (media_id, kind, feature, n_bytes).

    Arrow batches stream through Python once; no per-row Python UDF. The
    input should be repartitioned by size (payloads are heavy) — callers at
    scale: ``media.repartition(n, "media_id")`` so batch bytes stay bounded.

    The decoder registry is SNAPSHOT into the closure at plan-build time:
    Python workers re-import this module, so driver-side ``register_decoder``
    calls would otherwise be invisible on executors.
    """
    decoders = dict(_DECODERS)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_features(p if p is not None else b"", k, decoders)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=_FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled timestamp (native expr).

    Decoding the frame itself is the stubbed step; the explode that turns a
    video row into per-frame work units — the part that matters for
    partitioning at scale — is real Catalyst.
    """
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ms", "payload", "meta")
    )


def gen_media_fixture(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        meta = (
            "fake",
            rng.randrange(16, 256) if kind == "image" else 0,
            rng.randrange(16, 256) if kind == "image" else 0,
            rng.randrange(1000, 10000) if kind != "image" else 0,
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
