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


def _dib_lum_hist(
    px_bytes: bytes, w: int, rows: int, nch: int, dim: int, offset: int = 0
) -> np.ndarray:
    """Luminance histogram of a raw DIB raster (padded BGR(A) rows) —
    shared by the BMP image path and the AVI per-frame path."""
    stride = ((w * nch + 3) // 4) * 4
    px = np.frombuffer(px_bytes, dtype=np.uint8, count=stride * rows, offset=offset)
    px = px.reshape(rows, stride)[:, : w * nch].reshape(rows, w, nch)
    lum = 0.114 * px[..., 0] + 0.587 * px[..., 1] + 0.299 * px[..., 2]  # BGR(A)
    hist, _ = np.histogram(lum.ravel(), bins=dim, range=(0, 256))
    return hist.astype(np.float64)


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
    v = _dib_lum_hist(payload, w, abs(h), bpp // 8, dim, offset=off)
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


def _parse_avi(payload: bytes):
    """RIFF walk of an AVI container (ZERO dependencies — the same
    little-endian chunk grammar the WAV/BMP parsers use): returns
    ``(width, height, bpp, usec_per_frame, [frame_bytes, ...])`` for an
    UNCOMPRESSED (raw-DIB) video stream. Compressed codecs raise — there is
    no stdlib decoder for them, and the caller falls back per payload."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    info = {"w": None, "h": None, "bpp": None, "comp": None, "usec": 0}
    # Streams are numbered by 'strl' order in hdrl, and movi chunk fccs
    # carry that number as a two-digit prefix ('00db', '01dc', ...). The
    # geometry (strf) and the frame chunks must come from the SAME stream —
    # grabbing the first strf while collecting '##db'/'##dc' from every
    # stream would decode a second stream's frames with the wrong stream's
    # width/height/bpp (frombuffer count mismatches or garbage histograms).
    # So: find the first 'vids' stream via strh, take ITS strf, and keep
    # only frame chunks whose prefix matches its stream index.
    state = {"strl": -1, "vid_strl": None, "in_vid_strl": False}
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            fcc = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            data = pos + 8
            if fcc == b"LIST":
                if payload[data : data + 4] == b"strl":
                    state["strl"] += 1
                    state["in_vid_strl"] = False
                walk(data + 4, min(data + size, end))  # skip the list type fcc
            elif fcc == b"avih":
                info["usec"] = struct.unpack_from("<I", payload, data)[0]
            elif fcc == b"strh":
                if payload[data : data + 4] == b"vids" and state["vid_strl"] is None:
                    state["vid_strl"] = state["strl"]
                    state["in_vid_strl"] = True
            elif fcc == b"strf":
                if state["in_vid_strl"] and info["w"] is None:
                    _, w, h, _, bc, comp = struct.unpack_from("<IiiHHI", payload, data)
                    info.update(w=w, h=h, bpp=bc, comp=comp)
            elif fcc[2:4] in (b"db", b"dc"):
                if (
                    state["vid_strl"] is not None
                    and fcc[:2] == b"%02d" % state["vid_strl"]
                ):
                    frames.append(payload[data : data + size])
            pos = data + size + (size & 1)  # RIFF chunks are word-aligned

    walk(12, len(payload))
    if info["w"] is None or not frames:
        raise ValueError("no video stream in AVI")
    if info["comp"] != 0 or info["bpp"] not in (24, 32):
        raise ValueError("compressed AVI codec: no stdlib decoder")
    return info["w"], abs(info["h"]), info["bpp"], info["usec"], frames


def _avi_video_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real video path with ZERO dependencies: RIFF-walk an uncompressed
    (raw-DIB) AVI, luminance-histogram every frame raster with the SAME
    kernel as the BMP path, average over frames, L2-normalize. Compressed
    codecs raise and fall back upstream per payload (``decode_features``)."""
    w, h, bpp, _usec, frames = _parse_avi(payload)
    acc = np.zeros(dim, dtype=np.float64)
    for fr in frames:
        acc += _dib_lum_hist(fr, w, h, bpp // 8, dim)
    v = acc / len(frames)
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
    # video: the stdlib RIFF walk decodes uncompressed (raw-DIB) AVI — a
    # genuine frame decode runs in codec-less CI; compressed codecs fall
    # back per payload
    _DECODERS.setdefault("video", _avi_video_features)


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

    The explode that turns a video row into per-frame work units — the part
    that matters for partitioning at scale — is real Catalyst; compose with
    ``extract_frame_features`` to decode the sampled frames (genuinely, for
    uncompressed AVI; deterministic fake for other codecs).
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


def extract_frame_features(frames: DataFrame) -> DataFrame:
    """Per-frame featurization of ``frame_sample_plan`` output:
    ``(media_id, frame_ms, feature)`` via one Arrow-batched mapInPandas
    stage.

    For uncompressed AVI payloads this is a GENUINE frame decode: the
    sampled timestamp maps to a frame index through the container's
    microseconds-per-frame, and that frame's raster is luminance-
    histogrammed (the BMP kernel). A payload is parsed ONCE per Arrow batch
    occurrence (memoized within the batch), not once per sampled frame.
    Non-AVI payloads fall back to the deterministic fake, keyed by payload
    + frame_ms so distinct frames still get distinct stable vectors.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed: dict[int, object] = {}
            feats = []
            for mid, ms, p in zip(pdf["media_id"], pdf["frame_ms"], pdf["payload"]):
                payload = p if p is not None else b""
                if mid not in parsed:
                    try:
                        parsed[mid] = _parse_avi(payload)
                    except Exception:
                        parsed[mid] = None
                avi = parsed[mid]
                if avi is None:
                    feats.append(
                        _fake_decode_features(payload + int(ms).to_bytes(8, "little"))
                    )
                    continue
                w, h, bpp, usec, fr = avi
                ms_per_frame = max(usec / 1000.0, 1e-9)
                idx = min(int(ms / ms_per_frame), len(fr) - 1)
                v = _dib_lum_hist(fr[idx], w, h, bpp // 8, FEATURE_DIM)
                n = np.linalg.norm(v)
                feats.append((v / n if n > 0 else v).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "feature": feats,
                }
            )

    return frames.select("media_id", "frame_ms", "payload").mapInPandas(
        _batches, schema="media_id long, frame_ms long, feature array<float>"
    )


def gen_avi_payload(
    w: int = 16, h: int = 8, n_frames: int = 4, fps: int = 10, seed: int = 42
) -> bytes:
    """Deterministic uncompressed (raw-DIB 24-bit) AVI payload for tests —
    a minimal but SPEC-VALID RIFF: hdrl(avih + strl(strh/strf)) + movi with
    one '00db' chunk per frame. Frame f is a flat gray level that steps
    with f (plus a seed offset), so per-frame features are distinguishable."""
    import struct

    nch = 3
    stride = ((w * nch + 3) // 4) * 4
    frame_sz = stride * h

    def chunk(fcc: bytes, data: bytes) -> bytes:
        return fcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) & 1 else b"")

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<14I", usec, frame_sz * fps, 0, 0, n_frames, 0, 1, frame_sz, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, 1, fps, 0,
                                        n_frames, frame_sz, 0, 0, 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_sz, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_frames = b""
    for f in range(n_frames):
        level = (seed * 37 + f * 50) % 256
        row = bytes([level] * (w * nch)) + b"\x00" * (stride - w * nch)
        movi_frames += chunk(b"00db", row * h)
    movi = lst(b"movi", movi_frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


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
