"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are opaque ``binary`` columns with a metadata
struct; decode/resize/frame-sample run as Arrow-batched ``mapInPandas``
stages. The codec libraries are not in this container, so the *decode
kernels* are stubbed (deterministic fake or ``NotImplementedError``) while
the Spark-side plumbing — schema, batch shape, partitioning — is real and
tested (driver instructions: stub the decode, make the plumbing real).
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


def decode_real(payload: bytes, kind: str):  # pragma: no cover - scaffold
    """Real decode entry point — requires codec libs not in this container."""
    raise NotImplementedError(
        "media decode requires PIL/soundfile/ffmpeg; wire them in here and "
        "swap _fake_decode_features for the real featurizer"
    )


def extract_features(media: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas featurization: (media_id, kind, feature, n_bytes).

    Arrow batches stream through Python once; no per-row Python UDF. The
    input should be repartitioned by size (payloads are heavy) — callers at
    scale: ``media.repartition(n, "media_id")`` so batch bytes stay bounded.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [ _fake_decode_features(p if p is not None else b"") for p in pdf["payload"] ]
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
