"""Embedding kernel + vector-distance expressions.

The reference's ML path embeds each name with a JAX transformer
(``LinkOrgs/R/LinkOrgs_LinkOrgs.R:303-319``) then matches by Euclidean
distance (``LinkOrgs/R/LinkOrgs_PFuzzyEuclideanInternal.R:133-163``, exact
``dist()`` semantics validated by ``test-distance-calculation.R:38-62``).
No external model artifacts are allowed here, so a deterministic hashed
character-n-gram kernel stands in (same role: dense float vector per name;
similar names → nearby vectors). It mirrors the offline-mock pattern the
reference itself uses in tests (``test-ml-offline.R:20-29``).

Distances: L2 as a vectorized pandas UDF (numpy over stacked Arrow batches,
float64 — we deliberately do NOT copy the reference's float16 JAX downcast,
SURVEY.md §1.2), cosine as a pure Catalyst expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, FloatType

DEFAULT_DIM = 64


def make_hash_embed_udf(dim: int = DEFAULT_DIM, ngram: int = 3, seed: int = 42):
    """Deterministic hashed char-n-gram embedding, Arrow-batched.

    Each n-gram of the (already normalized) name hashes to a bucket and a
    sign; the vector is the L2-normalized signed bucket-count histogram
    (the classic "hashing trick"). Pure numpy inside the batch.
    """

    @pandas_udf(ArrayType(FloatType()))
    def embed(names: pd.Series) -> pd.Series:
        out = []
        mask = 0xFFFFFFFFFFFFFFFF
        mul = 0x9E3779B97F4A7C15
        for s in names.fillna(""):
            v = np.zeros(dim, dtype=np.float64)
            n = len(s)
            if n == 0:
                out.append(v.astype(np.float32))
                continue
            grams = [s[i : i + ngram] for i in range(max(n - ngram + 1, 1))]
            for g in grams:
                h = seed
                for ch in g:
                    h = ((h ^ ord(ch)) * mul) & mask
                bucket = h % dim
                sign = 1.0 if (h >> 63) else -1.0
                v[bucket] += sign
            norm = np.linalg.norm(v)
            if norm > 0:
                v /= norm
            out.append(v.astype(np.float32))
        return pd.Series(out)

    return embed


@pandas_udf(DoubleType())
def l2_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Euclidean distance between paired ``array<float>`` columns.

    Stacks each Arrow batch into a 2-D float64 ndarray → one vectorized
    ``norm(A-B, axis=1)`` per batch (no per-row Python arithmetic).
    """
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    return pd.Series(np.linalg.norm(A - B, axis=1))


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Native dot product over two array<float/double> columns."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_sim_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity, pure Catalyst (zip_with + aggregate)."""
    d = dot_expr(a, b)
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def l2_dist_expr(a: Column | str, b: Column | str) -> Column:
    """Native L2 distance (for when staying JVM-side beats the UDF)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                ca,
                cb,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
