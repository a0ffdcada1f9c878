"""String-distance scorer registry.

The hot default (q-gram jaccard) is a pure Catalyst expression
(functions/qgrams.py). Measures Spark cannot express natively —
OSA (restricted Damerau-Levenshtein) and Jaro/Jaro-Winkler — run as
Arrow-batched pandas UDFs (never row-at-a-time Python UDFs), mirroring the
reference's vectorized C calls (``stringdist`` invoked at
``LinkOrgs/R/LinkOrgs_PFuzzyDiscreteInternal.R:140-142``). The custom-metric
hook mirrors ``embedDistMetric`` (``LinkOrgs/R/LinkOrgs_LinkOrgs.R:114``):
any ``(pd.Series, pd.Series) -> pd.Series`` can be registered by name.

Distance conventions match R ``stringdist``:
  - ``jaccard``: set q-gram jaccard distance in [0, 1]
  - ``levenshtein`` ("lv"): absolute edit distance (native ``F.levenshtein``)
  - ``osa``: absolute restricted edit distance (adjacent transposition
    counted once, no substring re-use)
  - ``jw``: 1 − Jaro similarity (reference default p=0 ⇒ plain Jaro);
    ``jw_winkler`` applies the p=0.1 prefix bonus.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from .qgrams import jaccard_qgram_dist_expr, qgram_set_expr

# ---------------------------------------------------------------------------
# Pure-python kernels (executed inside Arrow batches — the per-pair loop is
# the unavoidable inner loop of an O(len²) DP; batches amortize transfer).
# ---------------------------------------------------------------------------


def _osa_pair(a: str, b: str) -> float:
    """Optimal String Alignment distance (restricted Damerau-Levenshtein)."""
    if a == b:
        return 0.0
    la, lb = len(a), len(b)
    if la == 0:
        return float(lb)
    if lb == 0:
        return float(la)
    # Three-row DP (current, previous, before-previous for transpositions).
    prev2 = None
    prev = np.arange(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, dtype=np.int64)
        cur[0] = i
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return float(prev[lb])


def _jaro_pair(a: str, b: str) -> float:
    """Jaro *similarity* in [0, 1]."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_match[j] and b[j] == ca:
                a_match[i] = True
                b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    k = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def _jw_pair(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity with prefix scaling ``p``."""
    j = _jaro_pair(a, b)
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


def _vectorize_pair_kernel(fn: Callable[[str, str], float]):
    def batch(a: pd.Series, b: pd.Series) -> pd.Series:
        av = a.fillna("").to_numpy(dtype=object)
        bv = b.fillna("").to_numpy(dtype=object)
        out = np.empty(len(av), dtype=np.float64)
        for k in range(len(av)):
            out[k] = fn(av[k], bv[k])
        return pd.Series(out)

    return batch


@pandas_udf(DoubleType())
def osa_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return _vectorize_pair_kernel(_osa_pair)(a, b)


@pandas_udf(DoubleType())
def jaro_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    kern = _vectorize_pair_kernel(lambda x, y: 1.0 - _jaro_pair(x, y))
    return kern(a, b)


@pandas_udf(DoubleType())
def jw_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    kern = _vectorize_pair_kernel(lambda x, y: 1.0 - _jw_pair(x, y))
    return kern(a, b)


# ---------------------------------------------------------------------------
# Registry: name -> (col_a, col_b, qgram) -> distance Column
# ---------------------------------------------------------------------------


def _jaccard(a: Column, b: Column, q: int) -> Column:
    return jaccard_qgram_dist_expr(
        qgram_set_expr(a, q), qgram_set_expr(b, q)
    )


def _levenshtein(a: Column, b: Column, q: int) -> Column:
    return F.levenshtein(a, b).cast("double")


_SCORERS: dict[str, Callable[[Column, Column, int], Column]] = {
    "jaccard": _jaccard,
    "levenshtein": _levenshtein,
    "osa": lambda a, b, q: osa_dist_udf(a, b),
    "jaro": lambda a, b, q: jaro_dist_udf(a, b),
    "jw": lambda a, b, q: jaro_dist_udf(a, b),  # reference default p=0 => plain Jaro
    "jw_winkler": lambda a, b, q: jw_dist_udf(a, b),
}


def register_scorer(name: str, fn: Callable[[Column, Column, int], Column]) -> None:
    """Custom-metric hook (reference ``embedDistMetric`` param)."""
    _SCORERS[name] = fn


def distance_expr(measure: str, a: Column | str, b: Column | str, *, qgram: int = 2) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    try:
        fn = _SCORERS[measure]
    except KeyError:
        raise ValueError(
            f"unknown distance measure {measure!r}; known: {sorted(_SCORERS)}"
        ) from None
    return fn(ca, cb, qgram)


def available_measures() -> list[str]:
    return sorted(_SCORERS)
