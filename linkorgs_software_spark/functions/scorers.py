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

from .qgrams import jaccard_qgram_dist_expr, qgram_array_expr, qgram_set_expr

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


def _dl_pair(a: str, b: str) -> float:
    """Unrestricted Damerau-Levenshtein (Lowrance-Wagner), scalar reference."""
    la, lb = len(a), len(b)
    if la == 0:
        return float(lb)
    if lb == 0:
        return float(la)
    inf = la + lb + 1
    H = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        H[i + 1][1] = i
    for j in range(lb + 1):
        H[1][j + 1] = j
    da: dict[str, int] = {}
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            H[i + 1][j + 1] = min(
                H[i][j] + cost,
                H[i + 1][j] + 1,
                H[i][j + 1] + 1,
                H[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return float(H[la + 1][lb + 1])


def _lcs_pair(a: str, b: str) -> float:
    """LCS edit distance (insert/delete only), scalar reference."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = min(prev[j - 1], prev[j] + 1, cur[j - 1] + 1)
            else:
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1)
        prev = cur
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


# ---------------------------------------------------------------------------
# Batch-vectorized kernels: the DP/match loops run over *cell indices*
# (len_a x len_b python iterations) while every operation inside is a numpy
# op over the whole Arrow batch — per-pair cost amortizes to a few
# microseconds instead of the ~1ms of a per-pair python DP. The scalar
# kernels above stay as the readable reference implementation; tests assert
# batch == scalar.
# ---------------------------------------------------------------------------

_MAX_KERNEL_CHARS = 100  # DP cost is O(LaxLb); same 100-char convention as the
                         # reference's trigram windows (BuildHelpers.R:194).
                         # Strings are truncated at the cap before the DP —
                         # asserted by a >cap divergence test.


def _code_matrix(strs: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """(N, L) int32 char-code matrix (0-padded) + (N,) lengths.

    Built through numpy's fixed-width UCS4 representation (``U<cap>``
    astype + uint32 view) instead of a per-row Python encode loop — one
    C-level pass, measured 3.4x faster, and identical codes (numpy U
    dtype IS utf-32 codepoints; the astype truncates at ``cap`` exactly
    like the old per-row slice)."""
    n = len(strs)
    if n == 0:
        return np.zeros((0, 1), dtype=np.int32), np.zeros(0, dtype=np.int64)
    su = np.asarray(strs, dtype=object).astype(f"U{cap}")
    lens = np.char.str_len(su).astype(np.int64)
    L = int(lens.max())
    wide = su.view(np.uint32).reshape(n, cap)
    M = wide[:, : max(L, 1)].astype(np.int32)
    return M, lens


_KERNEL_CHUNK_ROWS = 2048  # DP kernels run chunked: small (chunk, L) matrices
                           # stay cache-resident — measured 3.8x on OSA vs
                           # whole-Arrow-batch matrices (146k -> 560k pairs/s)


def _chunked(kernel):
    def run(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
        out = np.empty(len(a_strs), dtype=np.float64)
        for lo in range(0, len(a_strs), _KERNEL_CHUNK_ROWS):
            sl = slice(lo, min(lo + _KERNEL_CHUNK_ROWS, len(a_strs)))
            out[sl] = kernel(a_strs[sl], b_strs[sl])
        return out

    return run


def _osa_chunk(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
    """Batched OSA in TRANSPOSED layout: DP rows are stored ``(L+1, N)`` so
    every inner-loop operand (``prev[j]``, ``cost[j-1]``, …) is one
    CONTIGUOUS (N,)-row — the previous ``(N, L+1)`` orientation made each
    of them a strided column gather, which is what dominated the kernel
    (round-7 measurement: 67k → 148k pairs/s/core on TPC-H names, 3.8x on
    100-char strings; int32 buffers halve the memory traffic). All terms
    except the left-neighbor ``cur[j-1] + 1`` hoist out of the inner loop
    as whole-(Lb, N) vector ops: per j only one ``minimum`` against the
    running row remains."""
    N = len(a_strs)
    A, la = _code_matrix(a_strs, _MAX_KERNEL_CHARS)
    B, lb = _code_matrix(b_strs, _MAX_KERNEL_CHARS)
    La, Lb = A.shape[1], B.shape[1]
    AT = np.ascontiguousarray(A.T)  # (La, N)
    BT = np.ascontiguousarray(B.T)  # (Lb, N)
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32)[:, None], (1, N))
    prev2 = np.zeros_like(prev)
    out_rows = prev.copy()  # rows with la == 0
    for i in range(1, La + 1):
        ai = AT[i - 1]
        cost = (ai != BT).astype(np.int32)  # (Lb, N)
        # everything except the horizontal move, vectorized over j
        base = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        if i > 1 and Lb > 1:
            trans = (ai == BT[:-1]) & (AT[i - 2] == BT[1:])
            base[1:] = np.where(trans, np.minimum(base[1:], prev2[:-2] + 1), base[1:])
        cur = np.empty_like(prev)
        cur[0] = i
        c = np.full(N, i, dtype=np.int32)
        for j in range(1, Lb + 1):
            c = np.minimum(base[j - 1], c + 1)
            cur[j] = c
        done = la == i
        if done.any():
            out_rows[:, done] = cur[:, done]
        prev2, prev = prev, cur
    return out_rows[lb, np.arange(N)].astype(np.float64)


def _jaro_chunk(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
    A, la = _code_matrix(a_strs, _MAX_KERNEL_CHARS)
    B, lb = _code_matrix(b_strs, _MAX_KERNEL_CHARS)
    return _jaro_from_codes(A, la, B, lb)


def _jaro_from_codes(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    N = len(la)
    La, Lb = A.shape[1], B.shape[1]
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    # transposed layout (see _osa_chunk): per-(i, j) operands are
    # contiguous (N,)-rows, and the per-i window/equality masks hoist out
    # of the inner loop as one (Lb, N) vector op each
    AT = np.ascontiguousarray(A.T)
    BT = np.ascontiguousarray(B.T)
    jidx = np.arange(Lb, dtype=np.int64)[:, None]
    a_matchT = np.zeros((La, N), dtype=bool)
    b_matchT = np.zeros((Lb, N), dtype=bool)
    wmax = int(window.max()) if N else 0
    for i in range(La):
        inrange = i < la
        found = ~inrange  # rows where position i is out of range: "found"
        lo = np.maximum(0, i - window)
        hi = np.minimum(lb, i + window + 1)
        elig = (BT == AT[i]) & (jidx >= lo) & (jidx < hi)
        for j in range(max(0, i - wmax), min(Lb, i + wmax + 1)):
            cand = elig[j] & ~b_matchT[j] & ~found
            b_matchT[j] |= cand
            found |= cand
        a_matchT[i] = found & inrange
    a_match = np.ascontiguousarray(a_matchT.T)
    b_match = np.ascontiguousarray(b_matchT.T)
    m = a_match.sum(axis=1).astype(np.float64)
    # ordered matched chars via stable sort putting matched positions first
    ia = np.argsort(~a_match, axis=1, kind="stable")
    ib = np.argsort(~b_match, axis=1, kind="stable")
    amc = np.take_along_axis(A, ia, axis=1)
    bmc = np.take_along_axis(B, ib, axis=1)
    K = min(La, Lb)
    pos = np.arange(K)[None, :]
    valid = pos < m[:, None]
    t = ((amc[:, :K] != bmc[:, :K]) & valid).sum(axis=1) // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = (m / la + m / lb + (m - t) / m) / 3.0
    sim = np.where(m == 0, 0.0, sim)
    both_empty = (la == 0) & (lb == 0)
    return np.where(both_empty, 1.0, sim)


def _jw_chunkable(a_strs, b_strs, p: float = 0.1, max_prefix: int = 4) -> np.ndarray:
    # one code-matrix build feeds BOTH the Jaro core and the prefix bonus
    # (the builder is a per-chunk fixed cost worth paying once, not four
    # times); prefix positions run 0..3 so comparing the full-cap codes
    # under `pos < min(la, lb, 4)` is identical to re-encoding at cap 4
    A, la = _code_matrix(a_strs, _MAX_KERNEL_CHARS)
    B, lb = _code_matrix(b_strs, _MAX_KERNEL_CHARS)
    j = _jaro_from_codes(A, la, B, lb)
    K = min(A.shape[1], B.shape[1], max_prefix)
    eq = A[:, :K] == B[:, :K]
    pos_valid = (np.arange(K)[None, :] < la[:, None]) & (np.arange(K)[None, :] < lb[:, None])
    eq = eq & pos_valid
    prefix = (np.cumprod(eq, axis=1) if K else np.zeros((len(la), 0))).sum(axis=1)
    return j + prefix * p * (1.0 - j)


def _lcs_chunk(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
    """LCS edit distance (insert/delete only): la + lb − 2·|LCS|.

    Matches R ``stringdist(method='lcs')``. Same three-row batched DP shape
    as the OSA kernel without substitution/transposition moves.
    """
    N = len(a_strs)
    A, la = _code_matrix(a_strs, _MAX_KERNEL_CHARS)
    B, lb = _code_matrix(b_strs, _MAX_KERNEL_CHARS)
    La, Lb = A.shape[1], B.shape[1]
    AT = np.ascontiguousarray(A.T)  # transposed layout — see _osa_chunk
    BT = np.ascontiguousarray(B.T)
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32)[:, None], (1, N))
    out_rows = prev.copy()  # rows with la == 0
    for i in range(1, La + 1):
        eq = AT[i - 1] == BT  # (Lb, N)
        base = np.where(eq, np.minimum(prev[:-1], prev[1:] + 1), prev[1:] + 1)
        cur = np.empty_like(prev)
        cur[0] = i
        c = np.full(N, i, dtype=np.int32)
        for j in range(1, Lb + 1):
            c = np.minimum(base[j - 1], c + 1)
            cur[j] = c
        done = la == i
        if done.any():
            out_rows[:, done] = cur[:, done]
        prev = cur
    return out_rows[lb, np.arange(N)].astype(np.float64)


def _dl_chunk(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
    N = len(a_strs)
    A, la = _code_matrix(a_strs, _MAX_KERNEL_CHARS)
    B, lb = _code_matrix(b_strs, _MAX_KERNEL_CHARS)
    La, Lb = A.shape[1], B.shape[1]
    # compact per-batch alphabet so `da` (last-occurrence row per char) is small
    alphabet, inv = np.unique(np.concatenate([A.ravel(), B.ravel()]), return_inverse=True)
    nA = np.ascontiguousarray(inv[: A.size].reshape(A.shape).T)  # (La, N)
    nB = np.ascontiguousarray(inv[A.size :].reshape(B.shape).T)  # (Lb, N)
    K = len(alphabet)
    INF = La + Lb + 1
    # transposed layout (see _osa_chunk): H[i, j] is a contiguous (N,) row
    H = np.full((La + 2, Lb + 2, N), INF, dtype=np.int32)
    H[1, 1:] = np.arange(Lb + 1, dtype=np.int32)[:, None]
    H[1:, 1] = np.arange(La + 1, dtype=np.int32)[:, None]
    da = np.zeros((N, K), dtype=np.int32)
    rows = np.arange(N)
    for i in range(1, La + 1):
        db = np.zeros(N, dtype=np.int32)
        ai = nA[i - 1]
        eqmask = (ai == nB) & (i <= la) & (np.arange(1, Lb + 1)[:, None] <= lb)
        for j in range(1, Lb + 1):
            bj = nB[j - 1]
            k = da[rows, bj]
            l = db
            eq = eqmask[j - 1]
            cost = np.where(eq, 0, 1).astype(np.int32)
            db = np.where(eq, j, db)
            trans = H[k, l, rows] + (i - k - 1) + 1 + (j - l - 1)
            d = np.minimum(
                np.minimum(H[i, j] + cost, H[i + 1, j] + 1),
                np.minimum(H[i, j + 1] + 1, trans),
            )
            H[i + 1, j + 1] = d
        da[rows, ai] = i
    return H[la + 1, lb + 1, rows].astype(np.float64)


_osa_batch = _chunked(_osa_chunk)
_lcs_batch = _chunked(_lcs_chunk)
_dl_batch = _chunked(_dl_chunk)
_jaro_batch = _chunked(_jaro_chunk)
_jw_batch = _chunked(_jw_chunkable)


def _as_str_array(s: pd.Series) -> np.ndarray:
    return s.fillna("").to_numpy(dtype=object)


@pandas_udf(DoubleType())
def osa_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_osa_batch(_as_str_array(a), _as_str_array(b)))


@pandas_udf(DoubleType())
def dl_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_dl_batch(_as_str_array(a), _as_str_array(b)))


@pandas_udf(DoubleType())
def lcs_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_lcs_batch(_as_str_array(a), _as_str_array(b)))


@pandas_udf(DoubleType())
def jaro_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(1.0 - _jaro_batch(_as_str_array(a), _as_str_array(b)))


@pandas_udf(DoubleType())
def jw_dist_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(1.0 - _jw_batch(_as_str_array(a), _as_str_array(b)))


# ---------------------------------------------------------------------------
# q-gram profile kernels (bag L1 / cosine): fully vectorized multiset algebra
# over a whole Arrow chunk — one global np.unique/intersect per chunk instead
# of nested per-pair array scans. The per-pair Catalyst formulation (kept
# below as ``_qgram_bag_expr``/``_qgram_cosine_expr`` for the property tests)
# is O(|shared| x |grams|) per pair inside codegen; the chunk kernel is
# O(total_grams log total_grams) for the whole batch.
# ---------------------------------------------------------------------------


def _flat_gram_keys(strs: np.ndarray, q: int):
    """(row_ids, gram_keys) for every length-q window of every string.

    Codepoints pack at 21 bits each (full Unicode range), so packing is
    collision-free for q <= 3 inside int64; wider q falls back to substring
    objects — ``np.unique`` handles object arrays, just slower.
    """
    rows, keys = [], []
    pack = 21 * q <= 63
    for i, s in enumerate(strs):
        n = len(s)
        if n < q:
            continue
        m = n - q + 1
        if pack:
            c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
            g = np.zeros(m, dtype=np.int64)
            for t in range(q):
                g = (g << 21) | c[t : m + t]
        else:
            g = np.array([s[t : t + q] for t in range(m)], dtype=object)
        keys.append(g)
        rows.append(np.full(m, i, dtype=np.int64))
    if not rows:
        empty_keys = np.empty(0, dtype=np.int64 if pack else object)
        return np.empty(0, dtype=np.int64), empty_keys
    return np.concatenate(rows), np.concatenate(keys)


def _qgram_profiles(a_strs: np.ndarray, b_strs: np.ndarray, q: int):
    """Per-row multiset stats of the two q-gram profiles, one pass per chunk.

    Returns (len_a, len_b, common_min, dot, sq_a, sq_b) — everything the bag
    L1 and the cosine distance need — as float64 arrays of length N.
    """
    N = len(a_strs)
    rows_a, keys_a = _flat_gram_keys(a_strs, q)
    rows_b, keys_b = _flat_gram_keys(b_strs, q)
    len_a = np.bincount(rows_a, minlength=N).astype(np.float64)
    len_b = np.bincount(rows_b, minlength=N).astype(np.float64)
    # dense gram ids across both sides -> (row, gram) composite int64 keys
    all_keys = np.concatenate([keys_a, keys_b])
    if len(all_keys) == 0:
        z = np.zeros(N, dtype=np.float64)
        return len_a, len_b, z, z.copy(), z.copy(), z.copy()
    _, inv = np.unique(all_keys, return_inverse=True)
    n_dense = int(inv.max()) + 1 if len(inv) else 1
    comp_a = rows_a * n_dense + inv[: len(keys_a)]
    comp_b = rows_b * n_dense + inv[len(keys_a) :]
    ka, ca = np.unique(comp_a, return_counts=True)
    kb, cb = np.unique(comp_b, return_counts=True)
    shared, ia, ib = np.intersect1d(ka, kb, assume_unique=True, return_indices=True)
    srow = (shared // n_dense).astype(np.int64)
    common = np.bincount(
        srow, weights=np.minimum(ca[ia], cb[ib]), minlength=N
    ).astype(np.float64)
    dot = np.bincount(
        srow, weights=ca[ia].astype(np.float64) * cb[ib], minlength=N
    ).astype(np.float64)
    sq_a = np.bincount(
        (ka // n_dense).astype(np.int64),
        weights=ca.astype(np.float64) ** 2,
        minlength=N,
    ).astype(np.float64)
    sq_b = np.bincount(
        (kb // n_dense).astype(np.int64),
        weights=cb.astype(np.float64) ** 2,
        minlength=N,
    ).astype(np.float64)
    return len_a, len_b, common, dot, sq_a, sq_b


def _make_qgram_chunk(q: int, mode: str):
    def chunk(a_strs: np.ndarray, b_strs: np.ndarray) -> np.ndarray:
        len_a, len_b, common, dot, sq_a, sq_b = _qgram_profiles(a_strs, b_strs, q)
        if mode == "bag":
            return len_a + len_b - 2.0 * common
        na, nb = np.sqrt(sq_a), np.sqrt(sq_b)
        both_empty = (na == 0) & (nb == 0)
        one_empty = (na == 0) ^ (nb == 0)
        denom = np.where((na == 0) | (nb == 0), 1.0, na * nb)
        out = 1.0 - dot / denom
        out[one_empty] = 1.0
        out[both_empty] = 0.0
        return out

    return chunk


_QGRAM_UDFS: dict[tuple[int, str], Callable] = {}


def _qgram_profile_udf(q: int, mode: str):
    """Arrow-batched pandas UDF for the bag/cosine q-gram distance at a
    fixed q (cached per (q, mode) — pandas UDFs close over their params)."""
    key = (q, mode)
    if key not in _QGRAM_UDFS:
        batch = _chunked(_make_qgram_chunk(q, mode))

        @pandas_udf(DoubleType())
        def dist(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series(batch(_as_str_array(a), _as_str_array(b)))

        _QGRAM_UDFS[key] = dist
    return _QGRAM_UDFS[key]


# ---------------------------------------------------------------------------
# Registry: name -> (col_a, col_b, qgram) -> distance Column
# ---------------------------------------------------------------------------


def _jaccard(a: Column, b: Column, q: int) -> Column:
    return jaccard_qgram_dist_expr(
        qgram_set_expr(a, q), qgram_set_expr(b, q)
    )


def _levenshtein(a: Column, b: Column, q: int) -> Column:
    return F.levenshtein(a, b).cast("double")


def _hamming(a: Column, b: Column, q: int) -> Column:
    """R ``stringdist(method='hamming')``: count of differing positions;
    ``Inf`` when lengths differ. Pure Catalyst (split → zip_with → aggregate)."""
    mism = F.aggregate(
        F.zip_with(
            F.split(a, ""), F.split(b, ""),
            lambda x, y: F.when(x != y, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.when(F.length(a) != F.length(b), F.lit(float("inf"))).otherwise(
        mism.cast("double")
    )


def _qgram_bag_expr(a: Column, b: Column, q: int) -> Column:
    """R ``stringdist(method='qgram')``: L1 distance between q-gram *count*
    vectors (bag semantics). Pure-Catalyst reference formulation — the
    registry uses the chunked numpy kernel; this stays as the independent
    implementation the batch==scalar property tests compare against.

    Only the SHARED distinct grams are iterated: non-shared grams contribute
    their full counts, so ``dist = |A| + |B| − 2·Σ_{g∈A∩B} min(cA, cB)`` —
    per-pair cost scales with the overlap, not the union (blocked
    non-matches have small overlap).
    """
    ga = F.filter(qgram_array_expr(a, q), lambda g: F.length(g) == q)
    gb = F.filter(qgram_array_expr(b, q), lambda g: F.length(g) == q)
    cnt = lambda arr, g: F.size(F.filter(arr, lambda x: x == g)).cast("long")  # noqa: E731
    shared = F.array_intersect(F.array_distinct(ga), F.array_distinct(gb))
    common = F.aggregate(
        shared,
        F.lit(0).cast("long"),
        lambda acc, g: acc + F.least(cnt(ga, g), cnt(gb, g)),
    )
    return (F.size(ga) + F.size(gb) - F.lit(2).cast("int") * common).cast("double")


def _qgram_cosine_expr(a: Column, b: Column, q: int) -> Column:
    """R ``stringdist(method='cosine')``: 1 − cosine similarity of q-gram
    count vectors. Both profiles empty ⇒ 0 (identical empties); exactly one
    empty ⇒ 1 (orthogonal), matching stringdist conventions. Pure-Catalyst
    reference formulation kept for the property tests (see ``_qgram_bag_expr``).

    The dot product iterates only the shared distinct grams (non-shared
    grams contribute 0); each norm iterates its own distinct grams.
    """
    ga = F.filter(qgram_array_expr(a, q), lambda g: F.length(g) == q)
    gb = F.filter(qgram_array_expr(b, q), lambda g: F.length(g) == q)
    cnt = lambda arr, g: F.size(F.filter(arr, lambda x: x == g)).cast("double")  # noqa: E731
    shared = F.array_intersect(F.array_distinct(ga), F.array_distinct(gb))
    dot = F.aggregate(
        shared,
        F.lit(0.0),
        lambda acc, g: acc + cnt(ga, g) * cnt(gb, g),
    )
    sq = lambda arr: F.aggregate(  # noqa: E731
        F.array_distinct(arr), F.lit(0.0), lambda acc, g: acc + cnt(arr, g) * cnt(arr, g)
    )
    na, nb = F.sqrt(sq(ga)), F.sqrt(sq(gb))
    return (
        F.when((na == 0) & (nb == 0), F.lit(0.0))
        .when((na == 0) | (nb == 0), F.lit(1.0))
        .otherwise(F.lit(1.0) - dot / (na * nb))
    )


def _soundex(a: Column, b: Column, q: int) -> Column:
    """R ``stringdist(method='soundex')``: 0 if soundex codes agree else 1.
    Spark has a native ``soundex`` — stays in codegen."""
    return F.when(F.soundex(a) == F.soundex(b), F.lit(0.0)).otherwise(F.lit(1.0))


_SCORERS: dict[str, Callable[[Column, Column, int], Column]] = {
    "jaccard": _jaccard,
    "levenshtein": _levenshtein,
    "lv": _levenshtein,  # stringdist's name for plain Levenshtein
    "osa": lambda a, b, q: osa_dist_udf(a, b),
    "dl": lambda a, b, q: dl_dist_udf(a, b),  # unrestricted Damerau-Levenshtein
    "lcs": lambda a, b, q: lcs_dist_udf(a, b),
    "jaro": lambda a, b, q: jaro_dist_udf(a, b),
    "jw": lambda a, b, q: jaro_dist_udf(a, b),  # reference default p=0 => plain Jaro
    "jw_winkler": lambda a, b, q: jw_dist_udf(a, b),
    "hamming": _hamming,
    "qgram": lambda a, b, q: _qgram_profile_udf(q, "bag")(a, b),
    "cosine": lambda a, b, q: _qgram_profile_udf(q, "cosine")(a, b),
    "soundex": _soundex,
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
