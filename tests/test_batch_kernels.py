"""Batch-vectorized scorer kernels must agree exactly with the scalar
reference implementations (property-based cross-check)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from linkorgs_software_spark.functions.scorers import (
    _dl_batch,
    _dl_pair,
    _jaro_batch,
    _jaro_pair,
    _jw_batch,
    _jw_pair,
    _lcs_batch,
    _lcs_pair,
    _osa_batch,
    _osa_pair,
)

names = st.text(
    alphabet="abcdefghij #0123456789", min_size=0, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=20))
def test_osa_batch_equals_scalar(pairs):
    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _osa_batch(A, B)
    want = [_osa_pair(a, b) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=20))
def test_jaro_batch_equals_scalar(pairs):
    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _jaro_batch(A, B)
    want = [_jaro_pair(a, b) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=20))
def test_jw_batch_equals_scalar(pairs):
    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _jw_batch(A, B)
    want = [_jw_pair(a, b) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=20))
def test_dl_batch_equals_scalar(pairs):
    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _dl_batch(A, B)
    want = [_dl_pair(a, b) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(names, names), min_size=1, max_size=20))
def test_lcs_batch_equals_scalar(pairs):
    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _lcs_batch(A, B)
    want = [_lcs_pair(a, b) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


def test_dl_unrestricted_vs_osa():
    # classic: dl('ca','abc') = 2 (transposed substring edited again);
    # OSA forbids that and gives 3
    A = np.array(["ca"], dtype=object)
    B = np.array(["abc"], dtype=object)
    assert _dl_batch(A, B)[0] == 2.0
    assert _osa_batch(A, B)[0] == 3.0
    assert _dl_pair("ca", "abc") == 2.0


def test_lcs_known_constants():
    # lcs distance = la + lb - 2*|LCS|: kitten/sitting -> 6+7-2*4 = 5
    A = np.array(["kitten", "abc"], dtype=object)
    B = np.array(["sitting", "abd"], dtype=object)
    assert _lcs_batch(A, B).tolist() == [5.0, 2.0]


def test_osa_batch_empty_and_edge():
    A = np.array(["", "a", "", "xy"], dtype=object)
    B = np.array(["", "", "b", "yx"], dtype=object)
    assert _osa_batch(A, B).tolist() == [0.0, 1.0, 1.0, 1.0]


def test_jaro_known_constant():
    A = np.array(["martha"], dtype=object)
    B = np.array(["marhta"], dtype=object)
    assert _jaro_batch(A, B)[0] == pytest.approx(0.9444444, abs=1e-6)


def test_long_strings_capped_consistently():
    # kernels cap at 100 chars (the reference's trigram-window cap);
    # equal long strings must still be distance 0 / similarity 1
    s = "abcdefghij" * 20
    A = np.array([s], dtype=object)
    assert _osa_batch(A, A)[0] == 0.0
    assert _jaro_batch(A, A)[0] == 1.0


def test_divergence_past_64_chars_detected():
    # regression: the cap was 64, silently scoring 0 for strings identical in
    # the first 64 chars; at the 100-char cap a difference at position 70
    # must be seen by every DP kernel
    base = "x" * 70
    a = base + "aaaaa"
    b = base + "bbbbb"
    A = np.array([a], dtype=object)
    B = np.array([b], dtype=object)
    assert _osa_batch(A, B)[0] == 5.0
    assert _dl_batch(A, B)[0] == 5.0
    assert _lcs_batch(A, B)[0] == 10.0
    assert _jaro_batch(A, B)[0] < 1.0


# ---------------------------------------------------------------------------
# q-gram profile kernels (bag L1 / cosine): chunk kernel vs an independent
# Counter-based scalar reference, across q values including the object-key
# fallback (q=4, where 21-bit packing no longer fits int64)
# ---------------------------------------------------------------------------


def _profile(s, q):
    from collections import Counter

    return Counter(s[i : i + q] for i in range(max(len(s) - q + 1, 0)))


def _bag_scalar(a, b, q):
    ca, cb = _profile(a, q), _profile(b, q)
    common = sum(min(ca[g], cb[g]) for g in ca.keys() & cb.keys())
    return float(sum(ca.values()) + sum(cb.values()) - 2 * common)


def _cosine_scalar(a, b, q):
    import math

    ca, cb = _profile(a, q), _profile(b, q)
    na = math.sqrt(sum(v * v for v in ca.values()))
    nb = math.sqrt(sum(v * v for v in cb.values()))
    if na == 0 and nb == 0:
        return 0.0
    if na == 0 or nb == 0:
        return 1.0
    dot = sum(ca[g] * cb[g] for g in ca.keys() & cb.keys())
    return 1.0 - dot / (na * nb)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(names, names), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=4),
)
def test_qgram_bag_chunk_equals_scalar(pairs, q):
    from linkorgs_software_spark.functions.scorers import _make_qgram_chunk

    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _make_qgram_chunk(q, "bag")(A, B)
    want = [_bag_scalar(a, b, q) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.tuples(names, names), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=4),
)
def test_qgram_cosine_chunk_equals_scalar(pairs, q):
    from linkorgs_software_spark.functions.scorers import _make_qgram_chunk

    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = _make_qgram_chunk(q, "cosine")(A, B)
    want = [_cosine_scalar(a, b, q) for a, b in pairs]
    assert got.tolist() == pytest.approx(want)


def test_qgram_chunk_unicode_past_bmp():
    # 21-bit packing must keep astral-plane codepoints collision-free
    from linkorgs_software_spark.functions.scorers import _make_qgram_chunk

    a, b = "a\U0001F600b", "a\U0001F601b"  # differ only in the emoji
    A = np.array([a], dtype=object)
    B = np.array([b], dtype=object)
    assert _make_qgram_chunk(2, "bag")(A, B)[0] == _bag_scalar(a, b, 2)
