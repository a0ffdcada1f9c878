"""Batch-vectorized scorer kernels must agree exactly with the scalar
reference implementations (property-based cross-check)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from linkorgs_software_spark.functions.scorers import (
    _jaro_batch,
    _jaro_pair,
    _jw_batch,
    _jw_pair,
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


def test_osa_batch_empty_and_edge():
    A = np.array(["", "a", "", "xy"], dtype=object)
    B = np.array(["", "", "b", "yx"], dtype=object)
    assert _osa_batch(A, B).tolist() == [0.0, 1.0, 1.0, 1.0]


def test_jaro_known_constant():
    A = np.array(["martha"], dtype=object)
    B = np.array(["marhta"], dtype=object)
    assert _jaro_batch(A, B)[0] == pytest.approx(0.9444444, abs=1e-6)


def test_long_strings_capped_consistently():
    # kernels cap at 64 chars (like the reference's 100-char trigram cap);
    # equal long strings must still be distance 0 / similarity 1
    s = "abcdefghij" * 20
    A = np.array([s], dtype=object)
    assert _osa_batch(A, A)[0] == 0.0
    assert _jaro_batch(A, A)[0] == 1.0
