"""Property-based t-digest compressor tests (hypothesis; pure numpy —
no Spark session needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from check_datapackage_spark.operators.sketch import _compress


@st.composite
def weighted_points(draw):
    n = draw(st.integers(min_value=1, max_value=500))
    means = draw(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
            ),
            min_size=n,
            max_size=n,
        )
    )
    return np.asarray(means, dtype=np.float64)


@given(weighted_points(), st.integers(min_value=8, max_value=200))
@settings(max_examples=60, deadline=None)
def test_compress_invariants(means, delta):
    w = np.ones(len(means))
    m, cw = _compress(means, w, delta)
    # mass is conserved
    assert np.isclose(cw.sum(), w.sum())
    # centroids sorted, inside the data range
    assert np.all(np.diff(m) >= 0)
    assert m.min() >= means.min() - 1e-9
    assert m.max() <= means.max() + 1e-9
    # weighted mean preserved (merging is mean-preserving)
    assert np.isclose((m * cw).sum(), means.sum(), rtol=1e-9, atol=1e-6)


@given(weighted_points())
@settings(max_examples=30, deadline=None)
def test_compress_deterministic(means):
    w = np.ones(len(means))
    a = _compress(means.copy(), w.copy(), 100)
    b = _compress(means.copy(), w.copy(), 100)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


@given(st.integers(min_value=1000, max_value=5000))
@settings(max_examples=10, deadline=None)
def test_median_accuracy_uniform(n):
    rng = np.random.default_rng(n)
    vals = rng.uniform(0, 1, n)
    m, w = _compress(vals, np.ones(n), 200)
    cum = np.cumsum(w) - w / 2
    med = float(np.interp(0.5 * w.sum(), cum, m))
    assert abs(med - np.median(vals)) < 0.02
