"""Banded DTW (operators/dtw.py): batch kernel vs a scalar reference,
metric sanity (zero self-distance, shift elasticity, band monotonicity),
and the Spark pair operator end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chainalytic_framework_spark.operators.dtw import (
    _SENT,
    _dtw_band_many,
    dtw_pairs,
)


def _dtw_ref(a, b, r):
    """Per-pair scalar DP, the textbook formulation."""
    n, m = len(a), len(b)
    INF = int(_SENT)
    prev = [0] + [INF] * m
    for i in range(1, n + 1):
        cur = [INF] * (m + 1)
        for j in range(max(1, i - r), min(m, i + r) + 1):
            c = abs(a[i - 1] - b[j - 1])
            cur[j] = min(INF, c + min(prev[j], prev[j - 1], cur[j - 1]))
        prev = cur
    return prev[m]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=24),
            st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=24),
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 8),
)
def test_kernel_matches_scalar_reference(pairs, r):
    # rectangular batch: pad every series pair to common (n, m) by
    # grouping — here simply run one batch per pair
    for a, b in pairs:
        A = np.array([a], dtype=np.int64)
        B = np.array([b], dtype=np.int64)
        got = _dtw_band_many(A, B, r)[0]
        assert got == _dtw_ref(a, b, r)


def test_kernel_batch_equals_per_pair():
    rng = np.random.default_rng(7)
    A = rng.integers(-1000, 1000, size=(50, 30)).astype(np.int64)
    B = rng.integers(-1000, 1000, size=(50, 30)).astype(np.int64)
    batch = _dtw_band_many(A, B, 5)
    solo = np.array(
        [_dtw_band_many(A[i : i + 1], B[i : i + 1], 5)[0] for i in range(50)]
    )
    assert (batch == solo).all()


def test_metric_sanity():
    a = np.array([[1, 5, 9, 5, 1, 0, 0, 0]], dtype=np.int64)
    assert _dtw_band_many(a, a.copy(), 3)[0] == 0
    # one-bucket phase shift: DTW inside the band absorbs it almost
    # entirely; Euclidean (band=... n/a) would pay the full offset
    b = np.roll(a, 1)
    dtw = _dtw_band_many(a, b, 3)[0]
    eucl = int(np.abs(a - b).sum())
    assert dtw < eucl
    # widening the band never increases the cost
    c = np.array([[9, 1, 4, 4, 8, 2, 7, 3]], dtype=np.int64)
    costs = [int(_dtw_band_many(a, c, r)[0]) for r in (1, 2, 4, 7)]
    assert costs == sorted(costs, reverse=True)


def test_band_radius_validated():
    a = np.zeros((1, 4), dtype=np.int64)
    with pytest.raises(ValueError):
        _dtw_band_many(a, a, 0)


def test_spark_pairs_end_to_end(spark):
    rows = []
    series = {
        "a": [3, 7, 2, 9, 4, 4],
        "b": [3, 7, 2, 9, 4, 5],
        "c": [100, 90, 80, 70, 60, 50],
    }
    for k, vs in series.items():
        for t, v in enumerate(vs):
            rows.append((k, t * 86400, v))
    df = spark.createDataFrame(rows, "key string, t long, v long")
    got = {
        (r.key_a, r.key_b): (r.n_a, r.n_b, r.dtw_cost)
        for r in dtw_pairs(df, "key", "t", "v", band=2).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ka, kb), (na, nb, cost) in got.items():
        assert (na, nb) == (6, 6)
        assert cost == _dtw_ref(series[ka], series[kb], 2)
    # candidate-pair restriction is honored
    cand = spark.createDataFrame([("a", "c")], "key_a string, key_b string")
    only = dtw_pairs(df, "key", "t", "v", band=2, pairs=cand).collect()
    assert [(r.key_a, r.key_b) for r in only] == [("a", "c")]
