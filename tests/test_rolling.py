"""Sliding-window analytics (operators/rolling.py) and snapshot diff
(operators/diff.py): range-vs-rows framing, anomaly exactness and the
excluded-current-row property, and diff classification semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.diff import snapshot_diff
from chainalytic_framework_spark.operators.rolling import (
    rolling_anomaly_flags,
    sliding_range_sum,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, v long")


def test_sliding_range_sum_excludes_gapped_buckets(spark):
    # buckets at t=0,60,120 then a 10-minute gap to t=720: with a 120s
    # trailing range, the post-gap row must see ONLY itself — a ROWS
    # frame would wrongly reach back across the gap.
    df = _series(spark, [("a", 0, 1), ("a", 60, 2), ("a", 120, 4), ("a", 720, 8)])
    out = sliding_range_sum(df, ["k"], "t", 120, ["v"])
    got = {r["t"]: (r["mov_v"], r["mov_n"]) for r in out.collect()}
    assert got[0] == (1, 1)
    assert got[60] == (3, 2)
    assert got[120] == (7, 3)       # 0,60,120 all within [0,120]
    assert got[720] == (8, 1)       # gap: nothing within [600,720] but itself


def test_sliding_range_sum_is_per_key(spark):
    df = _series(spark, [("a", 0, 1), ("b", 0, 100), ("a", 60, 2)])
    out = sliding_range_sum(df, ["k"], "t", 3600, ["v"])
    got = {(r["k"], r["t"]): r["mov_v"] for r in out.collect()}
    assert got[("a", 60)] == 3       # never mixes b's rows
    assert got[("b", 0)] == 100


def test_anomaly_fires_on_spike_only(spark):
    # stable baseline 100±1 then a spike: only the spike flags, and
    # only once it has >= min_window prior rows.
    rows = [("a", i * 60, 100 + (i % 2)) for i in range(6)] + [("a", 360, 500)]
    out = rolling_anomaly_flags(
        _series(spark, rows), ["k"], "t", "v", n_prev=6, min_window=4
    )
    got = {r["t"]: (r["n_win"], r["is_anomaly"]) for r in out.collect()}
    assert got[360] == (6, 1)
    assert all(flag == 0 for t, (_, flag) in got.items() if t != 360)


def test_anomaly_window_excludes_current_row(spark):
    # THE property that makes a z>3 detector live: with the current row
    # included in its own baseline, z² is capped at n−1 (= 6 here) and
    # the spike below could never flag. Verify the flag fires, and that
    # n_win counts PRIOR rows only (first row has 0).
    rows = [("a", i * 60, 100) for i in range(6)] + [("a", 360, 101)]
    out = rolling_anomaly_flags(
        _series(spark, rows), ["k"], "t", "v", n_prev=6, min_window=4
    )
    got = {r["t"]: (r["n_win"], r["is_anomaly"]) for r in out.collect()}
    assert got[0][0] == 0
    # zero prior variance: ANY deviation is infinitely surprising
    assert got[360] == (6, 1)
    # ... but an exactly-equal value is not (LHS = 0 is not > 0)
    rows2 = [("a", i * 60, 100) for i in range(7)]
    out2 = rolling_anomaly_flags(
        _series(spark, rows2), ["k"], "t", "v", n_prev=6, min_window=4
    )
    assert all(r["is_anomaly"] == 0 for r in out2.collect())


def test_anomaly_matches_float_zscore_oracle(spark):
    # the integer cross-multiplied inequality must agree with the
    # textbook float z² on a varied series (no near-threshold ties here)
    import statistics

    vals = [100, 104, 98, 102, 96, 103, 99, 180, 101, 97, 250, 100]
    rows = [("a", i * 60, v) for i, v in enumerate(vals)]
    out = rolling_anomaly_flags(
        _series(spark, rows), ["k"], "t", "v", n_prev=6, min_window=4
    )
    got = {r["t"]: r["is_anomaly"] for r in out.collect()}
    for i, v in enumerate(vals):
        prior = vals[max(0, i - 6):i]
        if len(prior) < 4:
            expect = 0
        else:
            mu = statistics.mean(prior)
            var = statistics.pvariance(prior)
            expect = int(var >= 0 and (v - mu) ** 2 > 9 * var)
        assert got[i * 60] == expect, f"row {i}"


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (5, None)], "id long, h long"
    )
    new = spark.createDataFrame(
        [(2, 20), (3, 31), (4, 40), (5, None)], "id long, h long"
    )
    out = snapshot_diff(old, new, ["id"], "h")
    got = {r["id"]: r["status"] for r in out.collect()}
    assert got == {1: "vanished", 2: "stable", 3: "changed", 4: "new", 5: "stable"}
    row4 = out.where(F.col("id") == 4).first()
    assert row4["old_h"] is None and row4["new_h"] == 40


def test_snapshot_diff_null_vs_value_is_changed(spark):
    # presence is membership, not value non-nullness: NULL on one side
    # with a value on the other is 'changed', never 'new'/'vanished'
    old = spark.createDataFrame([(1, None)], "id long, h long")
    new = spark.createDataFrame([(1, 7)], "id long, h long")
    assert snapshot_diff(old, new, ["id"], "h").first()["status"] == "changed"


# --- cusum_drift -----------------------------------------------------------

from chainalytic_framework_spark.operators.rolling import cusum_drift, ewma_smooth


def _cusum_ref(vals, slack_x1000=0):
    """Direct Page recursion, scaled like the operator: d = n*x*1000 -
    T*(1000+slack)."""
    n, tot = len(vals), sum(vals)
    s, out = 0, []
    for x in vals:
        d = n * x * 1000 - tot * (1000 + slack_x1000)
        s = max(0, s + d)
        out.append(s)
    return out


def test_cusum_matches_direct_recursion(spark):
    vals = [5, 5, 9, 9, 9, 2, 14, 14, 1, 20]
    df = _series(spark, [("a", i * 60, v) for i, v in enumerate(vals)])
    out = cusum_drift(df, ["k"], "t", "v").orderBy("t").collect()
    assert [int(r["cusum_scaled"]) for r in out] == _cusum_ref(vals)


def test_cusum_zero_on_constant_series(spark):
    df = _series(spark, [("a", i * 60, 7) for i in range(8)])
    out = cusum_drift(df, ["k"], "t", "v").collect()
    assert all(int(r["cusum_scaled"]) == 0 for r in out)


def test_cusum_slack_suppresses_small_drift(spark):
    # +1% drift above mean: with 5% slack the statistic must stay at 0
    # at the end (decays), while zero slack accumulates
    vals = [100, 100, 100, 100, 101, 101, 101, 101]
    df = _series(spark, [("a", i * 60, v) for i, v in enumerate(vals)])
    tight = cusum_drift(df, ["k"], "t", "v", slack_x1000=0).orderBy("t").collect()
    loose = cusum_drift(df, ["k"], "t", "v", slack_x1000=50).orderBy("t").collect()
    assert int(tight[-1]["cusum_scaled"]) > 0
    assert int(loose[-1]["cusum_scaled"]) == 0
    assert [int(r["cusum_scaled"]) for r in loose] == _cusum_ref(vals, 50)


# --- ewma_smooth -----------------------------------------------------------


def _ewma_ref(vals, alpha, k):
    out = []
    for i in range(len(vals)):
        win = vals[max(0, i - k + 1): i + 1]
        acc = float(win[0])
        for v in win[1:]:
            acc = acc * (1.0 - alpha) + alpha * float(v)
        out.append(round(acc * 10000))
    return out


def test_ewma_matches_reference_fold(spark):
    vals = [10, 20, 15, 40, 40, 40, 5, 5, 100, 3]
    df = _series(spark, [("a", i * 60, v) for i, v in enumerate(vals)])
    out = ewma_smooth(df, ["k"], "t", "v", alpha=0.3, window_k=4).orderBy("t").collect()
    assert [r["ewma_x1e4"] for r in out] == _ewma_ref(vals, 0.3, 4)


def test_ewma_window_truncation_bounds_state(spark):
    # two series identical in their last k rows but different before:
    # truncated EWMA must agree exactly on the last row
    tail = [50, 60, 55, 70]
    a = [1000, 2000] + tail
    b = [3, 7] + tail
    rows = [("a", i * 60, v) for i, v in enumerate(a)] + [
        ("b", i * 60, v) for i, v in enumerate(b)
    ]
    df = _series(spark, rows)
    out = ewma_smooth(df, ["k"], "t", "v", alpha=0.3, window_k=4)
    last = {r["k"]: r["ewma_x1e4"] for r in out.where(F.col("t") == 5 * 60).collect()}
    assert last["a"] == last["b"]


# --- series_correlation_pairs ----------------------------------------------

from chainalytic_framework_spark.operators.rolling import series_correlation_pairs


def test_correlation_matches_numpy(spark):
    import numpy as np

    xs = [3, 7, 1, 9, 4, 6, 2, 8]
    ys = [2, 6, 2, 8, 5, 5, 1, 9]       # positively correlated
    zs = [9, 2, 8, 1, 6, 3, 9, 2]       # negatively correlated with xs
    rows = []
    for i, (x, y, z) in enumerate(zip(xs, ys, zs)):
        rows += [("x", i * 60, x), ("y", i * 60, y), ("z", i * 60, z)]
    df = _series(spark, rows)
    out = {(r["ka"], r["kb"]): r for r in
           series_correlation_pairs(df, "k", "t", "v").collect()}
    for (a, b), (va, vb) in {("x", "y"): (xs, ys), ("x", "z"): (xs, zs),
                             ("y", "z"): (ys, zs)}.items():
        want = float(np.corrcoef(va, vb)[0, 1])
        got = out[(a, b)]
        assert got["n"] == 8
        assert abs(got["r2"] - want * want) < 1e-12
        assert got["r_sign"] == (1 if want > 0 else -1)
        # components are the exact integer statistics
        n = len(va)
        assert got["num"] == n * sum(p * q for p, q in zip(va, vb)) - sum(va) * sum(vb)


def test_correlation_aligned_buckets_only(spark):
    # series b missing bucket 120: n counts only shared buckets
    rows = [("a", 0, 1), ("a", 60, 2), ("a", 120, 3),
            ("b", 0, 2), ("b", 60, 4)]
    out = series_correlation_pairs(_series(spark, rows), "k", "t", "v").first()
    assert out["n"] == 2


def test_correlation_constant_series_null_r2(spark):
    rows = [("a", 0, 5), ("a", 60, 5), ("b", 0, 1), ("b", 60, 9)]
    out = series_correlation_pairs(_series(spark, rows), "k", "t", "v").first()
    assert out["den1"] == 0 and out["r2"] is None
