"""Time-decayed trending scores and exact Gini/HHI/top-share metrics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.concentration import concentration
from chainalytic_framework_spark.operators.decay import decayed_scores, trending_topk

# ------------------------------------------------------------- decay


def _events(spark, rows):
    return spark.createDataFrame(rows, "host long, te long")


def test_decay_halves_per_half_life(spark):
    # events at T, T-hl, T-2hl -> 1 + 0.5 + 0.25 = 1.75
    rows = [(1, 1000), (1, 900), (1, 800)]
    out = decayed_scores(
        _events(spark, rows), ["host"], F.col("te"), 1000, 100
    ).collect()
    assert out[0]["score_x1e4"] == 17500 and out[0]["n_raw"] == 3


def test_decay_weighted(spark):
    rows = [(1, 1000), (1, 900)]
    out = decayed_scores(
        _events(spark, rows), ["host"], F.col("te"), 1000, 100,
        weight=F.lit(4.0),
    ).collect()
    assert out[0]["score_x1e4"] == 60000  # 4·(1 + 0.5)


def test_trending_order_and_tiebreak(spark):
    # hosts 2 and 3 tie exactly after rounding; host ASC breaks it.
    rows = [(1, 1000), (1, 1000), (2, 1000), (3, 1000), (4, 900)]
    out = trending_topk(
        _events(spark, rows), ["host"], F.col("te"), 1000, 100, k=3
    ).collect()
    assert [(r["host"], r["score_x1e4"]) for r in out] == [
        (1, 20000),
        (2, 10000),
        (3, 10000),
    ]


def test_decay_bad_half_life_raises(spark):
    with pytest.raises(ValueError):
        decayed_scores(_events(spark, [(1, 0)]), ["host"], F.col("te"), 0, 0)


# ----------------------------------------------------- concentration


def _weights(spark, ws, group=None):
    if group is None:
        return spark.createDataFrame(
            [(i, int(w)) for i, w in enumerate(ws)], "unit long, w long"
        )
    return spark.createDataFrame(
        [(g, i, int(w)) for i, (g, w) in enumerate(ws)],
        "grp string, unit long, w long",
    )


def _brute(ws, top_frac=0.01):
    """Textbook per-unit formulation (mean ranks for ties), in numpy."""
    w = np.asarray(sorted(ws), dtype=object)
    n = len(w)
    W = int(sum(w))
    ranks = []  # average ascending rank per unit
    i = 0
    while i < n:
        j = i
        while j < n and w[j] == w[i]:
            j += 1
        ranks += [(i + 1 + j) / 2.0] * (j - i)  # mean of ranks i+1..j
        i = j
    s2 = int(round(sum(2 * r * int(x) for r, x in zip(ranks, w))))
    gini = (s2 - (n + 1) * W) * 10000 // (n * W)
    hhi = sum(int(x) * int(x) for x in w) * 10000 // (W * W)
    k = max(1, int(n * top_frac))
    top = sum(sorted((int(x) for x in w), reverse=True)[:k])
    return n, W, gini, hhi, top * 10000 // W, k


def _run(spark, ws, top_frac=0.01):
    r = concentration(_weights(spark, ws), "w", top_frac=top_frac).collect()[0]
    return (
        r["n_units"],
        r["total_weight"],
        r["gini_x1e4"],
        r["hhi_x1e4"],
        r["top_share_x1e4"],
        r["top_k"],
    )


def test_uniform_weights_gini_zero(spark):
    got = _run(spark, [7] * 10, top_frac=0.2)
    assert got == (10, 70, 0, 1000, 2000, 2)  # hhi = 1e4/10; top2 = 20%


def test_one_unit_holds_all(spark):
    ws = [0] * 9 + [100]
    n, W, gini, hhi, top, k = _run(spark, ws, top_frac=0.1)
    assert (n, W) == (10, 100)
    assert gini == 9000  # (n-1)/n · 1e4
    assert hhi == 10000 and top == 10000 and k == 1


def test_matches_brute_force(spark):
    rng = np.random.default_rng(7)
    for trial in range(3):
        ws = [int(x) for x in rng.zipf(1.7, size=120).clip(max=10_000)]
        assert _run(spark, ws, top_frac=0.05) == _brute(ws, top_frac=0.05)


def test_tied_weights_mean_rank(spark):
    # heavy tie block straddling the mean — exercises the mean-rank
    # algebra (2·below + c + 1) against the textbook form.
    ws = [1, 1, 1, 5, 5, 5, 5, 20]
    assert _run(spark, ws, top_frac=0.25) == _brute(ws, top_frac=0.25)


def test_grouped_independent(spark):
    rows = [("a", w) for w in [1, 1, 1, 1]] + [("b", w) for w in [0, 0, 0, 12]]
    out = concentration(
        _weights(spark, rows, group=True), "w", group_cols=["grp"],
        top_frac=0.25,
    )
    got = {r["grp"]: (r["gini_x1e4"], r["hhi_x1e4"]) for r in out.collect()}
    assert got["a"] == (0, 2500)
    assert got["b"] == (7500, 10000)


def test_zero_total_weight_null_metrics(spark):
    r = concentration(_weights(spark, [0, 0]), "w").collect()[0]
    assert r["n_units"] == 2 and r["total_weight"] == 0
    assert r["gini_x1e4"] is None and r["hhi_x1e4"] is None


def test_bad_top_frac_raises(spark):
    with pytest.raises(ValueError):
        concentration(_weights(spark, [1]), "w", top_frac=0.0)
