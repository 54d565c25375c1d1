"""operators/asap.py: ASAP-style auto-window smoothing — known-answer,
NumPy-reference, and parallelism-invariance tests."""

from __future__ import annotations

import numpy as np

from chainalytic_framework_spark.operators.asap import (
    asap_candidate_stats,
    asap_choose,
    asap_smooth,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, ["k", "t", "v"])


def _numpy_stats(xs, w):
    """Reference: exact integer stats for one key/window, mirroring the
    module's algebra (rolling SUM, full windows only, int-div scaling)."""
    xs = [int(x) for x in xs]
    n = len(xs)
    s = [sum(xs[i - w + 1 : i + 1]) for i in range(w - 1, n)]
    m = len(s)
    d = [s[i] - s[i - 1] for i in range(1, m)]
    cnt = len(d)
    rough = None
    if cnt > 1:
        rough = (cnt * sum(v * v for v in d) - sum(d) ** 2) * 10**8 // (
            cnt * cnt * w * w
        )
    sx, sxx = sum(xs), sum(x * x for x in xs)
    raw_var = n * sxx - sx * sx
    if raw_var == 0:
        ret = 10000
    else:
        ss, sss = sum(s), sum(v * v for v in s)
        ret = (m * sss - ss * ss) * n * n * 10000 // (raw_var * m * m * w * w)
    return m, rough, ret


def test_stats_match_numpy_reference(spark):
    rng = np.random.RandomState(7)
    xs = (1000 + np.cumsum(rng.randint(-50, 51, size=40))).tolist()
    rows = [("a", t, int(x)) for t, x in enumerate(xs)]
    out = {
        r.w: r
        for r in asap_candidate_stats(
            _series(spark, rows), ["k"], "t", "v"
        ).collect()
    }
    for w in (2, 3, 5, 7):
        m, rough, ret = _numpy_stats(xs, w)
        assert out[w].m == m
        assert out[w].rough2_x1e8 == rough
        assert out[w].ret_x1e4 == ret


def test_constant_series_retains_trivially_and_picks_smallest_w(spark):
    rows = [("c", t, 500) for t in range(20)]
    stats = asap_candidate_stats(_series(spark, rows), ["k"], "t", "v")
    for r in stats.collect():
        assert r.ret_x1e4 == 10000  # zero raw variance => trivial retention
        assert r.rough2_x1e8 == 0  # constant SMA => zero roughness
    chosen = asap_choose(stats, ["k"]).collect()[0]
    assert chosen.chosen_w == 2  # roughness tie broken toward least smoothing


def test_smoother_window_wins_on_noise_but_retention_gates(spark):
    # alternating +/- noise around a level: wider SMA kills roughness but
    # also variance; with the default 50% retention gate the choice must
    # come from the qualifying set only.
    rows = [("n", t, 1000 + (200 if t % 2 == 0 else -200)) for t in range(48)]
    stats = asap_candidate_stats(_series(spark, rows), ["k"], "t", "v")
    by_w = {r.w: r for r in stats.collect()}
    # even windows average out the alternation entirely => rough 0, ret 0
    assert by_w[2].rough2_x1e8 == 0 and by_w[2].ret_x1e4 == 0
    # a lenient gate lets the zero-roughness even window win...
    assert asap_choose(stats, ["k"], min_retention_x1e4=0).collect()[0].chosen_w == 2
    # ...but EVERY SMA of pure alternation destroys >50% of the variance
    # (w=3 retains 11%, w=5 4%, w=7 2%), so the default gate must refuse
    # to smooth at all — the conservative w=1 fallback, not a bad pick
    assert all(r.ret_x1e4 < 5000 for r in by_w.values())
    assert asap_choose(stats, ["k"]).collect()[0].chosen_w == 1


def test_no_qualifying_candidate_passes_through_unsmoothed(spark):
    rows = [("p", t, 100 * t) for t in range(3)]  # too short for m>=2 at w>=2
    out = asap_smooth(_series(spark, rows), ["k"], "t", "v").collect()
    assert sorted((r.t, r.chosen_w, r.sma_x1e4) for r in out) == [
        (0, 1, 0),
        (1, 1, 100 * 10**4),
        (2, 1, 200 * 10**4),
    ]


def test_smooth_values_are_exact_window_means(spark):
    rng = np.random.RandomState(11)
    xs = (500 + np.cumsum(rng.randint(-30, 31, size=30))).tolist()
    rows = [("a", t, int(x)) for t, x in enumerate(xs)]
    out = asap_smooth(_series(spark, rows), ["k"], "t", "v").collect()
    w = out[0].chosen_w
    assert all(r.chosen_w == w for r in out)
    got = {r.t: r.sma_x1e4 for r in out}
    assert len(got) == len(xs) - w + 1
    for t in range(w - 1, len(xs)):
        expect = sum(int(x) for x in xs[t - w + 1 : t + 1]) * 10**4 // w
        assert got[t] == expect


def test_parallelism_invariance(spark):
    rng = np.random.RandomState(3)
    rows = [
        (f"k{k}", t, int(v))
        for k in range(6)
        for t, v in enumerate(
            1000 + np.cumsum(rng.randint(-40, 41, size=25))
        )
    ]
    one = _series(spark, rows).coalesce(1)
    many = _series(spark, rows).repartition(16)
    a = sorted(map(tuple, asap_smooth(one, ["k"], "t", "v").collect()))
    b = sorted(map(tuple, asap_smooth(many, ["k"], "t", "v").collect()))
    assert a == b


def test_multi_key_choices_are_independent(spark):
    rows = [("flat", t, 700) for t in range(20)] + [
        ("noisy", t, 1000 + (300 if t % 2 == 0 else -300)) for t in range(20)
    ]
    out = {
        r.k: r.chosen_w
        for r in asap_choose(
            asap_candidate_stats(_series(spark, rows), ["k"], "t", "v"), ["k"]
        ).collect()
    }
    assert out["flat"] == 2
    assert out["noisy"] != 2  # retention gate rejects the variance-killing w
