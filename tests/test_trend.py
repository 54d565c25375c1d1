"""operators/trend.py: exact-integer linear fits, lag-k autocorrelation,
batch CUSUM changepoint — known-answer and parallelism-invariance tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.trend import (
    acf_lag,
    acf_spectrum,
    burst_windows,
    changepoint,
    linfit,
    spearman,
    theil_sen,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_linfit_perfect_line(spark):
    rows = [("a", x, 3 * x + 7) for x in range(50)]
    out = linfit(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    assert out.n_points == 50
    assert out.slope_x1e4 == 30000
    assert out.r2_signed_x1e4 == 10000


def test_linfit_negative_slope_carries_sign(spark):
    rows = [("a", x, 1000 - 2 * x) for x in range(40)]
    out = linfit(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    assert out.slope_x1e4 == -20000
    assert out.r2_signed_x1e4 == -10000


def test_linfit_degenerate_emits_zero(spark):
    rows = [("cx", 5, y) for y in range(10)] + [("cy", x, 3) for x in range(10)]
    out = {
        r.k: r
        for r in linfit(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()
    }
    assert out["cx"].slope_x1e4 == 0 and out["cx"].r2_signed_x1e4 == 0
    assert out["cy"].slope_x1e4 == 0 and out["cy"].r2_signed_x1e4 == 0


def test_linfit_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1440, 500)
    ys = (5 * xs + rng.integers(-2000, 2000, 500)).astype(int)
    rows = [("a", int(x), int(y)) for x, y in zip(xs, ys)]
    out = linfit(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    slope = np.polyfit(xs.astype(float), ys.astype(float), 1)[0]
    r = np.corrcoef(xs.astype(float), ys.astype(float))[0, 1]
    assert abs(out.slope_x1e4 / 1e4 - slope) < 1e-3
    assert abs(out.r2_signed_x1e4 / 1e4 - np.sign(r) * r * r) < 1e-3


def test_linfit_partitioning_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (f"k{i % 3}", int(x), int(y))
        for i, (x, y) in enumerate(
            zip(rng.integers(0, 1000, 300), rng.integers(-500, 500, 300))
        )
    ]
    df = _df(spark, rows, ["k", "x", "y"])
    a = sorted(map(tuple, linfit(df.coalesce(1), ["k"], "x", "y").collect()))
    b = sorted(map(tuple, linfit(df.repartition(7), ["k"], "x", "y").collect()))
    assert a == b  # bit-identical at any parallelism — the engine invariant


def test_acf_periodic_series_r2_is_one(spark):
    # period-4 series sampled hourly: v(t) = pattern[t/3600 mod 4]
    pat = [10, 40, 25, 90]
    rows = [("a", 3600 * i, pat[i % 4]) for i in range(64)]
    tier = _df(spark, rows, ["k", "bucket_epoch", "c"])
    pairs = acf_lag(tier, ["k"], "bucket_epoch", "c", 4 * 3600)
    out = linfit(pairs, ["k"], "_x", "_y").collect()[0]
    assert out.n_points == 60  # 64 buckets - 4 lag
    assert out.r2_signed_x1e4 == 10000


def test_acf_join_is_gap_robust(spark):
    # drop one bucket: a row-offset lag would misalign everything after
    # the gap; the bucket-key join only loses the pairs touching it
    pat = [10, 40, 25, 90]
    rows = [("a", 3600 * i, pat[i % 4]) for i in range(64) if i != 30]
    tier = _df(spark, rows, ["k", "bucket_epoch", "c"])
    pairs = acf_lag(tier, ["k"], "bucket_epoch", "c", 4 * 3600)
    out = linfit(pairs, ["k"], "_x", "_y").collect()[0]
    assert out.n_points == 58  # lost the pair into AND out of bucket 30
    assert out.r2_signed_x1e4 == 10000  # alignment survives the gap


def test_changepoint_finds_step(spark):
    # 40 buckets at 10 then 40 at 100: deviation peaks at the last
    # low-regime bucket (index 39)
    rows = [("a", 3600 * i, 10 if i < 40 else 100) for i in range(80)]
    tier = _df(spark, rows, ["k", "bucket_epoch", "c"])
    out = changepoint(tier, ["k"], "bucket_epoch", "c").collect()[0]
    assert out.change_epoch == 3600 * 39


def test_changepoint_tie_breaks_to_earliest(spark):
    # constant series: every prefix deviation is 0 — argmax ties on all
    # buckets, must pick the earliest
    rows = [("a", 3600 * i, 5) for i in range(10)]
    tier = _df(spark, rows, ["k", "bucket_epoch", "c"])
    out = changepoint(tier, ["k"], "bucket_epoch", "c").collect()[0]
    assert out.change_epoch == 0 and out.abs_dev == 0


def test_changepoint_excludes_last_bucket_and_handles_negatives(spark):
    # two buckets: the only candidate is the first (k<n); negative
    # values exercise the abs() path
    rows = [("a", 0, -100), ("a", 3600, 50)]
    tier = _df(spark, rows, ["k", "bucket_epoch", "c"])
    out = changepoint(tier, ["k"], "bucket_epoch", "c").collect()
    assert len(out) == 1
    # n=2, S_1=-100, T=-50, k=1 → |2·(−100) − 1·(−50)| = 150
    assert out[0].change_epoch == 0 and out[0].abs_dev == 150


# --------------------------------------------------------------------------
# seasonal_naive_backtest
# --------------------------------------------------------------------------


def _backtest(spark, rows):
    from chainalytic_framework_spark.operators.trend import seasonal_naive_backtest

    tier = spark.createDataFrame(rows, "k string, b long, v long")
    return {
        r.k: r
        for r in seasonal_naive_backtest(
            tier, ["k"], "b", "v", 3600, 86400
        ).collect()
    }


def test_backtest_periodic_series_has_zero_seasonal_error(spark):
    pat = [10, 40, 25, 90] * 6  # period exactly 24h
    rows = [("a", 3600 * i, pat[i % 24]) for i in range(72)]
    out = _backtest(spark, rows)["a"]
    assert out.n_eval == 48  # 72 buckets - 24 needing both lags
    assert out.abs_err_seasonal == 0
    assert out.abs_err_naive > 0
    assert out.mase_x1e4 == 0


def test_backtest_linear_ramp_punishes_seasonal(spark):
    rows = [("a", 3600 * i, i) for i in range(72)]
    out = _backtest(spark, rows)["a"]
    # every step: naive err 1, seasonal err 24 -> mase = 24.0
    assert out.mase_x1e4 == 240000


def test_backtest_constant_series_mase_null(spark):
    rows = [("a", 3600 * i, 5) for i in range(72)]
    out = _backtest(spark, rows)["a"]
    assert out.abs_err_naive == 0 and out.abs_err_seasonal == 0
    assert out.mase_x1e4 is None


def test_backtest_gap_robust(spark):
    # removing bucket 30 drops evaluations needing it (as v, as naive
    # source, or as seasonal source) but never misaligns the rest
    rows = [("a", 3600 * i, i) for i in range(72) if i != 30]
    out = _backtest(spark, rows)["a"]
    assert out.n_eval == 45  # 48 - {t=30 eval, t=31 naive, t=54 seasonal}
    assert out.mase_x1e4 == 240000  # alignment intact


# --------------------------------------------------------------------------
# gap_stats (operators/states.py)
# --------------------------------------------------------------------------


def _gaps(spark, rows, thr):
    import datetime as dt

    from chainalytic_framework_spark.operators.states import gap_stats

    data = [
        (k, dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(tzinfo=None), i)
        for i, (k, t) in enumerate(rows)
    ]
    ev = spark.createDataFrame(data, "k string, ts timestamp_ntz, eid long")
    return {r.k: r for r in gap_stats(ev, ["k"], "ts", "eid", thr).collect()}


def test_gap_stats_hand_case(spark):
    rows = [("a", 0), ("a", 100), ("a", 10000), ("a", 10100)]
    out = _gaps(spark, rows, 1000)["a"]
    assert out.span_secs == 10100
    assert out.covered_secs == 200
    assert out.n_gaps == 1
    assert out.max_gap_secs == 9900
    assert out.uptime_x1e4 == 200 * 10000 // 10100


def test_gap_stats_no_gaps_full_uptime(spark):
    rows = [("a", i * 10) for i in range(11)]
    out = _gaps(spark, rows, 1000)["a"]
    assert out.n_gaps == 0 and out.max_gap_secs == 0
    assert out.uptime_x1e4 == 10000


def test_gap_stats_single_event_key_excluded(spark):
    out = _gaps(spark, [("solo", 42), ("b", 0), ("b", 10)], 100)
    assert "solo" not in out and out["b"].span_secs == 10


# --------------------------------------------------------------------------
# property tests: exact-fraction references (hypothesis)
# --------------------------------------------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st

_pts = st.lists(
    st.tuples(st.integers(0, 1440), st.integers(-10_000, 10_000)),
    min_size=3,
    max_size=60,
)


@settings(max_examples=20, deadline=None)
@given(_pts)
def test_linfit_matches_exact_fractions(spark, pts):
    from fractions import Fraction

    rows = [("a", x, y) for x, y in pts]
    out = linfit(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    if num == 0 or denx == 0:
        assert out.slope_x1e4 == 0
    else:
        sgn = -1 if num < 0 else 1
        assert out.slope_x1e4 == sgn * (abs(num) * 10000 // denx)
        # and the truncated value brackets the exact slope
        exact = Fraction(num, denx)
        assert abs(Fraction(out.slope_x1e4, 10000) - exact) < Fraction(1, 10000)
    if num == 0 or denx == 0 or deny == 0:
        assert out.r2_signed_x1e4 == 0
    else:
        sgn = -1 if num < 0 else 1
        assert out.r2_signed_x1e4 == sgn * (num * num * 10000 // (denx * deny))
        assert -10000 <= out.r2_signed_x1e4 <= 10000


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=2, max_size=40),
)
def test_changepoint_matches_bruteforce(spark, vals):
    rows = [("a", 3600 * i, v) for i, v in enumerate(vals)]
    out = changepoint(
        _df(spark, rows, ["k", "bucket_epoch", "c"]), ["k"], "bucket_epoch", "c"
    ).collect()[0]
    n, t = len(vals), sum(vals)
    best = None
    s = 0
    for k, v in enumerate(vals[:-1], start=1):
        s += v
        adev = abs(n * s - k * t)
        if best is None or adev > best[0]:
            best = (adev, 3600 * (k - 1))
    assert (out.abs_dev, out.change_epoch) == best


# --------------------------------------------------------------------------
# max_drawdown
# --------------------------------------------------------------------------


def _dd(spark, vals):
    from chainalytic_framework_spark.operators.trend import max_drawdown

    rows = [("a", 3600 * i, v) for i, v in enumerate(vals)]
    tier = _df(spark, rows, ["k", "bucket_epoch", "c"])
    return max_drawdown(tier, ["k"], "bucket_epoch", "c").collect()[0]


def test_drawdown_hand_case(spark):
    # cum: 10, 30, 15, 35, 5 -> peaks 10,30,30,35,35 -> dd 0,0,15,0,30
    out = _dd(spark, [10, 20, -15, 20, -30])
    assert out.max_drawdown == 30
    assert out.trough_epoch == 3600 * 4
    assert out.final_cum == 5
    assert out.n_buckets == 5


def test_drawdown_monotonic_rise_is_zero(spark):
    out = _dd(spark, [5, 5, 5])
    assert out.max_drawdown == 0
    assert out.trough_epoch == 0  # all-zero dd ties to the earliest bucket
    assert out.final_cum == 15


def test_drawdown_tie_breaks_to_earliest_trough(spark):
    # cum: 10, 0, 10, 0 -> dd: 0, 10, 0, 10 (tie at buckets 1 and 3)
    out = _dd(spark, [10, -10, 10, -10])
    assert out.max_drawdown == 10
    assert out.trough_epoch == 3600 * 1


def test_drawdown_matches_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vals = [int(x) for x in rng.integers(-50, 50, 200)]
    out = _dd(spark, vals)
    cum = peak = 0
    best = (0, 0)
    for i, v in enumerate(vals):
        cum += v
        peak = max(peak, cum) if i else cum
        d = peak - cum
        if d > best[0]:
            best = (d, 3600 * i)
    assert (out.max_drawdown, out.trough_epoch) == best


# --- spearman ---------------------------------------------------------------


def test_spearman_perfect_monotone_nonlinear(spark):
    # y = x^3 is monotone but nonlinear: Spearman must hit +1 exactly
    rows = [("a", i, x, x**3) for i, x in enumerate(range(1, 31))]
    out = spearman(
        _df(spark, rows, ["k", "o", "x", "y"]), ["k"], "x", "y", "o"
    ).collect()[0]
    assert out.n_points == 30
    assert out.rho_x1e4 == 10000


def test_spearman_perfect_inverse(spark):
    rows = [("a", i, x, -x) for i, x in enumerate(range(20))]
    out = spearman(
        _df(spark, rows, ["k", "o", "x", "y"]), ["k"], "x", "y", "o"
    ).collect()[0]
    assert out.rho_x1e4 == -10000


def test_spearman_matches_scipy_formula(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    xs = rng.permutation(200)
    ys = rng.permutation(200)
    # distinct values => row_number ranks == classic ranks; exact formula
    rx = np.argsort(np.argsort(xs)) + 1
    ry = np.argsort(np.argsort(ys)) + 1
    n = 200
    num = (n**3 - n) - 6 * int(((rx - ry) ** 2).sum())
    expected = (1 if num >= 0 else -1) * (abs(num) * 10000 // (n**3 - n))
    rows = [("a", i, int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    out = spearman(
        _df(spark, rows, ["k", "o", "x", "y"]), ["k"], "x", "y", "o"
    ).collect()[0]
    assert out.rho_x1e4 == expected


def test_spearman_single_point_null(spark):
    out = spearman(
        _df(spark, [("a", 1, 5, 7)], ["k", "o", "x", "y"]),
        ["k"], "x", "y", "o",
    ).collect()[0]
    assert out.n_points == 1 and out.rho_x1e4 is None


def test_spearman_parallelism_invariant(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [
        (f"k{i % 4}", i, int(rng.integers(0, 50)), int(rng.integers(0, 50)))
        for i in range(400)
    ]
    df = _df(spark, rows, ["k", "o", "x", "y"])
    a = {r.k: r.rho_x1e4 for r in
         spearman(df.coalesce(1), ["k"], "x", "y", "o").collect()}
    b = {r.k: r.rho_x1e4 for r in
         spearman(df.repartition(16), ["k"], "x", "y", "o").collect()}
    assert a == b


# --- burst_windows ----------------------------------------------------------


def _hourly(spark, counts, key="a", tier=3600):
    rows = [(key, i * tier, int(c)) for i, c in enumerate(counts)]
    return _df(spark, rows, ["k", "b", "c"])


def test_burst_flags_spike_and_merges_islands(spark):
    # 24h of steady 10/hr, then a two-hour 50/hr spike, then steady
    counts = [10] * 24 + [50, 50] + [10] * 6
    out = burst_windows(
        _hourly(spark, counts), ["k"], "b", "c", 3600,
        baseline_buckets=24, mult_x1e4=30000, min_base_buckets=6,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.burst_start == 24 * 3600
    assert r.burst_end == 26 * 3600  # exclusive, merged two buckets
    assert r.n_buckets == 2 and r.peak_count == 50 and r.total_count == 100


def test_burst_cold_start_never_alarms(spark):
    # first buckets have no baseline history: min_base gate holds
    counts = [100, 100, 100, 10, 10, 10]
    out = burst_windows(
        _hourly(spark, counts), ["k"], "b", "c", 3600,
        baseline_buckets=24, mult_x1e4=15000, min_base_buckets=6,
    ).collect()
    assert out == []


def test_burst_range_window_ignores_gap_reachback(spark):
    # a series gap must SHORTEN the baseline (range window), not let the
    # window reach further back in rows: bucket at t=30h sees only the
    # 6 buckets within its trailing 24h, all small -> bursts
    rows = [("a", h * 3600, 10) for h in range(8)]           # old history
    rows += [("a", (24 + h) * 3600, 10) for h in range(6)]   # recent 6
    rows += [("a", 30 * 3600, 40)]                           # spike
    df = _df(spark, rows, ["k", "b", "c"])
    out = burst_windows(
        df, ["k"], "b", "c", 3600,
        baseline_buckets=24, mult_x1e4=30000, min_base_buckets=6,
    ).collect()
    assert len(out) == 1 and out[0].burst_start == 30 * 3600


def test_burst_exact_threshold_boundary(spark):
    # c * bn * 1e4 == mult * bsum exactly -> bursts (>= comparison)
    counts = [10] * 24 + [30]
    hits = burst_windows(
        _hourly(spark, counts), ["k"], "b", "c", 3600,
        baseline_buckets=24, mult_x1e4=30000, min_base_buckets=6,
    ).collect()
    assert len(hits) == 1
    misses = burst_windows(
        _hourly(spark, [10] * 24 + [29]), ["k"], "b", "c", 3600,
        baseline_buckets=24, mult_x1e4=30000, min_base_buckets=6,
    ).collect()
    assert misses == []


# --- theil_sen --------------------------------------------------------------


def test_theil_sen_perfect_line(spark):
    rows = [("a", x, 5 * x + 3) for x in range(20)]
    out = theil_sen(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    assert out.slope_x1e4 == 50000
    assert out.n_pairs == 190
    assert out.mk_s == 190  # all pairs concordant


def test_theil_sen_ignores_single_outlier(spark):
    # linfit gets dragged by the spike; theil-sen's median slope holds
    rows = [("a", x, 2 * x) for x in range(21)]
    rows[20] = ("a", 20, 100000)  # at the end: max leverage on least squares
    df = _df(spark, rows, ["k", "x", "y"])
    ts = theil_sen(df, ["k"], "x", "y").collect()[0]
    lf = linfit(df, ["k"], "x", "y").collect()[0]
    assert ts.slope_x1e4 == 20000
    assert abs(lf.slope_x1e4 - 20000) > 5000


def test_theil_sen_matches_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    ys = rng.integers(-100, 100, 16)
    rows = [("a", x, int(y)) for x, y in enumerate(ys)]
    # brute-force lower median with the same integerized slope + tie order
    sl = sorted(
        ((1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
         * (abs(int(ys[j]) - int(ys[i])) * 10000 // (j - i)), i, j)
        for i in range(16) for j in range(i + 1, 16)
    )
    expected = sl[(len(sl) + 1) // 2 - 1][0]
    mk = sum(
        1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0
        for i in range(16) for j in range(i + 1, 16)
    )
    out = theil_sen(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    assert out.slope_x1e4 == expected and out.mk_s == mk


def test_theil_sen_even_pair_count_lower_median(spark):
    # n=3 points -> 3 pairs (odd); n=4 -> 6 pairs (even, lower median)
    rows = [("a", 0, 0), ("a", 1, 10), ("a", 2, 14), ("a", 3, 30)]
    out = theil_sen(_df(spark, rows, ["k", "x", "y"]), ["k"], "x", "y").collect()[0]
    # slopes x1e4, sorted: pairs (1,2)=40000,(0,2)=70000,(2,3)=160000,
    # (0,1)=100000,(1,3)=100000,(0,3)=100000 -> sorted [40000,70000,
    # 100000,100000,100000,160000]; lower median = rank 3 = 100000
    assert out.n_pairs == 6 and out.slope_x1e4 == 100000


# --- acf_spectrum -----------------------------------------------------------


def test_acf_spectrum_detects_period(spark):
    import math

    # period-7 sawtooth over 70 buckets: lag 7 echoes perfectly,
    # lag 3 does not
    rows = [("a", b, (b % 7) * 10 + 5) for b in range(70)]
    out = acf_spectrum(
        _df(spark, rows, ["k", "b", "v"]), ["k"], "b", "v", [3, 7]
    ).collect()
    r2 = {r.lag_secs: r.r2_signed_x1e4 for r in out}
    assert r2[7] == 10000          # exact echo at the true period
    assert r2[3] < 5000            # off-period lag is weak


def test_acf_spectrum_matches_single_lag(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    rows = [("a", b, int(v)) for b, v in
            enumerate(rng.integers(0, 100, 60))]
    df = _df(spark, rows, ["k", "b", "v"])
    multi = {
        r.lag_secs: (r.n_points, r.slope_x1e4, r.r2_signed_x1e4)
        for r in acf_spectrum(df, ["k"], "b", "v", [1, 5]).collect()
    }
    for lag in (1, 5):
        single = linfit(acf_lag(df, ["k"], "b", "v", lag), ["k"],
                        "_x", "_y").collect()[0]
        assert multi[lag] == (
            single.n_points, single.slope_x1e4, single.r2_signed_x1e4
        )
