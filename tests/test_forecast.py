"""Forecasting (operators/forecast.py): exact parity with a scalar
python reference, seasonal recovery, trend extrapolation, validation."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.forecast import (
    _fit_forecast_group,
    holt_forecast,
)


def _scalar_reference(y, alpha, beta, gamma=None, period=None, horizon=12):
    """Independent per-series scalar implementation of the same
    textbook recursions."""
    y = list(map(float, y))
    if gamma is not None:
        m = period
        # np.mean for the init so the reference shares the engine's
        # summation order; every RECURSION step below is scalar math
        s1 = float(np.mean(y[:m]))
        s2 = float(np.mean(y[m:2 * m]))
        level = s1
        trend = (s2 - s1) / m
        season = [y[i] - s1 for i in range(m)]
        t0 = m
    else:
        level, trend = y[0], y[1] - y[0]
        t0 = 2
        season = None
    for t in range(t0, len(y)):
        prev = level + trend
        if gamma is not None:
            si = season[t % m]
            new_level = alpha * (y[t] - si) + (1 - alpha) * prev
            season[t % m] = gamma * (y[t] - new_level) + (1 - gamma) * si
        else:
            new_level = alpha * y[t] + (1 - alpha) * prev
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    out = []
    for k in range(1, horizon + 1):
        v = level + trend * k
        if gamma is not None:
            v += season[(len(y) + k - 1) % m]
        out.append(v)
    return out


def test_fit_matches_scalar_reference_exactly():
    rng = np.random.default_rng(5)
    lens = np.array([40, 31, 60])
    T = int(lens.max())
    y = np.zeros((3, T))
    for i, L in enumerate(lens):
        y[i, :L] = np.cumsum(rng.standard_normal(L)) + 10 * np.sin(
            np.arange(L) * 2 * np.pi / 12
        )
    # linear
    got = _fit_forecast_group(y, lens, 0.4, 0.2, None, None, 8)
    for i, L in enumerate(lens):
        exp = _scalar_reference(y[i, :L], 0.4, 0.2, horizon=8)
        np.testing.assert_array_equal(got[i], np.array(exp))
    # seasonal
    got = _fit_forecast_group(y, lens, 0.4, 0.2, 0.3, 12, 8)
    for i, L in enumerate(lens):
        exp = _scalar_reference(y[i, :L], 0.4, 0.2, 0.3, 12, horizon=8)
        np.testing.assert_array_equal(got[i], np.array(exp))


def test_recovers_pure_trend():
    y = (5.0 + 2.0 * np.arange(50)).reshape(1, -1)
    got = _fit_forecast_group(y, np.array([50]), 0.5, 0.5, None, None, 5)
    for k in range(5):
        assert abs(got[0, k] - (5 + 2 * (50 + k))) < 1e-6


def test_recovers_seasonal_pattern():
    m = 6
    base = np.array([0, 10, 20, 10, 0, -10], dtype=float)
    y = np.tile(base, 10).reshape(1, -1) + 100.0
    got = _fit_forecast_group(y, np.array([60]), 0.3, 0.05, 0.3, m, m)
    for k in range(m):
        assert abs(got[0, k] - (100.0 + base[(60 + k) % m])) < 1e-6


def test_holt_forecast_spark_end_to_end(spark):
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for u in ("a", "b"):
        for i in range(48):
            v = 100 + (3 if u == "a" else -2) * i + (20 if i % 24 < 12 else -20)
            rows.append((u, t0 + dt.timedelta(hours=i), float(v)))
    df = spark.createDataFrame(rows, "url string, bucket_start timestamp, point_count double")
    out = holt_forecast(
        df, alpha=0.4, beta=0.2, gamma=0.3, period=24, horizon=6
    ).collect()
    assert len(out) == 2 * 6
    by = {(r["url"], r["step"]): r for r in out}
    # forecast buckets continue the hourly grid
    assert by[("a", 1)]["bucket_start"] == t0 + dt.timedelta(hours=48)
    assert by[("a", 6)]["bucket_start"] == t0 + dt.timedelta(hours=53)
    # parity with the scalar reference through the Spark path
    ya = [100 + 3 * i + (20 if i % 24 < 12 else -20) for i in range(48)]
    exp = _scalar_reference(ya, 0.4, 0.2, 0.3, 24, horizon=6)
    for k in range(6):
        assert by[("a", k + 1)]["yhat"] == pytest.approx(exp[k], abs=1e-9)
    yb = [100 - 2 * i + (20 if i % 24 < 12 else -20) for i in range(48)]
    expb = _scalar_reference(yb, 0.4, 0.2, 0.3, 24, horizon=6)
    for k in range(6):
        assert by[("b", k + 1)]["yhat"] == pytest.approx(expb[k], abs=1e-9)


def test_irregular_series_rejected(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0 + dt.timedelta(hours=h), 1.0) for h in (0, 1, 2, 5, 6, 7)]
    df = spark.createDataFrame(rows, "url string, bucket_start timestamp, point_count double")
    with pytest.raises(Exception, match="irregular|gap-fill"):
        holt_forecast(df, horizon=2).collect()


def test_short_series_dropped(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0, 1.0), ("u", t0 + dt.timedelta(hours=1), 2.0)]
    df = spark.createDataFrame(rows, "url string, bucket_start timestamp, point_count double")
    assert holt_forecast(df, horizon=2).count() == 0


def test_residual_anomalies_flag_planted_spike(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u in ("good", "spiky"):
        for i in range(72):
            v = 100.0 + 10 * math.sin(i * 2 * math.pi / 24) + 0.1 * ((i * 7) % 5)
            if u == "spiky" and i == 60:
                v += 500.0
            rows.append((u, t0 + dt.timedelta(hours=i), v))
    df = spark.createDataFrame(rows, "url string, bucket_start timestamp, point_count double")
    from chainalytic_framework_spark.operators.forecast import (
        forecast_residual_anomalies,
    )

    out = forecast_residual_anomalies(
        df, alpha=0.4, beta=0.1, gamma=0.3, period=24, n_mads=8.0
    ).collect()
    flags = {(r["url"], r["bucket_start"]) for r in out if r["anomaly"]}
    assert ("spiky", t0 + dt.timedelta(hours=60)) in flags
    assert not any(u == "good" for u, _ in flags)
    # warm-up rows carry null yhat and never flag
    warm = [r for r in out if r["bucket_start"] < t0 + dt.timedelta(hours=24)]
    assert warm and all(r["yhat"] is None and not r["anomaly"] for r in warm)


def test_holt_forecast_numeric_key_grain(spark):
    """Non-string key columns (ADVICE r3): output schema must carry the
    input key type, not a hardcoded string coercion."""
    from datetime import datetime, timezone

    from chainalytic_framework_spark.operators.forecast import holt_forecast

    rows = [(7, datetime.fromtimestamp(3600 * i, tz=timezone.utc), float(10 + 2 * i))
            for i in range(6)]
    df = spark.createDataFrame(rows, "site_id long, bucket_start timestamp, point_count double")
    out = holt_forecast(df, key_cols=("site_id",), horizon=3)
    assert dict(out.dtypes)["site_id"] == "bigint"
    got = out.collect()
    assert len(got) == 3 and all(r["site_id"] == 7 for r in got)


def test_holt_forecast_duplicate_buckets_raise(spark):
    """Duplicated timestamps (all diffs 0) must fail loudly, not emit
    step_secs=0 forecasts stacked on last_ts (ADVICE r3)."""
    from datetime import datetime, timezone

    import pytest

    from chainalytic_framework_spark.operators.forecast import holt_forecast

    rows = [("u", datetime.fromtimestamp(0, tz=timezone.utc), 1.0)] * 4
    df = spark.createDataFrame(rows, "url string, bucket_start timestamp, point_count double")
    with pytest.raises(Exception, match="non-increasing"):
        holt_forecast(df, horizon=2).collect()
