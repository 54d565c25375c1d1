"""Per-series forecasting over tier tables: Holt linear trend and
Holt-Winters additive seasonal exponential smoothing.

The serving companion the rollup tiers were missing: dashboards that
read `tier_1h` also want "next 24 buckets" (capacity planning, crawl
scheduling, anomaly baselines — the same role the CUSUM/EWMA monitors
fill on the detection side). Holt (1957) / Winters (1960) recursions,
the standard triple-exponential-smoothing family.

Execution shape: ``applyInPandas`` per key-hash group; within a group
the recursion is TRANSPOSED across series — one pass over time steps,
each step a vectorized update across every series in the group (the
same lock-step trick as the codec batch decoder). The per-step
expressions are the textbook scalar formulas evaluated elementwise, so
results are bit-identical to a per-series scalar loop
(tests/test_forecast.py asserts exact equality against an independent
python reference). Ragged series are masked: a series stops updating
past its own length.

Inputs must be REGULAR series (fixed bucket step per key) — exactly
what the gap-filled tiers produce (operators/gapfill.py); the operator
validates spacing and raises on gaps rather than silently smoothing
over them.

Scale notes: state per series is O(1) (level, trend) + O(period)
seasonals; groups are key-hash partitions so the shuffle is one
exchange and skew is bounded by keys-per-bucket. No driver-side data.

Reference analogue: none — engine-added timeseries capability
(SURVEY §2.11 family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FORECAST_BUCKETS = 64


def _fit_forecast_group(
    y_mat: np.ndarray,
    lens: np.ndarray,
    alpha: float,
    beta: float,
    gamma: float | None,
    period: int | None,
    horizon: int,
    return_fitted: bool = False,
):
    """(K, horizon) forecasts for K series stacked in a (K, T) matrix
    (rows padded past ``lens`` with anything — masked). Pure numpy,
    shared by the Spark path and the test reference harness.
    ``return_fitted`` additionally returns the (K, T) ONE-STEP-AHEAD
    in-sample predictions (NaN before the recursion warms up) — the
    residual stream anomaly detection consumes."""
    K, T = y_mat.shape
    seasonal = gamma is not None and period is not None
    fitted = np.full((K, T), np.nan) if return_fitted else None
    if seasonal:
        m = int(period)
        # classic init: level = mean of season 1; trend = per-step gap
        # between season-2 and season-1 means; seasonals = season-1
        # residuals. Requires len >= 2m (validated by caller).
        s1 = y_mat[:, :m].mean(axis=1)
        s2 = y_mat[:, m : 2 * m].mean(axis=1)
        level = s1.copy()
        trend = (s2 - s1) / m
        season = y_mat[:, :m] - s1[:, None]
        t0 = m
    else:
        level = y_mat[:, 0].copy()
        trend = y_mat[:, 1] - y_mat[:, 0]
        t0 = 2
        season = None
    for t in range(t0, T):
        active = lens > t
        if not active.any():
            break
        y = y_mat[:, t]
        prev = level + trend
        if return_fitted:
            pred = prev + (season[:, t % m] if seasonal else 0.0)
            fitted[:, t] = np.where(active, pred, np.nan)
        if seasonal:
            si = season[:, t % m]
            new_level = alpha * (y - si) + (1 - alpha) * prev
            new_season = gamma * (y - new_level) + (1 - gamma) * si
            season[:, t % m] = np.where(active, new_season, si)
        else:
            new_level = alpha * y + (1 - alpha) * prev
        new_trend = beta * (new_level - level) + (1 - beta) * trend
        level = np.where(active, new_level, level)
        trend = np.where(active, new_trend, trend)
    steps = np.arange(1, horizon + 1)
    out = level[:, None] + trend[:, None] * steps[None, :]
    if seasonal:
        # season index continues from each series' own last step
        idx = (lens[:, None] + steps[None, :] - 1) % m
        out = out + season[np.arange(K)[:, None], idx]
    if return_fitted:
        return out, fitted
    return out


def holt_forecast(
    tier_df: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "bucket_start",
    value_col: str = "point_count",
    alpha: float = 0.5,
    beta: float = 0.1,
    gamma: float | None = None,
    period: int | None = None,
    horizon: int = 12,
    n_buckets: int = N_FORECAST_BUCKETS,
) -> DataFrame:
    """Forecast ``horizon`` future buckets per key.

    Returns (key..., step 1..horizon, yhat double, bucket_start of the
    forecast bucket). ``gamma``+``period`` switch on additive
    seasonality (series shorter than 2·period are dropped; Holt linear
    drops series shorter than 3). Validates regular spacing per key.
    """
    if gamma is not None and (period is None or period < 2):
        raise ValueError("seasonal mode needs period >= 2")
    min_len = (2 * period) if gamma is not None else 3
    keys = list(key_cols)
    sel = tier_df.select(
        *keys,
        F.col(ts_col).cast("timestamp").cast("long").alias("_ts"),
        F.col(value_col).cast("double").alias("_y"),
        F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int").alias("_b"),
    )

    # key types come from the INPUT schema (ADVICE r3: hardcoding string
    # broke/coerced numeric key grains, e.g. CLI --keys over int columns)
    out_schema = (
        ", ".join(f"{k} {tier_df.schema[k].dataType.simpleString()}" for k in keys)
        + ", step int, yhat double, bucket_start timestamp"
    )
    a, b, g, per, h, mn = alpha, beta, gamma, period, horizon, min_len

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {**{k: pd.Series(dtype="object") for k in keys},
                 "step": pd.Series(dtype="int32"),
                 "yhat": pd.Series(dtype="float64"),
                 "bucket_start": pd.Series(dtype="datetime64[us]")}
            )
        pdf = pdf.sort_values([*keys, "_ts"], kind="mergesort")
        grp = pdf.groupby(keys, sort=False)
        lens_s = grp.size()
        keep = lens_s[lens_s >= mn]
        if len(keep) == 0:
            return run(pdf.iloc[0:0])
        K = len(keep)
        T = int(keep.max())
        y_mat = np.zeros((K, T), dtype=np.float64)
        lens = keep.to_numpy().astype(np.int64)
        last_ts = np.empty(K, dtype=np.int64)
        step_secs = np.empty(K, dtype=np.int64)
        key_rows = []
        idx_map = grp.indices
        for r, kv in enumerate(keep.index):
            ridx = idx_map[kv]
            ts = pdf["_ts"].to_numpy()[ridx]
            d = np.diff(ts)
            if len(d) and ((d != d[0]).any() or d[0] <= 0):
                raise ValueError(
                    f"irregular or non-increasing series for key {kv!r}: "
                    f"dedupe buckets / gap-fill first (operators/gapfill.py)"
                )
            y_mat[r, : lens[r]] = pdf["_y"].to_numpy()[ridx]
            last_ts[r] = ts[-1]
            step_secs[r] = d[0] if len(d) else 0
            key_rows.append(kv if isinstance(kv, tuple) else (kv,))
        fc = _fit_forecast_group(y_mat, lens, a, b, g, per, h)
        steps = np.tile(np.arange(1, h + 1), K)
        out = {
            k: np.repeat([kr[i] for kr in key_rows], h)
            for i, k in enumerate(keys)
        }
        out["step"] = steps.astype("int32")
        out["yhat"] = fc.reshape(-1)
        out["bucket_start"] = pd.to_datetime(
            np.repeat(last_ts, h) + steps * np.repeat(step_secs, h), unit="s"
        )
        return pd.DataFrame(out)

    return sel.groupBy("_b").applyInPandas(run, schema=out_schema)


def forecast_residual_anomalies(
    tier_df: DataFrame,
    key_cols: tuple[str, ...] = ("url",),
    ts_col: str = "bucket_start",
    value_col: str = "point_count",
    alpha: float = 0.5,
    beta: float = 0.1,
    gamma: float | None = None,
    period: int | None = None,
    n_mads: float = 6.0,
    n_buckets: int = N_FORECAST_BUCKETS,
) -> DataFrame:
    """Model-based anomaly flags: one-step-ahead Holt(-Winters)
    residuals thresholded at ``n_mads`` robust deviations — the
    production anomaly-detection shape (forecast the expected value,
    flag what the model could not have predicted). Complements the
    rolling z-score (spikes vs a trailing window) and CUSUM (slow
    drifts): a seasonal series' nightly dip never alarms here because
    the model EXPECTS it.

    Per point: (key..., bucket_start, value, yhat, residual, anomaly).
    Warm-up points (no prediction yet) carry null yhat and never flag.
    Threshold = median ± n_mads · MAD of the series' own residuals
    (robust: the anomalies being hunted don't inflate their own
    threshold the way a stddev would). Same transposed execution and
    regularity validation as :func:`holt_forecast`."""
    if gamma is not None and (period is None or period < 2):
        raise ValueError("seasonal mode needs period >= 2")
    min_len = (2 * period) if gamma is not None else 3
    keys = list(key_cols)
    sel = tier_df.select(
        *keys,
        F.col(ts_col).cast("timestamp").cast("long").alias("_ts"),
        F.col(value_col).cast("double").alias("_y"),
        F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int").alias("_b"),
    )
    out_schema = (
        ", ".join(f"{k} {tier_df.schema[k].dataType.simpleString()}" for k in keys)
        + ", bucket_start timestamp, value double, yhat double, "
          "residual double, anomaly boolean"
    )
    a, b, g, per, mn, nm = alpha, beta, gamma, period, min_len, n_mads

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {**{k: pd.Series(dtype="object") for k in keys},
             "bucket_start": pd.Series(dtype="datetime64[us]"),
             "value": pd.Series(dtype="float64"),
             "yhat": pd.Series(dtype="float64"),
             "residual": pd.Series(dtype="float64"),
             "anomaly": pd.Series(dtype="bool")}
        )
        if len(pdf) == 0:
            return empty
        pdf = pdf.sort_values([*keys, "_ts"], kind="mergesort")
        grp = pdf.groupby(keys, sort=False)
        lens_s = grp.size()
        keep = lens_s[lens_s >= mn]
        if len(keep) == 0:
            return empty
        K, T = len(keep), int(keep.max())
        y_mat = np.zeros((K, T), dtype=np.float64)
        lens = keep.to_numpy().astype(np.int64)
        idx_map = grp.indices
        rows_parts = []
        ts_np = pdf["_ts"].to_numpy()
        y_np = pdf["_y"].to_numpy()
        key_rows = []
        for r, kv in enumerate(keep.index):
            ridx = idx_map[kv]
            ts = ts_np[ridx]
            d = np.diff(ts)
            if len(d) and ((d != d[0]).any() or d[0] <= 0):
                raise ValueError(
                    f"irregular or non-increasing series for key {kv!r}: "
                    f"dedupe buckets / gap-fill first"
                )
            y_mat[r, : lens[r]] = y_np[ridx]
            key_rows.append(kv if isinstance(kv, tuple) else (kv,))
            rows_parts.append(ts)
        _, fitted = _fit_forecast_group(y_mat, lens, a, b, g, per, 1,
                                        return_fitted=True)
        resid = y_mat - fitted  # NaN in warm-up
        # robust per-series threshold from each series' own residuals
        med = np.nanmedian(np.where(np.arange(T)[None, :] < lens[:, None],
                                    resid, np.nan), axis=1)
        mad = np.nanmedian(
            np.abs(np.where(np.arange(T)[None, :] < lens[:, None],
                            resid, np.nan) - med[:, None]), axis=1)
        thr = nm * np.maximum(mad, 1e-12)
        anom = np.abs(resid - med[:, None]) > thr[:, None]
        out = {k: [] for k in keys}
        ts_out, v_out, f_out, r_out, a_out = [], [], [], [], []
        for r in range(K):
            L = lens[r]
            for i, k in enumerate(keys):
                out[k].append(np.repeat(key_rows[r][i], L))
            ts_out.append(rows_parts[r])
            v_out.append(y_mat[r, :L])
            f_out.append(fitted[r, :L])
            r_out.append(resid[r, :L])
            a_out.append(anom[r, :L] & ~np.isnan(fitted[r, :L]))
        return pd.DataFrame(
            {**{k: np.concatenate(v) for k, v in out.items()},
             "bucket_start": pd.to_datetime(np.concatenate(ts_out), unit="s"),
             "value": np.concatenate(v_out),
             "yhat": np.concatenate(f_out),
             "residual": np.concatenate(r_out),
             "anomaly": np.concatenate(a_out)}
        )

    return sel.groupBy("_b").applyInPandas(run, schema=out_schema)
