"""Trend extraction over per-key series: exact-integer linear fits
(slope + signed r²), lag-k autocorrelation pairs, and batch CUSUM
changepoint detection.

These are the TimescaleDB ``stats_agg`` (slope/corr) and changepoint
analogues a monitoring layer runs over the engine's tier tables —
siblings of the counter semantics in ``operators/counters.py``
(PromQL increase / time_weight), the pairwise cross-series correlation
in ``operators/rolling.py::series_correlation_pairs``, and the
SEQUENTIAL drift detector ``rolling.py::cusum_drift`` (this module's
:func:`changepoint` is the batch single-split-point argmax instead).
The reference keeps only cumulative and latest-value aggregates per
series
(``/root/reference/zones/public-icon/aggregator/transform_registry/stake_history.py:76-79``);
trend extraction is engine-added capability (SURVEY §2.11 family).

Cross-engine exactness: every statistic is computed in integer /
decimal(38,0) arithmetic — sufficient statistics (n, Σx, Σy, Σxy, Σx²,
Σy²) are exact integers, and derived ratios (slope, signed r²) are
emitted as ``sign(num) * (|num| * 10⁴) intdiv den`` — truncating
integer division of exact integers, bit-identical across engines,
partition counts, and accumulation orders. No float ever enters an
aggregation, so results are stable at any parallelism level (the
cross-cluster-size invariant this engine is held to).

Scale notes (10^12 rows):
- ``linfit`` is a single map-side-combinable hash agg (no window, no
  sort): the 6 sufficient statistics fold associatively, so Spark's
  partial aggregation does the heavy lifting before the shuffle.
- ``changepoint`` runs over TIER tables (one row per key × bucket),
  orders of magnitude smaller than raw; two same-partitioned windows +
  one agg = one shuffle total.
- decimal(38,0) headroom: products like num² × 10⁴ stay within 38
  digits when |y| ≤ ~10⁶ per point and per-key point counts ≤ ~10⁶
  (the tier-table regime). For raw-scale fits, rebase x per key (the
  callers here pass minute-of-day / bucket values, already small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _suffstats(df: DataFrame, key_cols: list[str], x_col: str, y_col: str) -> DataFrame:
    """Exact integer sufficient statistics per key. Per-row products are
    computed in decimal(38,0) — NOT int64, whose silent (non-ANSI)
    wraparound above 2⁶³ would diverge from the oracle's HUGEINT with
    no error; decimal overflow fails loudly instead — and summed in
    decimal(38,0); the agg is associative → map-side combinable."""
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    p = df.select(
        *key_cols,
        x.alias("_x"),
        y.alias("_y"),
        (x * y).alias("_xy"),
        (x * x).alias("_xx"),
        (y * y).alias("_yy"),
    )
    dec = lambda c: F.sum(F.col(c).cast(_DEC))  # noqa: E731
    return p.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        dec("_x").alias("sx"),
        dec("_y").alias("sy"),
        dec("_xy").alias("sxy"),
        dec("_xx").alias("sxx"),
        dec("_yy").alias("syy"),
    )


def linfit(
    df: DataFrame, key_cols: list[str], x_col: str, y_col: str,
    r2_col: str = "r2_signed_x1e4",
) -> DataFrame:
    """Per-key least-squares slope and signed r², exact.

    ``slope_x1e4`` = sign · (|n·Σxy − Σx·Σy| · 10⁴) intdiv (n·Σx² − Σx²);
    ``r2_signed_x1e4`` = sign · (num² · 10⁴) intdiv (denx · deny) — the
    squared Pearson correlation carrying the covariance sign (sqrt-free,
    so the whole computation stays in integer arithmetic).
    Degenerate keys (constant x or y, or zero covariance) emit 0.
    """
    s = _suffstats(df, key_cols, x_col, y_col)
    d = s.select(
        *key_cols,
        F.col("n").cast("long").alias("n_points"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("_denx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("_deny"),
    )
    sgn = F.when(F.col("_num") < 0, -1).otherwise(1)
    zero = (F.col("_num") == 0) | (F.col("_denx") == 0)
    slope = F.when(zero, F.lit(0)).otherwise(
        sgn * F.expr("(abs(_num) * 10000) div _denx")
    )
    r2 = F.when(zero | (F.col("_deny") == 0), F.lit(0)).otherwise(
        sgn * F.expr("(_num * _num * 10000) div (_denx * _deny)")
    )
    return d.select(
        *key_cols,
        "n_points",
        slope.cast("long").alias("slope_x1e4"),
        r2.cast("long").alias(r2_col),
    )


def acf_lag(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    lag_secs: int,
) -> DataFrame:
    """Lag-k autocorrelation pairs over a bucket series: joins each
    bucket's value with the same key's value exactly ``lag_secs``
    earlier (a bucket-key equi-join, NOT a row-offset lag — robust to
    gaps in the series). Feed the result to :func:`linfit` for the
    signed-r² autocorrelation (r² of v_t vs v_{t−k} ≈ ACF², seasonality
    shows as a strong positive at the period).

    One shuffle: both sides hash-partition on (key, bucket-ish); the
    join key carries the lag on the right side.
    """
    left = tier.select(
        *key_cols, F.col(bucket_col).alias("_b"), F.col(value_col).alias("_y")
    )
    right = tier.select(
        *key_cols,
        (F.col(bucket_col) + F.lit(lag_secs)).alias("_b"),
        F.col(value_col).alias("_x"),
    )
    return left.join(right, [*key_cols, "_b"]).select(*key_cols, "_x", "_y")


def changepoint(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Batch CUSUM changepoint per key: the bucket k maximising
    |n·S_k − k·T| (S_k = prefix sum, T = total, n = bucket count) — the
    cross-multiplied, float-free form of "cumulative deviation from the
    mean", whose argmax is the classic single-changepoint estimate.
    The last bucket is excluded (its deviation is identically 0).

    Ties break to the earliest bucket. Two windows + one agg, all on the
    same key partitioning → one shuffle.
    """
    wall = Window.partitionBy(*key_cols)
    v = F.col(value_col).cast(_DEC)
    d = (
        tier.select(*key_cols, F.col(bucket_col).alias("bucket_epoch"), v.alias("_c"))
        .select(
            *key_cols,
            "bucket_epoch",
            F.sum("_c").over(
                Window.partitionBy(*key_cols).orderBy("bucket_epoch")
            ).alias("_s"),
            F.row_number().over(
                Window.partitionBy(*key_cols).orderBy("bucket_epoch")
            ).cast(_DEC).alias("_k"),
            F.sum("_c").over(wall).alias("_t"),
            F.count(F.lit(1)).over(wall).cast(_DEC).alias("_n"),
        )
        .where(F.col("_k") < F.col("_n"))
        .select(
            *key_cols,
            "bucket_epoch",
            F.abs(F.col("_n") * F.col("_s") - F.col("_k") * F.col("_t")).alias("_adev"),
        )
    )
    best = d.groupBy(*key_cols).agg(
        F.max(F.struct(F.col("_adev"), (-F.col("bucket_epoch")).alias("_nb"))).alias("_m")
    )
    return best.select(
        *key_cols,
        (-F.col("_m._nb")).cast("long").alias("change_epoch"),
        F.col("_m._adev").cast("long").alias("abs_dev"),
    )


def seasonal_naive_backtest(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    step_secs: int,
    period_secs: int,
) -> DataFrame:
    """Forecast-skill evaluation, exactly: backtest the SEASONAL-NAIVE
    forecast (v̂(t) = v(t − period)) against the one-step NAIVE baseline
    (v̂(t) = v(t − step)) over a bucket series. Evaluates only buckets
    where BOTH forecasts exist (bucket-key alignment — gap-robust like
    :func:`acf_lag`), so the error sums are directly comparable; the
    skill ratio is the MASE numerator/denominator in truncating integer
    division:

        mase_x1e4 = (Σ|v − v(t−period)| · 10⁴) intdiv (Σ|v − v(t−step)|)

    < 10000 ⇒ the seasonal model beats persistence — the go/no-go gate
    before spending on a fitted model (operators/forecast.py). Values
    must be integers; everything is BIGINT-exact.

    Plan: NOT self-joins — each input row explodes into its three roles
    (the value at t; the naive source for t+step; the seasonal source
    for t+period) and one conditional agg on (key, target-bucket)
    reassembles the triple. ONE scan of the tier instead of three (a
    self-join plan re-reads the input per branch — 3× the I/O at
    10^12 rows), two bounded shuffles, rows only triple on the already
    tier-sized relation. Requires (key, bucket) unique — a tier is.
    """
    v, b = F.col(value_col), F.col(bucket_col)
    contrib = tier.select(
        *key_cols,
        F.explode(
            F.array(
                F.struct(b.alias("tb"), F.lit(0).alias("role")),
                F.struct((b + step_secs).alias("tb"), F.lit(1).alias("role")),
                F.struct((b + period_secs).alias("tb"), F.lit(2).alias("role")),
            )
        ).alias("_e"),
        v.alias("_val"),
    )
    role = F.col("_e.role")
    triple = contrib.groupBy(*key_cols, F.col("_e.tb").alias("_b")).agg(
        F.max(F.when(role == 0, F.col("_val"))).alias("_v"),
        F.max(F.when(role == 1, F.col("_val"))).alias("_vn"),
        F.max(F.when(role == 2, F.col("_val"))).alias("_vs"),
    )
    j = triple.where(
        F.col("_v").isNotNull()
        & F.col("_vn").isNotNull()
        & F.col("_vs").isNotNull()
    )
    g = j.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(F.abs(F.col("_v") - F.col("_vs"))).cast("long").alias("abs_err_seasonal"),
        F.sum(F.abs(F.col("_v") - F.col("_vn"))).cast("long").alias("abs_err_naive"),
    )
    return g.withColumn(
        "mase_x1e4",
        F.when(F.col("abs_err_naive") == 0, F.lit(None))
        .otherwise(F.expr("(abs_err_seasonal * 10000) div abs_err_naive"))
        .cast("long"),
    )


def max_drawdown(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
) -> DataFrame:
    """Maximum drawdown of a per-key cumulative series: the largest
    peak-to-trough fall of Σv over the bucket order — the
    running-extremum ordered analytic (finance's risk metric; for an
    ops series it answers "worst cumulative shortfall vs the
    high-water mark"). Exact integers throughout:

        cum_t   = Σ_{s≤t} v_s
        dd_t    = max_{s≤t}(cum_s) − cum_t   (≥ 0)
        output  = per key: max_drawdown, trough_epoch (earliest bucket
                  attaining it), final_cum, n_buckets

    One key-partitioned window family (running sum + running max share
    the ordering/partitioning) + one struct-max agg on the same
    partitioning → one shuffle. Per-key cost linear in series length
    (bounded by the retention horizon on tier tables).
    """
    v = F.col(value_col).cast("long")
    d = (
        tier.select(*key_cols, F.col(bucket_col).alias("bucket_epoch"), v.alias("_v"))
        .withColumn("_cum", F.sum("_v").over(
            Window.partitionBy(*key_cols).orderBy("bucket_epoch")))
        .withColumn("_peak", F.max("_cum").over(
            Window.partitionBy(*key_cols).orderBy("bucket_epoch")))
        .withColumn("_dd", F.col("_peak") - F.col("_cum"))
    )
    best = d.groupBy(*key_cols).agg(
        F.max(
            F.struct(F.col("_dd"), (-F.col("bucket_epoch")).alias("_nb"))
        ).alias("_m"),
        F.max(F.struct(F.col("bucket_epoch"), F.col("_cum"))).alias("_last"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    return best.select(
        *key_cols,
        F.col("_m._dd").cast("long").alias("max_drawdown"),
        (-F.col("_m._nb")).cast("long").alias("trough_epoch"),
        F.col("_last._cum").cast("long").alias("final_cum"),
        "n_buckets",
    )


def spearman(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    order_col: str,
) -> DataFrame:
    """Per-key Spearman rank correlation of paired observations,
    integer-exact. Ranks are assigned by ``row_number`` ordered by
    ``(value, order_col)`` — a TOTAL deterministic order, so ties take
    consecutive ranks by the tiebreak column instead of float midranks
    (documented variant; bit-identical across engines and cluster
    sizes, which midrank averaging in float is not). Then

        rho_x1e4 = sign(num) * (|num| * 10^4) intdiv den
        num = (n^3 - n) - 6*sum(d^2),   den = n^3 - n,   d = rank_x - rank_y

    Keys with n < 2 emit rho NULL. Robustness complement to
    :func:`linfit`'s Pearson r^2: monotone-but-nonlinear drift (a
    series accelerating toward saturation) still scores |rho| ~ 1.

    Scale: two row_number windows + one agg, ALL partitioned by the
    same key columns -> one shuffle; per-key cost is the sort of that
    key's series (bounded by retention horizon on tier tables).
    """
    wx = Window.partitionBy(*key_cols).orderBy(x_col, order_col)
    wy = Window.partitionBy(*key_cols).orderBy(y_col, order_col)
    d = (
        df.select(*key_cols, x_col, y_col, order_col)
        .withColumn("_rx", F.row_number().over(wx))
        .withColumn("_ry", F.row_number().over(wy))
        .withColumn("_d", (F.col("_rx") - F.col("_ry")).cast(_DEC))
    )
    g = d.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast(_DEC).alias("_n"),
        F.sum(F.col("_d") * F.col("_d")).alias("_sd2"),
    )
    den = F.col("_n") * F.col("_n") * F.col("_n") - F.col("_n")
    num = den - F.lit(6).cast(_DEC) * F.col("_sd2")
    sgn = F.when(num < 0, -1).otherwise(1)
    rho = F.when(F.col("_n") < 2, F.lit(None)).otherwise(
        sgn * F.expr(
            "(abs((_n*_n*_n - _n) - 6*_sd2) * 10000)"
            " div (_n*_n*_n - _n)"
        )
    )
    return g.select(
        *key_cols,
        F.col("_n").cast("long").alias("n_points"),
        rho.cast("long").alias("rho_x1e4"),
    )


def burst_windows(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    tier_secs: int,
    baseline_buckets: int = 24,
    mult_x1e4: int = 30000,
    min_base_buckets: int = 6,
) -> DataFrame:
    """Burst interval detection over a per-key bucket count series — a
    batch, integer-exact take on Kleinberg's burst model: a bucket is
    BURSTING when its count exceeds ``mult_x1e4/1e4`` times its own
    trailing per-bucket baseline, and consecutive bursting buckets
    merge into one reported interval (gaps-and-islands).

    Baseline is a RANGE window over bucket EPOCH (not row offsets, so
    series gaps shorten the baseline instead of silently reaching
    further back): buckets in [b - baseline_buckets*tier_secs,
    b - tier_secs]. The test is cross-multiplied to stay in exact
    integers — ``c * base_n * 1e4 >= mult_x1e4 * base_sum`` — and
    requires ``base_n >= min_base_buckets`` of observed history (cold
    starts never alarm). Output per interval: start/end epoch
    (end exclusive), n_buckets, peak and total counts.

    Scale: one RANGE window + one row_number window + one agg, all on
    the same key partitioning -> one shuffle of the TIER table (never
    raw). The Zipf-hot key costs one task sorting its own series only.
    """
    b = F.col(bucket_col).cast("long")
    v = F.col(value_col).cast(_DEC)
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_b"))
        .rangeBetween(-baseline_buckets * tier_secs, -tier_secs)
    )
    d = (
        tier.select(*key_cols, b.alias("_b"), v.alias("_c"))
        .withColumn("_bsum", F.sum("_c").over(wb))
        .withColumn("_bn", F.count("_c").over(wb).cast(_DEC))
    )
    is_burst = (
        (F.col("_bn") >= min_base_buckets)
        & (F.col("_c") * F.col("_bn") * F.lit(10000).cast(_DEC)
           >= F.lit(mult_x1e4).cast(_DEC) * F.col("_bsum"))
    )
    bursts = d.where(is_burst)
    rn = F.row_number().over(Window.partitionBy(*key_cols).orderBy("_b"))
    grp = (F.col("_b") - F.col("_rn") * F.lit(tier_secs)).alias("_grp")
    return (
        bursts.withColumn("_rn", rn)
        .withColumn("_grp", grp)
        .groupBy(*key_cols, "_grp")
        .agg(
            F.min("_b").alias("burst_start"),
            (F.max("_b") + F.lit(tier_secs)).alias("burst_end"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("_c").cast("long").alias("peak_count"),
            F.sum("_c").cast("long").alias("total_count"),
        )
        .drop("_grp")
    )


def theil_sen(
    tier: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Robust per-key trend over a bucket series: Theil–Sen median
    slope + the Mann–Kendall S statistic, exact-integer.

    Over all ordered pairs x_i < x_j of the key's series:

        slope_ij    = sign(dy) * (|dy| * 10^4) intdiv dx   (exact int)
        slope_x1e4  = lower median of slope_ij, tie-broken by (x_i, x_j)
                      — a total deterministic order, so the estimate is
                      bit-identical across engines and cluster sizes
        mk_s        = Σ sign(dy)  (Mann–Kendall: +n_conc − n_disc; |S|
                      near n_pairs ⇒ strong monotone trend)

    Unlike :func:`linfit`, one wild outlier bucket moves this estimate
    by at most one rank — the breakdown-point trade the monitoring
    literature makes for noisy operational series.

    Scale: the pair frame is a key-partitioned SELF-JOIN — quadratic in
    SERIES LENGTH, never in key count. Run it over TIER series (length
    bounded by the retention horizon: a 90-day daily series is 4,005
    pairs/key); the hot key costs one task of its own bounded pairs.
    One shuffle for the join + one window/agg family on the same keys.
    """
    a = tier.select(*key_cols, F.col(x_col).alias("_x1"),
                    F.col(y_col).cast(_DEC).alias("_y1"))
    b = tier.select(*key_cols, F.col(x_col).alias("_x2"),
                    F.col(y_col).cast(_DEC).alias("_y2"))
    pairs = a.join(b, key_cols).where(F.col("_x1") < F.col("_x2"))
    dy = F.col("_y2") - F.col("_y1")
    dx = (F.col("_x2") - F.col("_x1")).cast(_DEC)
    sgn = F.when(dy < 0, -1).when(dy > 0, 1).otherwise(0)
    p = pairs.select(
        *key_cols, "_x1", "_x2",
        (sgn * F.expr("(abs(_y2 - _y1) * 10000) div (_x2 - _x1)"))
        .cast("long").alias("_s"),
        sgn.alias("_sgn"),
    )
    wk = Window.partitionBy(*key_cols)
    r = p.select(
        *key_cols, "_s", "_sgn",
        F.row_number().over(wk.orderBy("_s", "_x1", "_x2")).alias("_rn"),
        F.count(F.lit(1)).over(wk).alias("_np"),
    )
    return r.groupBy(*key_cols).agg(
        F.max(F.when(F.col("_rn") == F.expr("(_np + 1) div 2"),
                     F.col("_s")).otherwise(None))
        .cast("long").alias("slope_x1e4"),
        F.sum("_sgn").cast("long").alias("mk_s"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )


def acf_spectrum(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    lag_secs_list: list[int],
) -> DataFrame:
    """Multi-lag autocorrelation spectrum in ONE pass: :func:`acf_lag`'s
    bucket-key lag join for EVERY candidate lag simultaneously (the
    right side replicates each bucket once per lag via an explode — a
    bounded len(lags) fan-out, not a per-lag rescan), then
    :func:`linfit`'s exact signed-r² per (key, lag).

    The seasonality question asked properly: "at WHICH period does this
    series echo?" — the argmax lag of ``r2_signed_x1e4`` is the detected
    period (daily vs weekly vs none), and the whole spectrum is one
    job instead of len(lags) jobs.

    One shuffle family: both join sides hash on (key, bucket); the
    suffstat agg groups on (key, lag) — map-side combinable. Exact
    integer arithmetic end-to-end (the linfit determinism contract).
    """
    lags = F.array(*[F.lit(int(s)) for s in lag_secs_list])
    left = tier.select(
        *key_cols, F.col(bucket_col).alias("_b"), F.col(value_col).alias("_y")
    )
    right = tier.select(
        *key_cols,
        F.explode(lags).alias("lag_secs"),
        F.col(bucket_col).alias("_b0"),
        F.col(value_col).alias("_x"),
    ).select(
        *key_cols, "lag_secs",
        (F.col("_b0") + F.col("lag_secs")).alias("_b"), "_x",
    )
    pairs = left.join(right, [*key_cols, "_b"])
    return linfit(pairs, [*key_cols, "lag_secs"], "_x", "_y")


def stl_decompose(
    tier: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    period: int = 7,
    step_secs: int = 86400,
) -> DataFrame:
    """STL-lite additive decomposition of a per-key bucket series into
    trend + seasonal + remainder — the classical-decomposition core of
    Cleveland et al.'s STL without the loess/robustness iterations
    (those need float fits; this stays in the module's exact-integer
    contract):

    - **trend** = centered ``period``-row moving average (``period``
      must be odd), defined only on INTERIOR, GAPLESS rows: the window
      must hold exactly ``period`` rows spanning exactly
      ``(period-1)*step_secs`` seconds, every window bucket distinct
      and on the step grid — a row next to a gap, a duplicate bucket,
      a misaligned bucket, or a series edge emits nothing (matching
      how classical decomposition leaves the half-window ends
      undefined; the distinct/grid guards make the span test
      sufficient, since a duplicate plus a gap can otherwise
      compensate each other).
    - **seasonal** = per-phase mean of the detrended series, where
      phase = (bucket div step_secs) mod period (day-of-week for
      daily buckets / period 7). Uncentered by design — the phase
      means of a detrended series already sum to ≈0, and skipping the
      second centering pass keeps every statistic a ratio of exact
      integers.
    - **remainder** = value − trend − seasonal.

    Exactness: with integer values v, ``trend = T/period`` (T the
    window sum), ``detrended×period = period·v − T`` (exact int),
    ``seasonal = S/(period·k)`` (S the phase sum of detrended×period
    over k rows), ``remainder = (period·k·v − k·T − S)/(period·k)`` —
    every emitted ``*_x1e4`` is sign·(|num|·10⁴) intdiv den of exact
    decimal(38,0) integers: bit-identical across engines, partition
    counts, and accumulation orders (the linfit determinism contract).

    Scale shape (10^12 raw rows): runs over a TIER table (one row per
    key × bucket). One window family partitioned by key (bounded by
    series length, never corpus-keyed) plus one unordered window over
    (key, phase) for the seasonal means — expressed as a window rather
    than a groupBy+self-join so the tier subtree is computed ONCE (no
    duplicated scan/agg branch, no broadcast); both windows are
    key-bounded, never corpus-keyed. The reference keeps only
    cumulative/latest aggregates per series (see module docstring);
    decomposition is engine-added capability (SURVEY §2.11 family).

    Output: (*key_cols, bucket_epoch, v = input value as long,
    trend_x1e4, seasonal_x1e4, remainder_x1e4) — interior rows only.
    """
    if period % 2 != 1:
        raise ValueError(f"period must be odd, got {period}")
    half = period // 2
    ord_w = Window.partitionBy(*key_cols).orderBy("_b")
    win = Window.partitionBy(*key_cols).orderBy("_b").rowsBetween(-half, half)
    base = tier.select(
        *key_cols,
        F.col(bucket_col).cast("long").alias("_b"),
        F.col(value_col).cast("long").alias("_v"),
    ).select(
        # interior-window validity guards (same sort as win, no extra
        # shuffle): duplicate-bucket flag and step-grid alignment flag.
        # tc==period AND span==(period-1)*step alone is NOT sufficient —
        # a duplicate bucket plus a gap can compensate each other (e.g.
        # buckets [0,0,1,2,3,4,6]·step: 7 rows, span 6·step, yet gapped
        # and double-counted). With every window bucket distinct AND on
        # the step grid, 7 rows spanning exactly 6·step ARE consecutive.
        "*",
        F.coalesce(
            (F.col("_b") == F.lag("_b", 1).over(ord_w)).cast("int"), F.lit(0)
        ).alias("_dup"),
        (F.pmod(F.col("_b"), F.lit(step_secs)) == 0).cast("int").alias("_alig"),
    )
    t = base.select(
        *key_cols,
        "_b",
        "_v",
        F.sum("_v").over(win).alias("_tnum"),
        F.count(F.lit(1)).over(win).alias("_tc"),
        (F.max("_b").over(win) - F.min("_b").over(win)).alias("_span"),
        F.sum("_dup").over(win).alias("_ndup"),
        F.min("_alig").over(win).alias("_walig"),
    )
    interior = t.where(
        (F.col("_tc") == period)
        & (F.col("_span") == (period - 1) * step_secs)
        & (F.col("_ndup") == 0)
        & (F.col("_walig") == 1)
    ).select(
        *key_cols,
        "_b",
        "_v",
        "_tnum",
        # alignment guard guarantees _b divisible by step_secs, so the
        # truncating `div` equals floor division — pmod of it matches
        # DuckDB's ((b // step) % p + p) % p for negative epochs too
        F.pmod(F.expr(f"_b div {step_secs}"), F.lit(period)).alias("_phase"),
        (F.lit(period) * F.col("_v") - F.col("_tnum")).cast(_DEC).alias("_det"),
    )
    pwin = Window.partitionBy(*key_cols, "_phase")
    j = interior.select(
        "*",
        F.sum("_det").over(pwin).alias("_snum"),
        F.count(F.lit(1)).over(pwin).cast(_DEC).alias("_scnt"),
    )
    sgn = lambda c: F.when(F.col(c) < 0, -1).otherwise(1)  # noqa: E731
    trend = F.when(F.col("_tnum") == 0, F.lit(0).cast("long")).otherwise(
        sgn("_tnum")
        * F.expr(f"(abs(cast(_tnum as {_DEC})) * 10000) div {period}")
    )
    seasonal = F.when(F.col("_snum") == 0, F.lit(0).cast("long")).otherwise(
        sgn("_snum") * F.expr(f"(abs(_snum) * 10000) div ({period} * _scnt)")
    )
    rnum = (
        F.lit(period) * F.col("_scnt") * F.col("_v").cast(_DEC)
        - F.col("_scnt") * F.col("_tnum").cast(_DEC)
        - F.col("_snum")
    )
    j = j.withColumn("_rnum", rnum)
    remainder = F.when(F.col("_rnum") == 0, F.lit(0).cast("long")).otherwise(
        sgn("_rnum") * F.expr(f"(abs(_rnum) * 10000) div ({period} * _scnt)")
    )
    return j.select(
        *key_cols,
        F.col("_b").alias("bucket_epoch"),
        F.col("_v").alias("v"),
        trend.cast("long").alias("trend_x1e4"),
        seasonal.cast("long").alias("seasonal_x1e4"),
        remainder.cast("long").alias("remainder_x1e4"),
    )
