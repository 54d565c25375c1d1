"""Sliding-window analytics over per-key bucket series: range-based
moving aggregates and exact-integer rolling anomaly flags — the
continuous-query layer a monitoring UI runs over tier tables (PromQL
``avg_over_time`` / TimescaleDB continuous-aggregate dashboards).

Both operators are pure window plans: one shuffle on the series key,
whole-stage codegen, no Python in the row path. Arithmetic is integer /
decimal exact, so results are bit-identical across engines, partition
counts, and accumulation orders — the property every cross-cluster-size
run in this engine is held to.

Reference analogue: the reference maintains only cumulative and
latest-value aggregates per series (A1/A7,
``stake_history.py:76-79``); sliding windows over bucketed series are
engine-added capability (SURVEY §2.11 family).

Scale notes (10^12 rows): the window input is a TIER table (one row
per key × bucket), orders of magnitude smaller than raw; the window
shuffle partitions by series key, so skewed keys cost one hot
partition at worst — acceptable because per-key bucket counts are
bounded by the retention horizon (e.g. 1d tier × 2y ≈ 730 rows/key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_range_sum(
    tier: DataFrame,
    key_cols: list[str],
    order_col: str,
    range_secs: int,
    sum_cols: list[str],
    prefix: str = "mov_",
) -> DataFrame:
    """Trailing range-window sums over a bucket series: for each row,
    Σ of ``sum_cols`` across rows of the same key whose ``order_col``
    (epoch seconds) lies in ``[t - range_secs, t]``.

    RANGE (value-based) framing, not ROWS: a sparse series — buckets
    missing where nothing happened — still gets the correct trailing
    window, because absent buckets contribute nothing and present
    buckets outside the horizon are excluded by VALUE, not by row
    offset. A ROWS frame over a gappy series silently widens the time
    horizon per gap; this is the classic moving-average bug.

    Adds ``{prefix}{col}`` (long) per sum col and ``{prefix}n`` (long,
    rows in window)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).cast("long"))
        .rangeBetween(-range_secs, 0)
    )
    out = tier
    for c in sum_cols:
        out = out.withColumn(f"{prefix}{c}", F.sum(c).over(w).cast("long"))
    return out.withColumn(f"{prefix}n", F.count(F.lit(1)).over(w).cast("long"))


def rolling_anomaly_flags(
    tier: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    n_prev: int = 6,
    z2_threshold: int = 9,
    min_window: int = 4,
) -> DataFrame:
    """Rolling z-score outlier flag per series, EXACT in integers: the
    current value is compared against the mean/variance of the
    ``n_prev`` PRIOR rows (``ROWS BETWEEN n_prev PRECEDING AND 1
    PRECEDING``); a row is anomalous when z² > ``z2_threshold``.

    Two properties worth their comments:

    - the baseline window EXCLUDES the current row. Including it caps
      z² at n−1 (an extreme point inflates the variance it is measured
      against), so a 7-row window could literally never exceed z²=6 and
      a z>3 detector would be dead code.
    - the z² test is evaluated as a cross-multiplied integer
      inequality, never a float division: with S = Σ prior values and
      S2 = Σ prior squares over n rows,

          z² > T   ⇔   (n·x − S)² > T · (n·S2 − S²)

      (both sides scale-free in n²·Var). Computed in decimal(38,0)
      (Spark) / HUGEINT (DuckDB-style oracles) the flag is bit-exact —
      no float-accumulation-order sensitivity between engines or
      parallelism levels. Zero prior variance ⇒ any deviation fires
      (RHS 0), equality never does (LHS 0).

    Requires ``value_col`` to be integer-typed (cents-scaled upstream).
    Adds ``n_win`` (long, prior rows present) and ``is_anomaly`` (int
    0/1; 0 whenever n_win < ``min_window``)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).cast("long"))
        .rowsBetween(-n_prev, -1)
    )
    dec = "decimal(38,0)"
    x = F.col(value_col).cast(dec)
    n = F.count(F.lit(1)).over(w).cast(dec)
    s1 = F.sum(F.col(value_col).cast(dec)).over(w)
    s2 = F.sum((F.col(value_col).cast(dec) * F.col(value_col).cast(dec))).over(w)
    lhs = (n * x - s1) * (n * x - s1)
    rhs = F.lit(z2_threshold).cast(dec) * (n * s2 - s1 * s1)
    flag = (
        F.when(
            (F.col("n_win") >= min_window) & (lhs > rhs), F.lit(1)
        ).otherwise(F.lit(0))
    ).cast("int")
    return (
        tier.withColumn("n_win", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("is_anomaly", flag)
    )


def cusum_drift(
    tier: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    slack_x1000: int = 0,
) -> DataFrame:
    """One-sided CUSUM drift statistic per series, EXACT in integers.

    Page's CUSUM S_t = max(0, S_{t-1} + (x_t − k)) flags sustained
    upward drift (each point slightly above the reference level k
    accumulates; isolated spikes decay). The recursion looks
    sequential, but the classic reflection identity makes it a pure
    window plan:

        S_t = C_t − min(0, min_{j<=t} C_j),   C_t = Σ_{i<=t} (x_i − k)

    — two running window aggregates, whole-stage codegen, one shuffle
    on the series key. No applyInPandas, no per-row anything.

    Exactness: k is the SERIES MEAN plus a slack of
    ``slack_x1000``/1000 standard-units of the raw value — but rather
    than dividing, everything is cross-multiplied: with n = series row
    count, T = series total, d'_t = 1000·n·x_t − 1000·T − slack·T
    ... kept simpler: slack is expressed per-mille of the mean, so

        d'_t = n·x_t·1000 − T·(1000 + slack_x1000)

    and S'_t = CUSUM(d') = 1000·n·CUSUM(x − mean·(1+slack/1000)).
    All integer (decimal(38,0)); bit-identical across engines and
    partitionings. Consumers threshold S'_t / (1000·n) in their own
    units.

    Adds ``cusum_scaled`` (decimal 38,0 → emitted as the raw scaled
    statistic). Reference analogue: none (engine-added monitoring op,
    SURVEY §2.11 family; pairs with rolling_anomaly_flags — z-score
    catches spikes, CUSUM catches slow drifts z-scores never see).
    """
    dec = "decimal(38,0)"
    wk = Window.partitionBy(*key_cols)
    worder = Window.partitionBy(*key_cols).orderBy(F.col(order_col).cast("long"))
    wrun = worder.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast(dec)
    n = F.count(F.lit(1)).over(wk).cast(dec)
    total = F.sum(x).over(wk)
    d = n * x * F.lit(1000).cast(dec) - total * F.lit(1000 + slack_x1000).cast(dec)
    c = F.sum(d).over(wrun)
    run_min = F.min(c).over(wrun)
    cusum = c - F.least(F.lit(0).cast(dec), run_min)
    return tier.withColumn("cusum_scaled", cusum)


def ewma_smooth(
    tier: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    window_k: int = 20,
    out_col: str = "ewma",
) -> DataFrame:
    """Finite-window EWMA smoothing per series — recursive smoothing
    expressed ENTIRELY with JVM higher-order array functions, no UDF.

    Spec (deterministic, engine-portable): over the trailing
    ``window_k`` rows of the series, seed with the OLDEST value in the
    window and fold forward ``acc·(1−α) + α·x``. Truncating the
    recursion at k rows bounds the state (the dropped tail's weight is
    (1−α)^k — at α=0.3, k=20 that is 8·10⁻⁴) and is what makes the
    operator a pure window expression instead of a sequential scan:

        collect_list(x) OVER (ROWS k−1 PRECEDING .. CURRENT)
        → aggregate(slice(arr, 2, size−1), arr[1], (acc, v) → …)

    Both Spark and the DuckDB oracle (``list()`` window +
    ``list_reduce``) execute the IDENTICAL fold order over IEEE
    doubles, so results match bit-for-bit before the ×1e4 rounding.

    Scale: the array is bounded at k elements per row; the plan is one
    shuffle on the series key. For unbounded-history EWMA use the
    stateful fold (operators/fold.py) — this operator is the
    dashboard-read form.

    Adds ``{out_col}_x1e4`` (long).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(order_col).cast("long"))
        .rowsBetween(-(window_k - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        lambda acc, v: acc * (F.lit(1.0) - a) + a * v,
    )
    return tier.withColumn(out_col + "_x1e4", F.round(folded * 10000, 0).cast("long"))


def series_correlation_pairs(
    tier: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Pairwise Pearson correlation between key series over their
    ALIGNED buckets (inner join on the time axis), emitted as EXACT
    integer sufficient statistics plus a convenience r².

    For each unordered pair (a < b) with n shared buckets:

        num  = n·Σxy − Σx·Σy
        den1 = n·Σx² − (Σx)²       den2 = n·Σy² − (Σy)²
        r²   = num² / (den1·den2),  sign(r) = sign(num)

    num/den1/den2 are computed in decimal(38,0) and emitted as BIGINT —
    bit-exact across engines and partitionings (the float r² column is
    convenience only; hash-gated consumers use the components). Callers
    feed a modestly-scaled integer measure (e.g. whole currency units,
    not cents) so n·Σx² stays inside 63 bits at their series length —
    documented contract, asserted nothing silently wraps by the
    decimal→long cast (Spark throws on overflow rather than wrapping).

    Plan: self-join of the tier on the bucket axis restricted to a < b
    (never a full cross of the key space: the join key is the BUCKET,
    so cost is Σ_bucket k_b² for k_b keys per bucket — at dashboard
    grain k is the handful of monitored series, the classic use). For
    wide key spaces, pre-filter to a candidate set first (same
    candidate-then-verify shape as the dedup pipeline).

    Reference analogue: none (engine-added monitoring analytics,
    SURVEY §2.11 family — "which metrics move together" is the first
    question an incident dashboard asks).
    """
    dec = "decimal(38,0)"
    left = tier.select(
        F.col(order_col).alias("_t"),
        F.col(key_col).alias("ka"),
        F.col(value_col).cast(dec).alias("x"),
    )
    right = tier.select(
        F.col(order_col).alias("_t"),
        F.col(key_col).alias("kb"),
        F.col(value_col).cast(dec).alias("y"),
    )
    pairs = left.join(right, "_t").where(F.col("ka") < F.col("kb"))
    return pair_suffstats(pairs, ["ka", "kb"])


def pair_suffstats(
    pairs: DataFrame,
    group_cols: list[str],
    convenience: bool = True,
) -> DataFrame:
    """Exact integer Pearson sufficient statistics per group over
    aligned (x, y) observation rows: n, num = n·Σxy − Σx·Σy, den1/den2
    — the one shared tail of every pair-correlation operator
    (:func:`series_correlation_pairs`, :func:`lead_lag_xcorr`,
    ``sax.motif_verify_pairs``), so the overflow contract and the r²
    guard live in exactly one place.

    ``pairs`` carries group_cols plus x, y already cast to
    decimal(38,0); with ``convenience`` the float r² and r_sign
    columns are appended (derived exactly from the integer components
    — hash-gated consumers use the components, never these).
    """
    dec = "decimal(38,0)"
    agg = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cols = [
        *group_cols,
        F.col("n").cast("long").alias("n"),
        num.cast("long").alias("num"),
        den1.cast("long").alias("den1"),
        den2.cast("long").alias("den2"),
    ]
    if convenience:
        r2 = F.when(
            (den1 > 0) & (den2 > 0),
            (num.cast("double") * num.cast("double"))
            / (den1.cast("double") * den2.cast("double")),
        )
        cols += [
            F.signum(num.cast("double")).cast("int").alias("r_sign"),
            r2.alias("r2"),
        ]
    return agg.select(*cols)


def mad_anomaly(
    df: DataFrame,
    key_cols: list[str],
    value_cents_col: str,
    k: int = 3,
) -> DataFrame:
    """Robust anomaly counting per key: median / MAD (median absolute
    deviation) instead of mean / stddev, so a handful of extreme values
    cannot drag the baseline toward themselves (the weakness of the
    z-score gate in ``rolling_anomaly_flags``-style detectors).

    Input values must be INTEGER cents (or any integer scale): medians
    of integers are exact half-integers in float64, |int − half-int|
    is exact, and k·MAD comparison is exact — so the anomaly count is
    bit-identical across engines and partitionings. A row is anomalous
    iff |v − median| > k · MAD (strict, so MAD = 0 with identical
    values flags only true deviants).

    Plan: three hash aggregations and two BROADCAST joins — the per-key
    stats frames carry one row per key (event_type / series id grain),
    tiny next to the fact side, so the fact never shuffles. EXACT
    ``percentile`` is used for oracle parity; at 10^12-row scale per-key
    exact medians buffer whole groups, so the scale path substitutes
    the KLL sketch tier (operators/sketches.py, same routed-serving
    shape as routed_p90) with rank-error-bounded medians — documented
    trade, same query shape.

    Reference analogue: none (the reference's only outlier handling is
    top-k truncation, ``stake_top100.py:56-61``); engine-added
    monitoring analytics (SURVEY §2.11 family).
    """
    v = F.col(value_cents_col)
    med = df.groupBy(*key_cols).agg(
        F.percentile(v, F.lit(0.5)).alias("_med")
    )
    dev = df.join(F.broadcast(med), key_cols).withColumn(
        "_adev", F.abs(v.cast("double") - F.col("_med"))
    )
    mad = dev.groupBy(*key_cols).agg(
        F.percentile(F.col("_adev"), F.lit(0.5)).alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), key_cols)
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.min("_med") * 2).cast("long").alias("med_cents_x2"),
            F.round(F.min("_mad") * 2).cast("long").alias("mad_cents_x2"),
            F.sum(
                F.when(F.col("_adev") > F.lit(float(k)) * F.col("_mad"), 1).otherwise(0)
            ).alias("n_anomalies"),
        )
    )


def lead_lag_xcorr(
    tier: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    lag_units: int,
) -> DataFrame:
    """Directed cross-correlation at a fixed lag: does series ``ka``
    LEAD series ``kb`` by ``lag_units`` of the order axis?  For every
    ordered pair (ka ≠ kb), x is ka's value at t and y is kb's value at
    t + lag, over the buckets where both exist; the output carries the
    same exact integer Pearson sufficient statistics as
    :func:`series_correlation_pairs` (num, den1, den2 in decimal(38,0)
    → BIGINT, float r² convenience only).

    ``lag_units`` is in ORDER-COLUMN units (epoch seconds for epoch
    buckets): feed a 1h-bucketed series and 3600 to ask "which metric's
    move shows up in which other metric an hour later" — the
    incident-dashboard question one step past "which move together".
    With ``lag_units=0`` this degenerates to the undirected operator
    (use that instead — it halves the pair space).

    Plan shape: the self-join key is the BUCKET (never the key space),
    shifted on the right side before the join so it stays a plain
    hash-join equi-key; cost is Σ_b k_b² like the undirected form.
    Same modest-integer-scale contract as series_correlation_pairs.

    Reference analogue: none (engine-added monitoring analytics,
    SURVEY §2.11 family).
    """
    dec = "decimal(38,0)"
    left = tier.select(
        F.col(order_col).alias("_t"),
        F.col(key_col).alias("ka"),
        F.col(value_col).cast(dec).alias("x"),
    )
    right = tier.select(
        (F.col(order_col) - F.lit(int(lag_units))).alias("_t"),
        F.col(key_col).alias("kb"),
        F.col(value_col).cast(dec).alias("y"),
    )
    pairs = left.join(right, "_t").where(F.col("ka") != F.col("kb"))
    return pair_suffstats(pairs, ["ka", "kb"])


def hampel_despike(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    id_col: str,
    value_cents_col: str,
    half_width: int = 3,
    k: int = 3,
    chunk_rows: int | None = None,
) -> DataFrame:
    """Hampel filter (rolling-median despike) per series: each point is
    compared against the MEDIAN of its ±``half_width``-row neighborhood
    and replaced by that median when it deviates by more than
    ``k`` × rolling MAD — the standard sensor-cleaning step before a
    series feeds rollups or forecasts. Where :func:`mad_anomaly` uses
    one GLOBAL median per key (level outliers), Hampel is LOCAL: a
    spike inside a trend is caught even though it is unremarkable
    globally.

    Exact integer arithmetic: input values are integer cents; medians
    over the (≤ 2w+1)-point window are computed as the SUM of the two
    middle order statistics (``*_x2``, always integer), the deviation
    test ``2·|2v − med2| > k·mad4`` is a pure integer comparison, and
    the cleaned series is emitted at ×2 scale — bit-identical across
    engines, partitionings, and cluster sizes. Gaussian-consistency
    scaling (×1.4826) is deliberately folded into the caller's choice
    of ``k`` to stay integer-exact.

    Plan: ONE shuffle (window partition on the series key), then
    whole-stage-codegen higher-order array functions (collect_list →
    array_sort → element_at / transform) — no Python in the row path.
    The frame is ROWS-based and ≤ 2w+1 wide, so per-row state is
    bounded regardless of series length; at 10^12 rows the cost is the
    one series-key shuffle every window operator in this module
    already pays (tier-table grain, see module docstring).

    Reference analogue: none (the reference stores raw observations
    untouched); engine-added cleaning (SURVEY §2.11 family).

    Output: key cols, ``order_col``, ``id_col``, the raw cents, the
    window size ``n_win``, ``med_cents_x2``, ``mad_cents_x4``,
    ``is_spike`` and ``clean_cents_x2`` (= med2 when spiked else 2·v).
    """
    v = F.col(value_cents_col)
    if chunk_rows is not None:
        # CHUNK-PARALLEL variant (optimization r06): a bounded ±w ROW
        # frame only ever needs ``half_width`` neighbor rows past a cut,
        # so each key's series splits into ``chunk_rows`` blocks that
        # compute independently — the cheap row-number pass stays on the
        # key-partitioned sort, but the EXPENSIVE per-row array stage
        # (collect_list + two array_sorts per row) runs at (key × chunk)
        # parallelism instead of |keys| tasks. Boundary rows replicate
        # to the adjacent chunk (≤ half_width rows per cut) and each
        # row's output is emitted only by its home chunk — results are
        # bit-identical to the single-window plan, including truncated
        # frames at true series ends. OFF by default: at the bench's
        # 1M rows × 5 keys the second exchange + explode cost exactly
        # offset the parallelism gain (2.0 s → 2.7 s measured); the
        # knob exists for key axes whose per-key series are long enough
        # that one key-task dominates a stage (hours, not seconds).
        assert chunk_rows > 2 * half_width, "chunk_rows must exceed the frame"
        wseq = Window.partitionBy(*key_cols).orderBy(F.col(order_col), F.col(id_col))
        base = df.withColumn("_rn", F.row_number().over(wseq))
        pos = (F.col("_rn") - 1) % chunk_rows
        home = F.floor((F.col("_rn") - 1) / chunk_rows).cast("long")
        offs = F.filter(
            F.array(F.lit(-1), F.lit(0), F.lit(1)),
            lambda o: (o == 0)
            | ((o == 1) & (pos < half_width) & (home > 0))
            | ((o == -1) & (pos >= chunk_rows - half_width)),
        )
        # o is the chunk the row SERVES relative to its own: o==1 means
        # "also serve the previous chunk's tail" → chunk home-1, o==-1
        # the next chunk's head → home+1
        spread = base.withColumn("_o", F.explode(offs)).withColumn(
            "_ck", home - F.col("_o")
        )
        w = (
            Window.partitionBy(*key_cols, "_ck")
            .orderBy("_rn")
            .rowsBetween(-half_width, half_width)
        )
        df = spread
        home_filter = F.col("_ck") == home
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(order_col), F.col(id_col))
            .rowsBetween(-half_width, half_width)
        )
        home_filter = None
    out = (
        df.withColumn("_arr", F.array_sort(F.collect_list(v).over(w)))
        .withColumn("n_win", F.size("_arr"))
        .withColumn(
            "med_cents_x2",
            F.element_at("_arr", (F.floor((F.col("n_win") - 1) / 2) + 1).cast("int"))
            + F.element_at("_arr", (F.floor(F.col("n_win") / 2) + 1).cast("int")),
        )
        .withColumn(
            "_adevs",
            F.array_sort(
                F.transform("_arr", lambda x: F.abs(2 * x - F.col("med_cents_x2")))
            ),
        )
        .withColumn(
            "mad_cents_x4",
            F.element_at("_adevs", (F.floor((F.col("n_win") - 1) / 2) + 1).cast("int"))
            + F.element_at("_adevs", (F.floor(F.col("n_win") / 2) + 1).cast("int")),
        )
        .withColumn(
            "is_spike",
            2 * F.abs(2 * v - F.col("med_cents_x2")) > F.lit(k) * F.col("mad_cents_x4"),
        )
        .withColumn(
            "clean_cents_x2",
            F.when(F.col("is_spike"), F.col("med_cents_x2")).otherwise(2 * v),
        )
    )
    if home_filter is not None:
        out = out.where(home_filter)
    return out.select(
        *key_cols,
        order_col,
        id_col,
        v.alias("v_cents"),
        "n_win",
        "med_cents_x2",
        "mad_cents_x4",
        "is_spike",
        "clean_cents_x2",
    )
