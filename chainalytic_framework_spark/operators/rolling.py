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
