"""Robust per-group location statistics — rank-trimmed aggregates.

Web-crawl measurement series are outlier-ridden (a single mis-parsed
page reports a 2 GB byte_size; one stuck client replays a value 10^4
times), so tier summaries need location estimates that a bounded
fraction of junk cannot move. The mean has breakdown point 0; the
symmetric trimmed mean discards the k = floor(n·pct/100) most extreme
ranks on EACH side and averages the rest — breakdown point pct/100,
while staying fully order-statistics-exact (no iterative M-estimator).

Everything here is exact integer arithmetic over a caller-provided
integer value column (cents, bytes, micros — the engine convention:
contract.py "money/value sums are integer cents"), so the Spark plan
and a SQL oracle agree bit-for-bit regardless of accumulation order.

Scale shape: one shuffle on the group keys, a per-group rank window
(group-bounded — a (series, day) group is at most that day's events),
then a map-side-combinable agg on the SAME partitioning, which the
planner reuses (no second exchange). The companion of the exact
percentiles family (contract.percentiles_by_type_events); at 10^12
rows the streaming form routes through the KLL sketches in
operators/sketches.py, and this exact form is the oracle-checkable
one.

Reference analogue: the reference's per-tier summary stats
(rolled-up point counts / byte sizes, docs/provider_api.adoc) are
plain means; robust variants are engine-added hardening for the same
query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trimmed_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """Symmetric ``trim_pct``%-trimmed mean per group, rank-based and
    deterministic: rows are ranked by ``(value, tie)`` (the unique tie
    column makes the trim reproducible across engines and runs), the
    bottom and top ``k = floor(n·trim_pct/100)`` ranks are discarded,
    and the surviving values are summed exactly.

    Output per group: ``n`` (total rows), ``n_kept``, ``kept_sum``
    (exact integer sum of survivors), ``trimmed_mean_x100 =
    (kept_sum·100) intdiv n_kept``. ``n_kept`` is never 0: for n ≥ 1,
    2·floor(n·pct/100) < n whenever pct < 50.

    ``value_col`` must be an integer column (pre-scale floats to
    cents/micros at the call site).
    """
    if not 0 <= trim_pct < 50:
        raise ValueError(f"trim_pct must be in [0, 50), got {trim_pct}")
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_v").asc(), F.col("_tie").asc()
    )
    wg = Window.partitionBy(*group_cols)
    ranked = (
        df.select(*group_cols, F.col(value_col).alias("_v"),
                  F.col(tie_col).alias("_tie"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
    )
    k = F.floor(F.col("_n") * trim_pct / 100)
    kept = ranked.where(
        (F.col("_rn") > k) & (F.col("_rn") <= F.col("_n") - k)
    )
    return (
        kept.groupBy(*group_cols)
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("_v").cast("long").alias("kept_sum"),
        )
        .withColumn(
            "trimmed_mean_x100",
            F.expr("(kept_sum * 100) div n_kept").cast("long"),
        )
    )
