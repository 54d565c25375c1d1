"""Counter semantics over per-key bucket series: monotonic-counter
deltas with RESET detection, windowed increase, and time-weighted
averages — the PromQL ``increase()``/``rate()`` / TimescaleDB
``time_weight()`` family, expressed as lag/window plans over tier
tables.

A crawl-scale metric pipeline meets counters constantly (bytes
fetched, pages seen, per-host request counters that reset on restart).
The operators here are pure window expressions — one shuffle on the
series key, whole-stage codegen, integer-exact arithmetic (no float
drift between engines or cluster sizes).

Reference analogue: the reference's cumulative sums (A1
``total_staking``) never handle resets — engine-added capability
(SURVEY §2.11 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def counter_delta(
    obs: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    value_col: str,
) -> DataFrame:
    """Per-row increase of a monotonic counter with reset detection:
    delta = v - lag(v), except when the counter went DOWN (process
    restart) — then the new value IS the increase since the reset
    (PromQL semantics). First row per key: no prior point, delta NULL.

    ``order_col`` may be a list — pass a composite key whenever the
    primary order column can tie (equal timestamps), or the lag pairing
    is partition-order-dependent and results flap across runs.

    Adds ``delta`` (long, nullable) and ``reset`` (boolean)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    prev = F.lag(value_col).over(w)
    v = F.col(value_col)
    reset = prev.isNotNull() & (v < prev)
    delta = F.when(prev.isNull(), F.lit(None).cast("long")).otherwise(
        F.when(reset, v).otherwise(v - prev)
    )
    return obs.withColumn("delta", delta.cast("long")).withColumn("reset", reset)


def counter_increase(
    obs: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    value_col: str,
    bucket_secs: int,
) -> DataFrame:
    """Windowed ``increase()``: sum of reset-corrected deltas per
    (key, coarse bucket). The per-row delta stage and this aggregation
    share the same key shuffle; the output is a tier-shaped table
    (key cols, bucket_epoch, increase)."""
    d = counter_delta(obs, key_cols, order_col, value_col)
    first_order = order_col if isinstance(order_col, str) else order_col[0]
    bucket = (F.col(first_order) / bucket_secs).cast("long") * bucket_secs
    return (
        d.withColumn("bucket_epoch", bucket)
        .groupBy(*key_cols, "bucket_epoch")
        .agg(
            F.coalesce(F.sum("delta"), F.lit(0)).cast("long").alias("increase"),
            F.sum(F.when(F.col("reset"), 1).otherwise(0)).cast("long").alias("resets"),
        )
    )


def time_weighted_avg_x1e4(
    obs: DataFrame,
    key_cols: list[str],
    order_col: str | list[str],
    value_col: str,
) -> DataFrame:
    """Time-weighted average per key over an irregular series (LOCF
    weighting: each value holds until the next observation). Returns
    integer-exact components — ``twa_num`` = Σ v_i·Δt_i and ``twa_den``
    = Σ Δt_i — plus ``twa_x1e4`` = floor(num·1e4/den), so the result is
    bit-identical across engines (no float accumulation order
    sensitivity). Keys with a single observation have den 0 and a NULL
    twa (no interval to weight). ``order_col`` may be composite — on a
    timestamp tie, which value spans to the next point depends on the
    tiebreak, so pass one whenever ties are possible."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    nxt = F.lead(order_cols[0]).over(w)
    seg = obs.withColumn("_dt", (nxt - F.col(order_cols[0])).cast("long"))
    agg = seg.groupBy(*key_cols).agg(
        F.coalesce(F.sum(F.col(value_col) * F.col("_dt")), F.lit(0))
        .cast("long")
        .alias("twa_num"),
        F.coalesce(F.sum("_dt"), F.lit(0)).cast("long").alias("twa_den"),
    )
    return agg.withColumn(
        "twa_x1e4",
        F.when(
            F.col("twa_den") > 0,
            F.floor(F.col("twa_num") * 10000 / F.col("twa_den")).cast("long"),
        ),
    )
