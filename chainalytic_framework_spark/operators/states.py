"""State-duration accounting: time spent in each state per entity.

The TimescaleDB ``state_agg`` / flink CEP "state dwell time" analogue:
each entity (user, url, device) emits typed events over time; the
duration of a state is the gap from its event to the entity's NEXT
event (the state it transitions into). The last event of an entity has
an open-ended state — no duration can be attributed, so it is excluded
(flagged, never fabricated), mirroring the engine's no-fabrication rule
for gap-fill (operators/gapfill.py).

Reference analogue: the reference tracks transitions implicitly —
0↔positive stake transitions increment wallet counts
(``/root/reference/zones/public-icon/aggregator/transform_registry/stake_history.py:130-133``)
and ``passive_stake_wallets`` sorts by inactive DURATION
(``zones/public-icon/warehouse/storage.py:357-381``) — but never
accounts total time-in-state; engine-added (SURVEY §2.11 family).

Scale notes (10^12 rows):
- One shuffle on the entity key; ``lead`` needs a per-key sort, whose
  cost is bounded by per-entity event counts (crawl revisits per url —
  thousands, not billions).
- ``state_totals`` re-aggregates intervals with a plain hash agg;
  durations are integer epoch-second differences — exact across any
  parallelism level.
- Skewed entities (one user with millions of events) cost one fat sort
  task; mitigate upstream by time-slicing the input per run (the
  pipeline's pending-bucket loop already bounds rows per run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def state_intervals(
    events: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Per-entity state intervals: one row per event that has a
    successor, with the epoch-second duration until that successor.

    ``tie_col`` (unique) makes the ordering total, so durations are
    deterministic under timestamp ties.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        events.select(key_col, state_col, ts_col, tie_col)
        .withColumn("_next_ts", nxt)
        .where(F.col("_next_ts").isNotNull())
        .select(
            key_col,
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("entered_ts"),
            # floor-of-epoch on each side (NTZ-safe cast chain, matching
            # contract._epoch) so integer durations are engine-exact
            (
                F.col("_next_ts").cast("timestamp").cast("long")
                - F.col(ts_col).cast("timestamp").cast("long")
            ).alias("duration_secs"),
        )
    )


def state_totals(intervals: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Total attributed time per state (optionally per extra grouping
    columns): interval count + summed integer seconds."""
    keys = (by or []) + ["state"]
    return intervals.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("duration_secs").alias("total_secs"),
    )


def gap_stats(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_col: str,
    gap_threshold_secs: int,
) -> DataFrame:
    """Heartbeat gap / uptime accounting per entity: inter-event
    deltas above ``gap_threshold_secs`` are outages. Exact integers:

    - ``span_secs``   — last obs − first obs
    - ``covered_secs``— Σ of deltas ≤ threshold (the "alive" time)
    - ``n_gaps``      — number of deltas > threshold
    - ``max_gap_secs``— worst outage (0 if none)
    - ``uptime_x1e4`` — (covered·10⁴) intdiv span (0 when span is 0)

    The monitoring-console counterpart of :func:`state_intervals` —
    same one-window-shuffle-plus-agg plan, same open-ended-last-event
    exclusion (a silent source is indistinguishable from a dead one
    until its next heartbeat; nothing is fabricated).
    """
    ep = F.col(ts_col).cast("timestamp").cast("long")
    d = (
        events.select(*key_cols, ep.alias("_ep"), F.col(tie_col).alias("_tie"))
        .withColumn(
            "_dt",
            F.lead("_ep").over(
                Window.partitionBy(*key_cols).orderBy("_ep", "_tie")
            )
            - F.col("_ep"),
        )
        .where(F.col("_dt").isNotNull())
    )
    thr = F.lit(gap_threshold_secs)
    g = d.groupBy(*key_cols).agg(
        F.sum("_dt").cast("long").alias("span_secs"),
        F.sum(F.when(F.col("_dt") <= thr, F.col("_dt")).otherwise(0))
        .cast("long")
        .alias("covered_secs"),
        F.sum(F.when(F.col("_dt") > thr, 1).otherwise(0))
        .cast("long")
        .alias("n_gaps"),
        F.coalesce(
            F.max(F.when(F.col("_dt") > thr, F.col("_dt"))), F.lit(0)
        )
        .cast("long")
        .alias("max_gap_secs"),
    )
    return g.withColumn(
        "uptime_x1e4",
        F.when(F.col("span_secs") <= 0, F.lit(0))
        .otherwise(
            F.expr("(covered_secs * 10000) div span_secs")
        )
        .cast("long"),
    )


def tier_coverage(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tier_secs: int = 60,
    day_secs: int = 86400,
) -> DataFrame:
    """Per-(key, day) tier COMPLETENESS against the expected bucket
    grid — the continuous-aggregate freshness/SLA table every tier
    engine publishes next to the tiers themselves: of the
    ``day_secs/tier_secs`` buckets a day should hold at this tier, how
    many have at least one observation, and how long is the worst
    contiguous missing run? The grid-completeness dual of
    :func:`gap_stats` (that measures inter-EVENT deltas per entity;
    this measures presence against the TIER's fixed grid — the thing
    gap-fill, retention routing, and the monitoring console key off).

    Exact integers per (key, day):

    - ``n_present``  — distinct tier buckets with ≥1 event
    - ``expected``   — day_secs / tier_secs (1440 for 1m)
    - ``coverage_x1e4`` — (n_present·10⁴) intdiv expected
    - ``longest_missing_buckets`` — max contiguous missing run,
      counting the leading run (day start → first observation) and the
      trailing run (last observation → day end); a day seen only at
      minute 0 scores 1439.

    Days with zero events for a key do not appear (nothing is
    fabricated); the serving layer's gap-fill decides what to do with
    absent days, exactly as with absent buckets.

    Scale: distinct (key, day, bucket) is one map-side-combinable agg;
    the lag window is bounded by ``expected`` rows per group (1440 at
    1m) regardless of event volume; the final agg reuses the window's
    partitioning. Reference analogue: the reference's console reports
    per-transform progress/freshness (cli/console.py) but has no
    per-series completeness table; engine-added (SURVEY §2.11 family).
    """
    if not 0 < tier_secs <= day_secs or day_secs % tier_secs:
        # a tier coarser than the period has expected=0 (the old code
        # generated 'div 0', which throws under Spark 4 ANSI mode); a
        # non-dividing tier mis-counts the grid — both are caller errors
        raise ValueError(
            f"tier_secs={tier_secs} must divide and not exceed "
            f"day_secs={day_secs}; for tiers coarser than a day, pass a "
            f"day_secs equal to a multiple of the tier (the SLA period)"
        )
    ep = F.col(ts_col).cast("timestamp").cast("long")
    present = events.select(
        *key_cols,
        (F.floor(ep / day_secs) * day_secs).cast("long").alias("day_epoch"),
        (F.floor(ep / tier_secs) * tier_secs).cast("long").alias("_b"),
    ).distinct()
    w = Window.partitionBy(*key_cols, "day_epoch").orderBy("_b")
    # missing run immediately BEFORE each present bucket; the synthetic
    # previous bucket day_epoch - tier makes the first row's run the
    # leading gap from day start
    runs = present.withColumn(
        "_gap_before",
        (
            F.col("_b")
            - F.coalesce(
                F.lag("_b").over(w), F.col("day_epoch") - F.lit(tier_secs)
            )
        )
        / tier_secs
        - 1,
    )
    expected = day_secs // tier_secs
    g = runs.groupBy(*key_cols, "day_epoch").agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.max("_gap_before").cast("long").alias("_max_internal"),
        F.max("_b").alias("_last"),
    )
    trailing = (
        F.lit(expected - 1)
        - (F.col("_last") - F.col("day_epoch")) / tier_secs
    ).cast("long")
    return g.select(
        *key_cols,
        "day_epoch",
        "n_present",
        F.lit(expected).cast("long").alias("expected"),
        F.expr(f"(n_present * 10000) div {expected}").cast("long")
        .alias("coverage_x1e4"),
        F.greatest(F.col("_max_internal"), trailing).cast("long")
        .alias("longest_missing_buckets"),
    )


def alert_episodes(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    hi: int,
    lo: int,
) -> DataFrame:
    """Threshold alerting with HYSTERESIS over a per-key series: an
    alert episode OPENS when value ≥ ``hi`` and stays open — through
    the (lo, hi) dead band — until value ≤ ``lo``. The two-threshold
    gate is the standard monitoring idiom (Prometheus/Grafana alert
    rules, thermostat control): a single threshold flaps on every
    noise crossing, hysteresis converts flapping into episodes.

    Emits one row per episode: (keys..., episode [1-based per key],
    episode_start, episode_end [last bucket at-or-above the gate],
    n_buckets, peak_value). Rows inside the dead band extend an open
    episode but never start one; a series that ends while firing emits
    its episode with the last observed bucket as the end (open-ended,
    consistent with the engine's no-fabrication rule).

    Exact/deterministic: the state recursion collapses to
    last(flag ignorenulls) over the ordered frame — pure integer
    comparisons, no floats; ``order_col`` must be unique per key
    (bucket grids are). ONE window family (partitionBy keys, orderBy
    t: state carry, open detection, episode numbering share a single
    exchange + sort) + one groupBy bounded by series length per key —
    the same scale shape as every gaps-and-islands operator here.

    Reference analogue: none — monitoring/serving tooling over the
    rolled tiers (SURVEY §2.11 family; the episode dual of the
    point-flag monitors rolling.cusum_drift / rolling.mad_anomaly).
    """
    if lo >= hi:
        raise ValueError(f"hysteresis requires lo < hi: lo={lo} hi={hi}")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    flag = (
        F.when(F.col(value_col) >= hi, F.lit(1))
        .when(F.col(value_col) <= lo, F.lit(0))
    )
    cur = series.withColumn(
        "_st", F.coalesce(F.last(flag, ignorenulls=True).over(cum), F.lit(0))
    )
    opened = (
        (F.col("_st") == 1)
        & (F.coalesce(F.lag("_st").over(w), F.lit(0)) == 0)
    ).cast("int")
    cur = cur.withColumn("_ep", F.sum(opened).over(cum))
    return (
        cur.where(F.col("_st") == 1)
        .groupBy(*key_cols, "_ep")
        .agg(
            F.min(order_col).alias("episode_start"),
            F.max(order_col).alias("episode_end"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max(value_col).cast("long").alias("peak_value"),
        )
        .select(
            *key_cols,
            F.col("_ep").cast("long").alias("episode"),
            "episode_start",
            "episode_end",
            "n_buckets",
            "peak_value",
        )
    )
