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
