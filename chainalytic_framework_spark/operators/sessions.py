"""Sessionization: split each key's event stream into sessions at
inactivity gaps, assign stable session ids, aggregate per session.

Pure window-function plan (one shuffle on the key):
    new_session = (ts - lag(ts) > gap) or first row
    session_no  = running sum of new_session per key
Session id is (key, session_no) — deterministic, order-independent.

Reference analogue: the recent-activity window W2
(``recent_stake_wallets.py:56-77``) tracks "active within TIMESPAN";
sessionization is its general form (contiguous activity runs instead
of a single trailing window). Streaming twin: ``F.session_window``
(used in streaming mode); this batch plan produces identical
boundaries and is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Add ``session_no`` (1-based per key) to every event row."""
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    new_s = (
        prev.isNull()
        | ((F.col(ts).cast("timestamp").cast("long") - prev.cast("timestamp").cast("long")) > gap_seconds)
    ).cast("long")
    run = Window.partitionBy(key).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_no", F.sum(new_s).over(run))


def session_aggregates(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    measures: list | None = None,
) -> DataFrame:
    """One row per (key, session): bounds, duration, event count +
    caller measures."""
    s = sessionize(df, key, ts, gap_seconds)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(F.col(ts).cast("timestamp").cast("long"))
         - F.min(F.col(ts).cast("timestamp").cast("long"))).alias("duration_seconds"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if measures:
        aggs.extend(measures)
    return s.groupBy(key, "session_no").agg(*aggs)
