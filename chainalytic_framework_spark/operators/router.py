"""Tier router: answer an arbitrary [t0, t1) range query from the
COARSEST stored buckets that fit, with finer tiers only at the ragged
edges — the continuous-aggregate query planner (TimescaleDB's
real-time aggregate / Druid's granularity router do exactly this).

Why it matters at 10^12 rows: a 2-year dashboard range at 1m grain is
~10^6 buckets per key from the 1m tier, but routed it is ~23 monthly
buckets + ≤30 daily + ≤23 hourly + ≤59 minute buckets — four orders of
magnitude fewer rows scanned for the SAME exact answer (the cascade
tiers are lossless partials of the raw rollup, proved by the
cascade==direct gate queries, so routing is a pure I/O optimization,
never an approximation — additive measures only; quantiles route to
the histogram/KLL tiers instead).

``route_range`` is driver-side arithmetic over epoch ints (no data
touched); ``read_routed`` turns the segments into per-tier
partition-pruned scans (bucket_start is the partition/cluster axis of
every tier table) unioned into one plan, so Spark sees ordinary
pushed-down range filters per tier.

Reference analogue: the reference serves every query from the single
per-height store (``storage.py:143-154``) — viable when one zone fits
LevelDB; tier routing is what replaces it at warehouse scale
(SURVEY §2.11 family).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bucketing import SECONDS, TIER_ORDER


def route_range(
    e0: int, e1: int, tiers: list[str] | None = None
) -> list[tuple[str, int, int]]:
    """Cover [e0, e1) with the coarsest aligned buckets available.

    Returns (tier, lo, hi) segments, disjoint, in time order, whose
    union is exactly [e0, e1). Bounds must be aligned to the finest
    routed tier (callers align outward for display ranges)."""
    tiers = tiers or TIER_ORDER
    widths = [SECONDS[t] for t in tiers]
    if e0 % widths[0] or e1 % widths[0]:
        raise ValueError(f"bounds must align to the finest tier ({widths[0]}s)")
    out: list[tuple[str, int, int]] = []

    def rec(lo: int, hi: int, ti: int) -> None:
        if lo >= hi or ti < 0:
            return
        w = widths[ti]
        lo_c = -(-lo // w) * w
        hi_c = (hi // w) * w
        if lo_c >= hi_c:  # no whole bucket of this tier inside
            rec(lo, hi, ti - 1)
            return
        rec(lo, lo_c, ti - 1)
        out.append((tiers[ti], lo_c, hi_c))
        rec(hi_c, hi, ti - 1)

    rec(e0, e1, len(tiers) - 1)
    return sorted(out, key=lambda s: s[1])


def read_routed(
    tier_dfs: dict[str, DataFrame],
    e0: int,
    e1: int,
    measure: str = "point_count",
    keys: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Per-key totals of an additive measure over [e0, e1), scanning
    each routed segment from its own tier table. One union plan; each
    branch is a range-pruned scan + nothing else; the final groupBy is
    the only shuffle."""
    segs = route_range(e0, e1, [t for t in TIER_ORDER if t in tier_dfs])
    parts = []
    for tier, lo, hi in segs:
        df = tier_dfs[tier]
        if "gap_filled" in df.columns:
            df = df.where(~F.col("gap_filled"))
        b = F.col("bucket_start").cast("long")
        parts.append(
            df.where((b >= lo) & (b < hi)).select(
                *keys, F.col(measure).cast("long").alias("_v")
            )
        )
    if not parts:
        raise ValueError("empty range")
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    return allp.groupBy(*keys).agg(F.sum("_v").alias(measure))
