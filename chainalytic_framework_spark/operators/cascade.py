"""Downsample cascade: continuous aggregates 1m → 1h → 1d → 30d.

Each tier reads ONLY its parent tier — never raw pages. Because
buckets are epoch-aligned and widths divide exactly (bucketing.py),
re-aggregating the mergeable partials (sum/count/min/max) is lossless:
``cascade 30d ≡ direct-from-raw 30d`` (exactness test in
tests/test_cascade.py).

At 10^12 docs this is the difference between scanning 100 TB once
(build 1m) and scanning ~1/60th, ~1/3600th, … for each coarser tier.

Reference analogue: none — the reference emits only finest-grain
points and never downsamples (SURVEY.md §2.11 gap list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bucketing import CASCADE_PARENT, bucket_start

from .rollup import reagg_measures


def downsample(parent_tier_df: DataFrame, child_tier_name: str) -> DataFrame:
    """Re-aggregate a finer tier's partials into the next coarser tier.

    Gap-filled rows are excluded from re-aggregation: LOCF points are
    query-layer interpolations, not observations, and must not inflate
    coarser-tier counts (no-fabrication invariant).
    """
    src = parent_tier_df
    if "gap_filled" in src.columns:
        src = src.where(~F.col("gap_filled"))
    keys = [
        bucket_start("bucket_start", child_tier_name).alias("bucket_start"),
    ]
    group = ["bucket_start"]
    for k in ("url_hash", "url", "lang"):
        if k in src.columns:
            keys.append(F.col(k))
            group.append(k)
    return (
        src.select(*keys, "point_count", "byte_size", "text_len_sum", "text_len_min", "text_len_max")
        .groupBy(*group)
        .agg(*reagg_measures())
        .withColumn("tier", F.lit(child_tier_name))
        .withColumn("gap_filled", F.lit(False))
    )


def build_all_tiers(pages: DataFrame, grain: str = "url") -> dict[str, DataFrame]:
    """Build the full cascade from raw pages: 1m from raw, each coarser
    tier from its parent. Returns {tier_name: DataFrame}."""
    from .rollup import rollup_pages

    tiers: dict[str, DataFrame] = {"1m": rollup_pages(pages, "1m", grain=grain)}
    for name in ("1h", "1d", "30d"):
        tiers[name] = downsample(tiers[CASCADE_PARENT[name]], name)
    return tiers
