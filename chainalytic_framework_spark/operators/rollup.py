"""Tumbling-window rollup: pages → tier point tables.

The finest tier aggregates raw pages once; coarser tiers re-aggregate
partials (operators/cascade.py) and never touch raw input again —
the continuous-aggregate design that makes 10^12-doc scale viable.

Measures are integer-only (counts, byte sizes, char lengths) so tier
outputs are exactly equal across any parallelism level / plan shape —
no float accumulation-order sensitivity (SURVEY.md §7 hard parts).

Reference analogue: per-height derived time-series points emitted by
Transform.execute, e.g. total staking per height
(``/root/reference/zones/public-icon/aggregator/transform_registry/stake_history.py:170-190``),
generalized from one global series to per-url / per-lang grains.

Scale notes (100 TB):
- The groupBy shuffles on ``(bucket_start, url_hash)`` — high
  cardinality, uniform except hot domains; ``rollup_pages_salted``
  is the two-stage salted variant for those (plus AQE skew handling).
- Partial aggregation (map-side combine) is automatic for all the
  sum/count/min/max measures — the shuffle carries one row per
  (key, bucket) per map task, not per input row.
- Only needed columns are read: Catalyst prunes ``html``/``text`` down
  to lengths at the scan when the source is parquet with statistics;
  measures use ``octet_length``/``length`` so blob bytes never cross a
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bucketing import bucket_start, salt_col, url_bucket, url_hash

# Mergeable partial measures: every one of these re-aggregates exactly
# (sum→sum, count→sum, min→min, max→max). avg is always derived
# (text_len_sum / point_count), never stored. Built lazily — Column
# construction needs an active SparkSession.
def measures() -> list:
    return [
        F.count(F.lit(1)).alias("point_count"),
        F.sum(F.octet_length("html")).alias("byte_size"),
        F.sum(F.length("text")).alias("text_len_sum"),
        F.min(F.length("text")).alias("text_len_min"),
        F.max(F.length("text")).alias("text_len_max"),
    ]


def reagg_measures() -> list:
    return [
        F.sum("point_count").alias("point_count"),
        F.sum("byte_size").alias("byte_size"),
        F.sum("text_len_sum").alias("text_len_sum"),
        F.min("text_len_min").alias("text_len_min"),
        F.max("text_len_max").alias("text_len_max"),
    ]


def rollup_pages(pages: DataFrame, tier_name: str, grain: str = "url") -> DataFrame:
    """Aggregate raw pages into one tier at the given grain.

    grain='url'  → (bucket_start, url_hash, url, lang) rows
    grain='lang' → (bucket_start, lang) rows
    """
    b = bucket_start("warc_ts", tier_name).alias("bucket_start")
    if grain == "url":
        keys = [b, url_hash("url").alias("url_hash"), F.col("url"), F.col("lang")]
        group = ["bucket_start", "url_hash", "url", "lang"]
    elif grain == "lang":
        keys = [b, F.col("lang")]
        group = ["bucket_start", "lang"]
    else:
        raise ValueError(f"unknown grain {grain!r}")
    out = (
        pages.select(*keys, "html", "text")
        .groupBy(*group)
        .agg(*measures())
        .withColumn("tier", F.lit(tier_name))
        .withColumn("gap_filled", F.lit(False))
    )
    return out


def rollup_observations(obs: DataFrame, tier_name: str) -> DataFrame:
    """Tier rollup from a prepared (narrowed) observation table —
    (url, warc_ts, url_hash, lang, text_len, html_len). Lets the
    pipeline scan raw pages ONCE: blobs are reduced to lengths in the
    scan projection, and both the 1m tier and the stateful fold read
    the same narrow, persisted intermediate."""
    b = bucket_start("warc_ts", tier_name).alias("bucket_start")
    return (
        obs.select(b, "url_hash", "url", "lang", "text_len", "html_len")
        .groupBy("bucket_start", "url_hash", "url", "lang")
        .agg(
            F.count(F.lit(1)).alias("point_count"),
            F.sum("html_len").alias("byte_size"),
            F.sum("text_len").alias("text_len_sum"),
            F.min("text_len").alias("text_len_min"),
            F.max("text_len").alias("text_len_max"),
        )
        .withColumn("tier", F.lit(tier_name))
        .withColumn("gap_filled", F.lit(False))
    )


def rollup_pages_salted(pages: DataFrame, tier_name: str, n_salts: int = 16) -> DataFrame:
    """Two-stage salted rollup at lang grain (the low-cardinality, thus
    skew-prone grain: 'en' carries ~45% of rows).

    Stage 1 groups by (key, salt) — the hot key spreads over n_salts
    reducers; stage 2 merges the ≤ n_salts partials per key. Results are
    bit-identical to the unsalted plan (integer measures). The url grain
    rarely needs salting (url_hash is high-cardinality); hot *domains*
    show up at lang/domain grains, which is where this applies.
    """
    b = bucket_start("warc_ts", tier_name).alias("bucket_start")
    stage1 = (
        pages.select(
            b,
            F.col("lang"),
            salt_col("url", n_salts, extra=F.col("warc_ts")).alias("_salt"),
            "html",
            "text",
        )
        .groupBy("bucket_start", "lang", "_salt")
        .agg(*measures())
    )
    return (
        stage1.groupBy("bucket_start", "lang")
        .agg(*reagg_measures())
        .withColumn("tier", F.lit(tier_name))
        .withColumn("gap_filled", F.lit(False))
    )


def with_layout_columns(tier_df: DataFrame) -> DataFrame:
    """Add physical-layout columns for the tier-table write:
    ``bucket_day`` (directory partition; prunes time predicates) and
    ``url_bucket`` (range-distribution inside partitions)."""
    out = tier_df.withColumn("bucket_day", F.to_date("bucket_start"))
    if "url" in tier_df.columns:
        out = out.withColumn("url_bucket", url_bucket("url"))
    return out
