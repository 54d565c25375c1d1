"""Mergeable heavy-hitter (top-k) partials per tier bucket — the
frequent-keys analogue of the HLL/KLL sketch tiers.

Problem at 10^12 rows: "top users by event count over an arbitrary
dashboard window" recomputed from raw is a full shuffle of the key
space per query. The classical answer (Misra–Gries / SpaceSaving,
Agarwal et al., *Mergeable Summaries*, PODS'12) is a bounded summary
per time bucket that merges associatively. This module implements the
deterministic, Spark-native variant of that contract:

- **partial** (finest tier): per time bucket, the EXACT per-key counts
  (one groupBy — map-side combine makes within-bucket counts cheap),
  truncated to the top ``k`` keys; the truncation is summarized by one
  key-NULL row per bucket carrying ``others_max`` (the largest dropped
  count — the per-bucket error bound) and ``others_total``.
- **merge** (any coarser window): sum stored counts per key across
  child buckets. A key absent from a child's top-k contributes at most
  that child's ``others_max``, so the merged row carries

      cnt_lb  =  Σ counts where present            (lower bound)
      err     =  Σ others_max over absent children (cnt_ub = cnt_lb+err)

  exactly the Misra–Gries merge guarantee, computed with plain
  group-bys (no UDF, no driver state). ``err = 0`` ⇔ the merged count
  is exact (key was in every child's top-k, or no child dropped keys).

Determinism: truncation keeps (count DESC, key ASC) — ties never make
the summary depend on partition order, so partials are bit-identical
across parallelism levels, same as every other tier artifact here.

Sizing: a key with true frequency > n_bucket/k can never be dropped
(its count exceeds others_max of any truncation), so per-bucket heavy
hitters are always retained; k trades summary size for err tightness.

Reference analogue: W1 top-k maintenance keeps an exact sorted ledger
per zone (``recent_stake_wallets.py``) — viable per-zone, not at
10^12 keys; this is the SURVEY §2.11 sketch-tier answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_partial_rollup(
    df: DataFrame,
    bucket_epoch,
    key_col: str,
    k: int,
) -> DataFrame:
    """Build per-bucket top-k partials. Output schema:
    (bucket_epoch, key, cnt, others_max, others_total) — key IS NULL on
    the one summary row per bucket that dropped anything."""
    counts = (
        df.select(bucket_epoch.alias("bucket_epoch"), F.col(key_col).alias("key"))
        .groupBy("bucket_epoch", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("bucket_epoch").orderBy(F.col("cnt").desc(), F.col("key").asc())
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    kept = ranked.where(F.col("_rn") <= k).select(
        "bucket_epoch",
        "key",
        "cnt",
        F.lit(None).cast("long").alias("others_max"),
        F.lit(None).cast("long").alias("others_total"),
    )
    dropped = (
        ranked.where(F.col("_rn") > k)
        .groupBy("bucket_epoch")
        .agg(F.max("cnt").alias("others_max"), F.sum("cnt").alias("others_total"))
        .select(
            "bucket_epoch",
            F.lit(None).cast(kept.schema["key"].dataType).alias("key"),
            F.lit(None).cast("long").alias("cnt"),
            "others_max",
            "others_total",
        )
    )
    return kept.unionByName(dropped)


def topk_partial_merge(
    partials: DataFrame,
    parent_secs: int,
    k: int,
) -> DataFrame:
    """Merge stored child partials into parent-bucket heavy hitters.

    Output: (bucket_epoch, key, cnt_lb, err, exact) — top-k per parent
    bucket by (cnt_lb DESC, key ASC); ``cnt_lb <= true <= cnt_lb+err``;
    ``exact`` true iff err == 0. Reads ONLY the stored partials (the
    continuous-aggregate contract: coarser windows never touch raw).
    """
    p = partials.withColumn(
        "_parent", (F.col("bucket_epoch") / parent_secs).cast("long") * parent_secs
    )
    # per-parent total truncation mass: Σ others_max over child buckets
    om = (
        p.where(F.col("key").isNull())
        .groupBy("_parent")
        .agg(F.sum("others_max").alias("_om_total"))
    )
    # per (parent, key): summed lower bound + Σ others_max of the child
    # buckets WHERE PRESENT (join each key row to its own bucket's summary)
    bucket_om = p.where(F.col("key").isNull()).select(
        "bucket_epoch", F.col("others_max").alias("_bucket_om")
    )
    keys = (
        p.where(F.col("key").isNotNull())
        .join(bucket_om, "bucket_epoch", "left")
        .groupBy("_parent", "key")
        .agg(
            F.sum("cnt").alias("cnt_lb"),
            F.sum(F.coalesce(F.col("_bucket_om"), F.lit(0))).alias("_om_present"),
        )
    )
    merged = (
        keys.join(om, "_parent", "left")
        .withColumn(
            "err",
            (F.coalesce(F.col("_om_total"), F.lit(0)) - F.col("_om_present")).cast("long"),
        )
        .select(
            F.col("_parent").alias("bucket_epoch"),
            "key",
            F.col("cnt_lb").cast("long").alias("cnt_lb"),
            "err",
        )
    )
    w = Window.partitionBy("bucket_epoch").orderBy(F.col("cnt_lb").desc(), F.col("key").asc())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("bucket_epoch", "key", "cnt_lb", "err", (F.col("err") == 0).alias("exact"))
    )
