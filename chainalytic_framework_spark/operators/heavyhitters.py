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
  truncated to the top ``k`` keys. The truncation is summarized by two
  bucket-level columns carried ON every kept row — ``others_max`` (the
  largest dropped count, the per-bucket error bound) and
  ``others_total`` — computed by window aggregates over the SAME
  bucket partitioning as the rank, so the whole partial is ONE
  aggregation shuffle plus one window shuffle, single-branch (an
  earlier union-of-filters design recomputed the counts subplan per
  branch; the plan audit caught it at 15 exchanges, this shape runs
  at ~3).
- **merge** (any coarser window): sum stored counts per key across
  child buckets. A key absent from a child's top-k contributes at most
  that child's ``others_max``, so the merged row carries

      cnt_lb  =  Σ counts where present            (lower bound)
      err     =  Σ others_max over absent children (cnt_ub = cnt_lb+err)

  exactly the Misra–Gries merge guarantee. Because ``others_max``
  rides on every kept row, "Σ over children where present" is a plain
  ``sum(others_max)`` over the key's rows — no join against a summary
  table; the only extra input is the per-parent total truncation mass,
  derived from one tiny (n_buckets-row) aggregate.

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
    (bucket_epoch, key, cnt, others_max, others_total) — one row per
    kept key; the others_* columns are bucket-constant (NULL when the
    bucket dropped nothing)."""
    counts = (
        df.select(bucket_epoch.alias("bucket_epoch"), F.col(key_col).alias("key"))
        .groupBy("bucket_epoch", "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return topk_partial_from_counts(counts, k)


def topk_partial_from_counts(counts: DataFrame, k: int) -> DataFrame:
    """Partial from an ALREADY-AGGREGATED (bucket_epoch, key, cnt)
    table — shared by the batch rollup above and the streaming edge
    (finalized window counts arrive pre-aggregated in foreachBatch)."""
    w = Window.partitionBy("bucket_epoch").orderBy(F.col("cnt").desc(), F.col("key").asc())
    wb = Window.partitionBy("bucket_epoch")
    dropped_cnt = F.when(F.col("_rn") > k, F.col("cnt"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .withColumn("others_max", F.max(dropped_cnt).over(wb).cast("long"))
        .withColumn("others_total", F.sum(dropped_cnt).over(wb).cast("long"))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


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
    # per-parent total truncation mass: others_max is bucket-constant, so
    # one (child-bucket)-grain aggregate then a parent-grain sum — both
    # over n_buckets rows, negligible next to the key table
    om = (
        p.groupBy("_parent", "bucket_epoch")
        .agg(F.max("others_max").alias("_om"))
        .groupBy("_parent")
        .agg(F.sum("_om").alias("_om_total"))
    )
    # per (parent, key): summed lower bound; Σ others_max over the
    # buckets WHERE PRESENT falls out of the rows themselves
    keys = p.groupBy("_parent", "key").agg(
        F.sum("cnt").alias("cnt_lb"),
        F.sum(F.coalesce(F.col("others_max"), F.lit(0))).alias("_om_present"),
    )
    merged = (
        keys.join(F.broadcast(om), "_parent", "left")
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
