"""Crawl-snapshot diff: classify every key across two snapshots of the
same keyed table as ``new`` / ``vanished`` / ``changed`` / ``stable``.

This is the web-crawl change-detection primitive: two crawl windows of
the same url space, diffed on last-observed content value (content
hash, byte size, extracted-text fingerprint). The reference's fold
detects per-observation change (T6 ``text_changed``,
``aggregator/transform.py``); this operator answers the BETWEEN-
SNAPSHOT question — which urls appeared, disappeared, or changed
between crawl N and crawl N+1 — which drives incremental re-processing
(only ``new``/``changed`` urls re-enter the pipeline).

Plan shape: one full outer join on the key. At 10^12 urls both sides
shuffle on the key — unavoidable for a full diff (every key must meet
its counterpart) — but each side is a pre-aggregated one-row-per-key
frame, not raw observations, and on a cluster both snapshots would be
bucketed by url_hash so the join is co-located (no shuffle at all).
No driver-side iteration; AQE handles any residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Full-outer diff of two one-row-per-key snapshots on
    ``value_col``. Output: key cols + ``status`` ('new' | 'vanished' |
    'changed' | 'stable') + ``old_{value_col}`` / ``new_{value_col}``
    (nullable where the key is absent on that side).

    Presence is decided by join-side membership, not value nullability,
    so a legitimately-NULL value on one side still counts as present
    (classified 'changed' vs a non-NULL counterpart — null-safe
    equality via ``eqNullSafe``)."""
    o = old.select(
        *key_cols,
        F.col(value_col).alias(f"old_{value_col}"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *key_cols,
        F.col(value_col).alias(f"new_{value_col}"),
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, on=key_cols, how="full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("new"))
        .when(F.col("_in_new").isNull(), F.lit("vanished"))
        .when(
            F.col(f"old_{value_col}").eqNullSafe(F.col(f"new_{value_col}")),
            F.lit("stable"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *key_cols,
        status.alias("status"),
        f"old_{value_col}",
        f"new_{value_col}",
    )
