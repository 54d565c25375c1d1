"""Period-over-period contribution analysis: decompose a metric's
change between two time ranges by key — "traffic dropped 12% this
week; WHICH hosts drove it" — the root-cause dashboard staple next to
the drift (PSI) and trend (slope/changepoint) monitors.

Per key: the metric total in range A, in range B, the signed delta,
and the key's SHARE of the total delta (x1e4, signed) — shares sum to
~10⁴ over all keys by construction (up to per-key intdiv truncation),
so the top of the |delta| ranking reads as "these N keys explain M%
of the move".

Exact/deterministic: totals are integer sums; share_x1e4 =
sign·(|delta·10⁴| div |total_delta|) with the sign carried
explicitly — pure integer algebra, hash-stable cross-engine. A zero
total delta (perfectly offsetting moves) yields NULL shares rather
than a fabricated ratio.

Scale shape: ONE pruned scan with conditional aggregates (both range
sums as sibling columns — never two scans), one map-side-combinable
groupBy on the key, and a 1-row total broadcast back. No windows, no
self-join; output is key-cardinality-sized. The ranking the serving
layer wants on top is orderBy(|delta| desc).limit(k) —
TakeOrderedAndProject.

Reference analogue: none — monitoring/serving tooling over the rolled
tiers (SURVEY §2.11 family; the "explain the move" dual of
histogram.psi_drift's "did the distribution move" question).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def contribution(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    a0: int,
    a1: int,
    b0: int,
    b1: int,
) -> DataFrame:
    """Per-key contribution to the metric change from range A=[a0,a1)
    to range B=[b0,b1) over epoch-second ``t_col`` and integer
    ``v_col``. Emits (keys..., v_a, v_b, delta, share_x1e4); keys with
    activity in either range appear, absent sides count as 0."""
    if not (a0 < a1 and b0 < b1):
        raise ValueError(f"empty range: A=[{a0},{a1}) B=[{b0},{b1})")
    t = F.col(t_col)
    in_a = (t >= a0) & (t < a1)
    in_b = (t >= b0) & (t < b1)
    per_key = (
        df.where(in_a | in_b)
        .groupBy(*key_cols)
        .agg(
            F.coalesce(F.sum(F.when(in_a, F.col(v_col))), F.lit(0))
            .cast("long")
            .alias("v_a"),
            F.coalesce(F.sum(F.when(in_b, F.col(v_col))), F.lit(0))
            .cast("long")
            .alias("v_b"),
        )
        .withColumn("delta", (F.col("v_b") - F.col("v_a")).cast("long"))
        # persisted: the total branch and the output branch otherwise
        # rebuild this subtree from the scan (column pruning defeats
        # exchange reuse — verified empirically), doubling the input
        # read. The frame is key-cardinality rows × 4 longs — the same
        # size as the operator's output, which the caller materializes
        # anyway; LRU eviction bounds the residue.
        .persist()
    )
    total = per_key.agg(
        F.sum("delta").cast("long").alias("_total_delta")
    )
    j = per_key.crossJoin(F.broadcast(total))
    sign = F.when(
        (F.col("delta") >= 0) == (F.col("_total_delta") >= 0), F.lit(1)
    ).otherwise(F.lit(-1))
    share = F.when(
        F.col("_total_delta") != 0,
        sign
        * F.expr(
            f"CAST(abs(CAST(delta AS {_DEC}) * 10000)"
            f" div abs(CAST(_total_delta AS {_DEC})) AS BIGINT)"
        ),
    )
    return j.select(
        *key_cols,
        "v_a",
        "v_b",
        "delta",
        share.cast("long").alias("share_x1e4"),
        F.col("_total_delta").alias("total_delta"),
    )
