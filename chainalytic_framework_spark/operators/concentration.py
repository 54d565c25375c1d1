"""Exact corpus-concentration metrics: Gini, HHI, top-share.

"How concentrated is the corpus on few hosts?" is the curation
dashboard's diversity gauge (a web crawl where 1% of hosts hold 60% of
documents trains differently than a flat one) and the crawl operator's
fairness gauge (is the fetch budget pooling on a handful of domains?).
Three standard numbers over a weight-per-unit table (docs per host,
events per user, bytes per domain):

- **Gini** G = (2·Σᵢ r̄ᵢwᵢ)/(n·W) − (n+1)/n  with r̄ᵢ the average
  ascending rank of unit i (ties get their mean rank, the exact
  convention) — 0 = perfectly even, (n−1)/n = one unit holds all;
- **HHI** = Σᵢ (wᵢ/W)² — the antitrust concentration index;
- **top-share** = fraction of W held by the heaviest
  ⌈top_frac·n⌉ units (the "top 1% of hosts hold X%" headline).

All three are computed EXACTLY in integer/decimal(38,0) arithmetic
(never float sums) from the **count-of-counts** table — group the
weights by VALUE first, then rank the distinct values:

    S2 := Σ_v (2·cum_below(v) + c_v + 1) · v · c_v   (= Σᵢ 2·r̄ᵢwᵢ)
    G·10⁴ = (S2 − (n+1)·W) · 10⁴ div (n·W)

Scale shape: the input is already an aggregate (one row per unit); the
count-of-counts groupBy collapses it to one row per DISTINCT weight
value — under the Zipf law that governs host/domain size distributions
the bulk of units share small counts (1, 2, 3, …), so the ranked table
is orders of magnitude smaller than the unit table. The only ordered
pass (two cumulative windows) runs over that collapsed table,
partitioned by ``group_cols``; a pathological all-distinct-weights
input degrades the window to the unit count — if that is your regime,
pre-bucket weights (the metrics are bucket-exact) before calling.
Everything else is map-side-combinable aggregation.

Reference analogue: none — north-rule training-data curation tooling
(the reference tracks one chain's aggregates; a 10¹²-doc corpus needs
its domain-diversity audited before training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def concentration(
    weights: DataFrame,
    weight_col: str,
    group_cols: list[str] | None = None,
    top_frac: float = 0.01,
) -> DataFrame:
    """Exact Gini/HHI/top-share per group over non-negative integer
    weights. Emits group_cols + (n_units, total_weight, gini_x1e4,
    hhi_x1e4, top_share_x1e4, top_k); null metrics when a group's total
    weight is 0. ``top_k = max(1, floor(top_frac·n))`` units.
    """
    if not 0 < top_frac <= 1:
        raise ValueError(f"top_frac must be in (0, 1]: {top_frac}")
    g = list(group_cols or [])
    w = F.col("_w")
    cc = (
        weights.where(F.col(weight_col).isNotNull())
        .select(*g, F.col(weight_col).cast("long").alias("_w"))
        .groupBy(*g, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    asc = (
        Window.partitionBy(*g).orderBy(F.asc("_w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    desc = (
        Window.partitionBy(*g).orderBy(F.desc("_w"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = Window.partitionBy(*g)
    ranked = cc.select(
        *g,
        "_w",
        "_c",
        (F.sum("_c").over(asc) - F.col("_c")).alias("_below"),
        (F.sum("_c").over(desc) - F.col("_c")).alias("_above"),
        F.sum("_c").over(grp).alias("_n"),
    )
    # top_k per group; the heaviest values fill it first (_above counts
    # units STRICTLY heavier, so take = clamp(k - _above, 0, c)). The
    # n·frac product is taken in DECIMAL so floor(150·0.01) can never
    # land on the wrong side of a binary-float epsilon.
    k = F.greatest(
        F.lit(1),
        F.floor(
            F.col("_n").cast("decimal(24,0)")
            * F.lit(str(top_frac)).cast("decimal(14,12)")
        ),
    ).cast("long")
    take = F.greatest(
        F.lit(0), F.least(F.col("_c"), k - F.col("_above"))
    )
    dec_w = w.cast(_DEC)
    terms = ranked.select(
        *g,
        F.col("_c").alias("_c"),
        (dec_w * F.col("_c").cast(_DEC)).alias("_wsum"),
        (dec_w * dec_w * F.col("_c").cast(_DEC)).alias("_wsq"),
        (
            (2 * F.col("_below") + F.col("_c") + 1).cast(_DEC)
            * dec_w
            * F.col("_c").cast(_DEC)
        ).alias("_s2"),
        (take.cast(_DEC) * dec_w).alias("_topw"),
        k.alias("_k"),
    )
    agg = terms.groupBy(*g).agg(
        F.sum("_c").alias("n_units"),
        F.sum("_wsum").cast(_DEC).alias("_W"),
        F.sum("_wsq").cast(_DEC).alias("_SS"),
        F.sum("_s2").cast(_DEC).alias("_S2"),
        F.sum("_topw").cast(_DEC).alias("_topW"),
        F.max("_k").alias("top_k"),
    )
    n_dec = F.col("n_units").cast(_DEC)
    W = F.col("_W")
    nz = W > F.lit(0).cast(_DEC)
    return agg.select(
        *g,
        F.col("n_units").cast("long").alias("n_units"),
        W.cast("long").alias("total_weight"),
        F.when(
            nz,
            F.expr(
                "CAST((_S2 - (CAST(n_units AS decimal(38,0)) + 1) * _W) * 10000"
                " div (CAST(n_units AS decimal(38,0)) * _W) AS BIGINT)"
            ),
        ).alias("gini_x1e4"),
        F.when(nz, F.expr("CAST(_SS * 10000 div (_W * _W) AS BIGINT)")).alias(
            "hhi_x1e4"
        ),
        F.when(nz, F.expr("CAST(_topW * 10000 div _W AS BIGINT)")).alias(
            "top_share_x1e4"
        ),
        F.col("top_k").cast("long").alias("top_k"),
    )
