"""ASAP-style auto-window smoothing: pick the moving-average window
that minimizes visual roughness while retaining the series' structure.

A dashboard pane has to choose HOW MUCH to smooth: too little and the
line is noise, too much and real excursions vanish. ASAP (Rong &
Bailis, VLDB'17 "ASAP: Prioritizing Attention via Time Series
Smoothing") frames the choice as an optimization — minimize the
roughness of the smoothed line subject to preserving the original's
deviation structure. This module implements that selection rule with
two deliberate adaptations for a distributed exact-arithmetic engine:

- the candidate windows are an explicit caller-supplied grid (ASAP
  prunes candidates by ACF peaks; the engine already exposes
  ``trend.acf_spectrum`` for callers that want data-driven candidates,
  and a FIXED grid keeps the choice deterministic and oracle-testable);
- the structure-preservation gate is **variance retention** (smoothed
  variance ≥ ``min_retention`` of the original) instead of kurtosis —
  retention needs only 2nd moments, which fit decimal(38,0) exactly at
  any corpus scale, where 4th moments of cents-scaled values overflow.

Everything is exact integer algebra, so the chosen window is
bit-identical at any parallelism and replayable in any SQL engine:
with s_w(t) = the w-row rolling SUM (the SMA numerator — never divide
early), d = consecutive differences of s_w, m = #full windows,

    rough²(w)·10⁸  =  (cnt·Σd² − (Σd)²) · 10⁸  div  (cnt²·w²)
    retention·10⁴  =  (m·Σs² − (Σs)²) · n² · 10⁴
                        div ((n·Σx² − (Σx)²) · m² · w²)

and the chosen w is the SMALLEST window among those with
retention ≥ threshold that minimizes the rounded roughness (ties →
smaller w smooths less, the conservative pick). A constant series
(zero original variance) retains trivially (retention := 10⁴).

Scale shape: one window pass per candidate (the grid is a bounded
driver-side list, each pass a constant-frame rolling sum partitioned by
series key), one groupBy per candidate, a #keys×#candidates-row
argmin. Series are TIER rows (bucket grain), never raw history.

Reference analogue: none — north-rule chart-serving tooling, the
auto-smoothing dual of the LTTB/M4 decimators in ``operators/lttb.py``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _rolled(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    windows: tuple[int, ...],
) -> DataFrame:
    """The shared rolled frame: per row, _rn plus every candidate's
    rolling sum (_s{w}) and its consecutive diff (_d{w}).

    ONE window pass computes every candidate's columns as siblings: all
    frames share partitionBy(keys)/orderBy(t), so Spark plans one
    exchange + one sort and chains the frame variants (no per-candidate
    rescan or union — the naive per-w-branch plan costs |grid| scans and
    4x the shuffles for identical output). Both consumers
    (:func:`asap_candidate_stats` and :func:`asap_smooth`'s final SMA
    projection) hang off this SAME subtree, so the input exchange is
    byte-identical in both branches and ReuseExchange computes the
    upstream scan/agg once."""
    if not windows or any(w < 1 for w in windows):
        raise ValueError(f"windows must be positive: {windows}")
    if len(set(windows)) != len(windows):
        raise ValueError(f"duplicate windows: {windows}")
    base = series.select(
        *key_cols,
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
    )
    seq = Window.partitionBy(*key_cols).orderBy("_t")
    cur = base.withColumn("_rn", F.row_number().over(seq))
    for w in windows:
        roll = Window.partitionBy(*key_cols).orderBy("_t").rowsBetween(
            -(w - 1), 0
        )
        cur = cur.withColumn(f"_s{w}", F.sum("_x").over(roll))
        # d(rn) = s(rn) - s(rn-1), defined where BOTH are full windows
        # (rn >= w+1) — identical to lag-after-filtering-to-full-windows
        cur = cur.withColumn(
            f"_d{w}",
            F.when(
                F.col("_rn") >= w + 1,
                F.col(f"_s{w}") - F.lag(f"_s{w}").over(seq),
            ),
        )
    return cur


def asap_candidate_stats(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    windows: tuple[int, ...] = (2, 3, 5, 7),
) -> DataFrame:
    """Per (key, window) exact smoothing diagnostics: m (full windows),
    rough2_x1e8 (squared roughness of the SMA, scaled), ret_x1e4
    (variance retention vs the raw series). Input values must be
    integer-scaled (cents / x1e4 — the engine convention)."""
    cur = _rolled(series, key_cols, order_col, value_col, windows)
    return _stats_from_rolled(cur, key_cols, windows)


def _stats_from_rolled(
    cur: DataFrame,
    key_cols: list[str],
    windows: tuple[int, ...],
) -> DataFrame:
    # one groupBy per KEY (not per key x candidate) carrying the raw and
    # every candidate's sufficient stats in sibling columns
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast(_DEC)).alias("_sx"),
        F.sum(F.col("_x").cast(_DEC) * F.col("_x").cast(_DEC)).alias("_sxx"),
    ]
    for w in windows:
        full = F.col("_rn") >= w
        ss = F.when(full, F.col(f"_s{w}")).cast(_DEC)
        sd = F.col(f"_d{w}").cast(_DEC)
        aggs += [
            F.count(F.when(full, F.lit(1))).alias(f"_m{w}"),
            F.sum(ss).alias(f"_ss{w}"),
            F.sum(ss * ss).alias(f"_sss{w}"),
            F.count(f"_d{w}").alias(f"_cnt{w}"),
            F.sum(sd).alias(f"_sd{w}"),
            F.sum(sd * sd).alias(f"_sdd{w}"),
        ]
    per_key = cur.groupBy(*key_cols).agg(*aggs)
    # the bounded grid unpivots from the aggregated row — |keys|x|grid|
    # rows, no join (raw stats ride along in the same struct)
    j = per_key.select(
        *key_cols,
        "_n",
        "_sx",
        "_sxx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).cast("long").alias("w"),
                        F.col(f"_m{w}").alias("_m"),
                        F.col(f"_ss{w}").alias("_ss"),
                        F.col(f"_sss{w}").alias("_sss"),
                        F.col(f"_cnt{w}").alias("_cnt"),
                        F.col(f"_sd{w}").alias("_sd"),
                        F.col(f"_sdd{w}").alias("_sdd"),
                    )
                    for w in windows
                ]
            )
        ).alias("_g"),
    ).select(
        *key_cols, "_n", "_sx", "_sxx", "_g.*"
    )
    m = F.col("_m").cast(_DEC)
    n = F.col("_n").cast(_DEC)
    cnt = F.col("_cnt").cast(_DEC)
    wd = F.col("w").cast(_DEC)
    staged = j.select(
        *key_cols,
        "w",
        F.col("_m").cast("long").alias("m"),
        F.col("_cnt").cast("long").alias("_cnt"),
        (cnt * F.col("_sdd") - F.col("_sd") * F.col("_sd")).alias("_rough_num"),
        (cnt * cnt * wd * wd).alias("_rough_den"),
        (
            (m * F.col("_sss") - F.col("_ss") * F.col("_ss"))
            * n * n * F.lit(10000).cast(_DEC)
        ).alias("_ret_num"),
        (
            (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
            * m * m * wd * wd
        ).alias("_ret_den"),
        (
            (n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
            == F.lit(0).cast(_DEC)
        ).alias("_const"),
    )
    return staged.select(
        *key_cols,
        "w",
        "m",
        F.when(
            F.col("_cnt") > 1,
            F.expr("CAST(_rough_num * 100000000 div _rough_den AS BIGINT)"),
        ).alias("rough2_x1e8"),
        F.when(F.col("_const"), F.lit(10000).cast("long"))
        .when(
            F.col("_ret_den") > F.lit(0).cast(_DEC),
            F.expr("CAST(_ret_num div _ret_den AS BIGINT)"),
        )
        .alias("ret_x1e4"),
    )


def asap_choose(
    stats: DataFrame,
    key_cols: list[str],
    min_retention_x1e4: int = 5000,
) -> DataFrame:
    """Deterministic per-key window choice over
    :func:`asap_candidate_stats` output: among candidates with ≥ 2 full
    windows and retention ≥ threshold, take min (rough2_x1e8, w);
    a key with no qualifying candidate gets w = 1 (no smoothing)."""
    ok = stats.where(
        (F.col("m") >= 2)
        & F.col("rough2_x1e8").isNotNull()
        & (F.col("ret_x1e4") >= int(min_retention_x1e4))
    )
    best = ok.groupBy(*key_cols).agg(
        F.min(F.struct("rough2_x1e8", "w")).alias("_b")
    )
    keys = stats.select(*key_cols).distinct()
    return keys.join(best, key_cols, "left").select(
        *key_cols,
        F.coalesce(F.col("_b.w"), F.lit(1)).cast("long").alias("chosen_w"),
    )


def asap_smooth(
    series: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    windows: tuple[int, ...] = (2, 3, 5, 7),
    min_retention_x1e4: int = 5000,
) -> DataFrame:
    """End-to-end auto-smoothed series: stats → choose → project each
    key's chosen rolling sum out of the SHARED rolled frame. Emits
    (keys..., order, sma_x1e4 = rolling_sum·10⁴ div w over full windows
    — exact intdiv, never float). The rolled frame (one sort, every
    candidate's sum as sibling columns) is built once and consumed by
    both the stats branch and the final projection, so the plan reuses
    one exchange instead of recomputing the scan + window pass; the
    chosen side is one row per key → broadcast join back."""
    cur = _rolled(series, key_cols, order_col, value_col, windows)
    chosen = asap_choose(
        _stats_from_rolled(cur, key_cols, windows),
        key_cols,
        min_retention_x1e4,
    )
    out = cur.join(F.broadcast(chosen), key_cols)
    frames = {1: F.col("_x")}
    for w in windows:
        frames[w] = F.col(f"_s{w}")
    expr = None
    for w, col in frames.items():
        hit = F.col("chosen_w") == w
        expr = F.when(hit, col) if expr is None else expr.when(hit, col)
    return (
        out.withColumn("_s", expr)
        .where(F.col("_rn") >= F.col("chosen_w"))
        .select(
            *key_cols,
            F.col("_t").alias(order_col),
            "chosen_w",
            F.expr(
                "CAST(CAST(_s AS decimal(38,0)) * 10000"
                " div CAST(chosen_w AS decimal(38,0)) AS BIGINT)"
            ).alias("sma_x1e4"),
        )
    )
