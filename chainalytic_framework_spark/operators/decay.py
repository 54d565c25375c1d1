"""Exponentially time-decayed scores: "what is trending NOW".

A plain count answers "who was big over the whole window"; a crawl /
curation dashboard needs "who is big RIGHT NOW, discounting the past" —
the classic half-life decay score

    score(key, T) = Σ_i  w_i · 2^((t_i − T) / half_life)

(an event ``half_life`` seconds old counts half; two half-lives, a
quarter). Unlike a sliding window it needs NO retention boundary and is
a plain associative+commutative SUM, so Spark computes it with a
map-side-combinable hash aggregate — one shuffle of one partial per
(partition, key), never a window or a sort. The same property makes it
incrementally maintainable: a stored score ages by a pure multiply
(score · 2^((T0−T1)/hl)) with no access to history, which is why
half-life counters are the standard trending primitive in feed rankers
and cache admission policies (e.g. the TinyLFU family).

Reference analogue: none — the reference keeps undecayed running
aggregates (its Aggregator folds raw history); a recrawl planner wants
recency-weighted host activity (north-rule crawl-scheduling tooling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decayed_scores(
    df: DataFrame,
    key_cols: list[str],
    ts_epoch: Column,
    t_ref: int,
    half_life_s: int,
    weight: Column | None = None,
) -> DataFrame:
    """Per-key decayed score at ``t_ref`` plus the undecayed count.

    ``ts_epoch`` is an epoch-seconds Column; ``weight`` defaults to 1
    per row. Emits ``score_x1e4`` (the repo's fixed x1e4 convention,
    derived from an exact integer sum of per-term x1e8 roundings — see
    inline note) and ``n_raw``. Events AFTER ``t_ref`` still count
    (2^(+Δ/hl) > 1) — callers that want a closed window filter first;
    the formula itself has no boundary.
    """
    if half_life_s <= 0:
        raise ValueError(f"half_life_s must be > 0: {half_life_s}")
    w = weight if weight is not None else F.lit(1.0)
    term = w * F.pow(
        F.lit(2.0),
        (ts_epoch.cast("double") - F.lit(float(t_ref))) / F.lit(float(half_life_s)),
    )
    # Quantize each TERM to x1e8 and sum integers: a float SUM's value
    # depends on partition order, and a score whose true value sits at a
    # x1e4 rounding boundary then flips between runs / engines (seen
    # live: 5.01675 rounding to 50167 vs 50168 across Spark and DuckDB).
    # Per-term rounding is order-free; the only residual risk is a
    # single pow() differing across libm implementations within 1e-12
    # of a half-boundary — vanishingly unlikely and per-row, not
    # accumulated. The x1e4 report is then an exact integer division.
    term_x1e8 = F.round(term * 100000000, 0).cast("decimal(38,0)")
    scored = df.groupBy(*key_cols).agg(
        F.sum(term_x1e8).alias("_s_x1e8"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    # round-half-up at x1e4 from the exact x1e8 integer sum (terms are
    # nonnegative under the default weight; callers passing negative
    # weights get floor-at-half, still deterministic)
    return scored.select(
        *key_cols,
        F.expr("CAST((_s_x1e8 + 5000) div 10000 AS BIGINT)").alias(
            "score_x1e4"
        ),
        "n_raw",
    )


def trending_topk(
    df: DataFrame,
    key_cols: list[str],
    ts_epoch: Column,
    t_ref: int,
    half_life_s: int,
    k: int = 20,
    weight: Column | None = None,
) -> DataFrame:
    """Top-k keys by decayed score at ``t_ref``; deterministic total
    order (score_x1e4 DESC, keys ASC) applied AFTER the x1e4 rounding so
    the selected set is stable across engines and float summation
    orders. Plans as hash-agg → TakeOrderedAndProject: the only full
    shuffle carries one partial row per (partition, key).
    """
    scored = decayed_scores(df, key_cols, ts_epoch, t_ref, half_life_s, weight)
    return scored.orderBy(F.desc("score_x1e4"), *key_cols).limit(int(k))
