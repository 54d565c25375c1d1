"""Symbolic series downsampling: PAA + SAX words + motif grouping.

Piecewise Aggregate Approximation (PAA) compresses each key's ordered
series into a fixed number of segment means; SAX (Symbolic Aggregate
approXimation, Lin/Keogh) maps those means onto a small alphabet so an
entire series becomes one short WORD.  Two series with the same word are
candidate look-alikes — grouping keys by word is the classic
candidate-then-verify index for "find series shaped like this one"
(iSAX is the published trillion-scale variant of exactly this trick),
the same banded shape as the MinHash-LSH dedup family in
``operators/dedup.py``: no all-pairs anywhere, one hash-partitioned
groupBy on an 8-char key.

Everything is EXACT integer arithmetic so results are bit-identical
across engines and parallelism levels:

- segment assignment: ``seg = ((rank-1) * n_segments) div n`` over the
  per-key row rank (equal-count PAA frames; short series produce short
  words deterministically);
- segment mean: ``paa_x1e4 = (10000 * sum) div count`` (Spark ``div``
  and DuckDB ``//`` both truncate toward zero, verified);
- symbol: per-key min/max scaling, ``sym = ((paa - mn) * alphabet) div
  (mx - mn + 1)`` — always in [0, alphabet) with no clamp needed, and
  the +1 makes a flat series (mx == mn) map to symbol 0 everywhere
  instead of dividing by zero.

Classic SAX z-normalises against Gaussian breakpoints; the min/max
variant keeps the pipeline float-free (the engine's hashing contract)
and is equally valid as a bucketing index — breakpoint choice only
moves the precision/recall trade-off of the candidate stage, the
verify stage (``rolling.series_correlation_pairs`` or a distance scan
over the matched group) is what confirms.

Scale: the rank window partitions by key (a url's series is bounded by
its bucket count, never corpus-size); PAA/word aggregations are
hash-partitioned groupBys with map-side combine; motif grouping
shuffles one row per KEY (not per point) keyed on the word.  At 10^12
documents the word table is |keys| rows — the same cardinality the
tier tables already carry.

Reference analogue: none in chainalytic (engine-added series-similarity
indexing, SURVEY §2.11 family) — the reference's closest shape is its
per-address stake_history state series
(/root/reference/src/chainalytic/zones/public-icon/aggregator/transform_registry/stake_history.py),
which this operator makes searchable by shape instead of by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def paa_segments(
    tier: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    n_segments: int = 8,
) -> DataFrame:
    """Equal-count PAA: per key, ``n_segments`` segment means (×1e4).

    Output: key_cols + (seg, n_pts, paa_x1e4).  ``order_col`` must be
    unique per key (a bucketed series) so the rank is deterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    ranked = tier.select(
        *key_cols,
        F.col(value_col).cast(_DEC).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*key_cols)).alias("_n"),
    )
    seg = F.expr(f"CAST(((_rn - 1) * {int(n_segments)}) div _n AS INT)")
    return (
        ranked.withColumn("seg", seg)
        .groupBy(*key_cols, "seg")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum("_v").alias("_sum"),
        )
        .select(
            *key_cols,
            "seg",
            "n_pts",
            F.expr(f"CAST((_sum * 10000) div CAST(n_pts AS {_DEC}) AS BIGINT)").alias(
                "paa_x1e4"
            ),
        )
    )


def sax_words(
    paa: DataFrame,
    key_cols: list[str],
    alphabet: int = 4,
) -> DataFrame:
    """Collapse PAA segments into one SAX word per key.

    Input is :func:`paa_segments` output; output is key_cols +
    (n_segs, word) where word is ``chr('a'+sym)`` per segment in
    segment order.  Min/max scaling is per key, so the word encodes
    SHAPE, not level — a cheap series and an expensive one with the
    same profile collide, which is the point of a motif index.
    """
    kw = Window.partitionBy(*key_cols)
    scaled = (
        paa.withColumn("_mn", F.min("paa_x1e4").over(kw))
        .withColumn("_mx", F.max("paa_x1e4").over(kw))
        .withColumn(
            "sym",
            F.expr(
                f"CAST(((paa_x1e4 - _mn) * {int(alphabet)})"
                " div (_mx - _mn + 1) AS INT)"
            ),
        )
    )
    return scaled.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                lambda s: F.char(s["sym"] + 97),
            ),
            "",
        ).alias("word"),
    )


def sax_motifs(words: DataFrame, min_keys: int = 2) -> DataFrame:
    """Group keys by SAX word: candidate same-shape series clusters.

    Output: (word, n_keys) for words shared by ≥ ``min_keys`` keys —
    the candidate stage; pairs inside a group go to an exact verify
    (``rolling.series_correlation_pairs`` on the matched keys).  One
    groupBy on the word — at any scale this shuffles |keys| rows.
    """
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .where(F.col("n_keys") >= int(min_keys))
    )


def motif_verify_pairs(
    words: DataFrame,
    tier: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    persist_words: bool = True,
) -> DataFrame:
    """Candidate-then-verify series similarity: pairs of keys sharing a
    SAX word, verified with EXACT integer Pearson sufficient statistics
    over their aligned buckets — the end-to-end shape-search pipeline
    (:func:`sax_words` buckets, this verifies; same two-stage contract
    as MinHash-LSH → ``ngram_jaccard_pairs`` in the dedup family).

    ``words`` is :func:`sax_words` output (coarse resolution for
    recall); ``tier`` is the VERIFY series (typically a coarser bucket
    grain than the word was built from, so aligned overlap is dense).
    Single-column key only (the pair columns need stable names).

    Output: (ka, kb, word, n, num, den1, den2) for ka < kb — callers
    threshold on num²/(den1·den2) driver-side or in a later select;
    the operator emits the exact components so no float enters the
    hashable result.

    Plan: word-keyed self-join (|keys| rows, banded — never all-pairs),
    then two bucket-keyed joins against the verify tier and one pair
    agg. Candidate cardinality is bounded by the word buckets exactly
    like LSH bands; a degenerate input (every series the same shape)
    concentrates in one bucket the same way one LSH band would — the
    resolution knob (segments × alphabet) is the spread control.
    """
    assert len(key_cols) == 1, "pair verify needs a single key column"
    k = key_cols[0]
    dec = "decimal(38,0)"
    if persist_words:
        # the candidate self-join reads `words` twice; without a persist
        # the whole upstream word computation (rank windows over the raw
        # series) executes once per side — measured 2.7x slower at sf0.1.
        # |keys| rows, so the cache is tiny. LIFECYCLE: the handle is
        # function-local and never unpersisted — fine for one-shot
        # queries (contract gate, bench, CLI), but a long-lived driver
        # calling this repeatedly should pass persist_words=False and
        # persist/unpersist the words frame itself.
        words = words.persist()
    wa = words.select(F.col(k).alias("ka"), "word")
    wb = words.select(F.col(k).alias("kb"), "word")
    cand = wa.join(wb, "word").where(F.col("ka") < F.col("kb"))
    ha = tier.select(
        F.col(k).alias("ka"),
        F.col(order_col).alias("_t"),
        F.col(value_col).cast(dec).alias("x"),
    )
    hb = tier.select(
        F.col(k).alias("kb"),
        F.col(order_col).alias("_t"),
        F.col(value_col).cast(dec).alias("y"),
    )
    joined = cand.join(ha, "ka").join(hb, ["kb", "_t"])
    from .rolling import pair_suffstats

    return pair_suffstats(joined, ["ka", "kb", "word"], convenience=False)
