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
    broadcast_series: bool = True,
    arrow_verify: bool = True,
) -> DataFrame:
    """Candidate-then-verify series similarity: pairs of keys sharing a
    SAX word, verified with EXACT integer Pearson sufficient statistics
    over their aligned buckets — the end-to-end shape-search pipeline
    (:func:`sax_words` buckets, this verifies; same two-stage contract
    as MinHash-LSH → ``ngram_jaccard_pairs`` in the dedup family).

    ``words`` is :func:`sax_words` output (coarse resolution for
    recall); ``tier`` is the VERIFY series (typically a coarser bucket
    grain than the word was built from, so aligned overlap is dense).
    Single-column key only (the pair columns need stable names);
    (key, order) must be unique — a bucketed series.

    Output: (ka, kb, word, n, num, den1, den2) for ka < kb — callers
    threshold on num²/(den1·den2) driver-side or in a later select;
    the operator emits the exact components so no float enters the
    hashable result.

    Plan (optimization r06; before/after in plans/r06/): the round-5
    plan self-joined words on the word, joined the tier twice and
    aggregated |pairs| × |buckets| rows (~420M at bench sf1.0 — two
    full shuffles of the explosion). Now the per-word pair block is
    computed CLOSED-FORM inside one ``applyInPandas`` stage: each
    word group ships its members' (key, bucket, value) rows — tier
    cardinality, a few hundred KB — to a NumPy kernel that builds the
    group's dense value/presence matrices and derives every pair's
    six sufficient statistics from four integer Gram-matrix products
    (guide §4.2: Spark distributes, vectorized native code crunches).
    Candidate cardinality is still bounded by the word buckets exactly
    like LSH bands; the resolution knob (segments × alphabet) is the
    spread control. Skew note: one word group is one task — at the
    contract's 4×2 resolution that is ≤16 groups of ~|keys|/16 members,
    and the kernel is O(m²·S/2) per group, the same total work as the
    pair explosion but at C-loop speed. ``arrow_verify=False`` (or a
    non-integer key column) falls back to an all-JVM shape: salted
    word self-join + broadcast verify joins + pair aggregation.
    """
    assert len(key_cols) == 1, "pair verify needs a single key column"
    k = key_cols[0]
    import pyspark.sql.types as T

    ktype = None
    for f in tier.schema.fields:
        if f.name == k:
            ktype = f.dataType
    integral = isinstance(ktype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))
    if arrow_verify and integral:
        joined = tier.select(
            F.col(k).alias("_k"),
            F.col(order_col).alias("_t"),
            F.col(value_col).cast("long").alias("_v"),
        ).join(
            F.broadcast(words.select(F.col(k).alias("_k"), "word")), "_k"
        )
        if persist_words:
            # the one cacheable frame of this path (|tier| rows, tiny):
            # repeated invocations with the same inputs re-register the
            # SAME analyzed plan, so CacheManager serves the words+tier
            # build from the first invocation's materialization — the
            # role words.persist() played in the fallback path; same
            # function-local lifecycle note as there
            joined = joined.persist()
        # block decomposition: one word is ONE group, and a coarse
        # alphabet (16 words at 4×2) over |keys| members would both
        # bound parallelism at 16 tasks and let AQE coalesce the tiny
        # shuffle under even fewer. Split each word into n_chunks
        # row-blocks: every member's rows replicate to all chunks as
        # the RIGHT side (role 1), and to its own hash-chunk as the
        # LEFT side (role 0); a (word, chunk) group then emits exactly
        # the pairs whose smaller key lives in its left block — same
        # pair set, C× the tasks, 1/C the per-task Gram product.
        n_chunks = max(2, tier.sparkSession.sparkContext.defaultParallelism // 2)
        left = joined.withColumn(
            "_c", F.pmod(F.xxhash64(F.col("_k")), F.lit(n_chunks)).cast("int")
        ).withColumn("_role", F.lit(0))
        right = joined.withColumn(
            "_c", F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1)))
        ).withColumn("_role", F.lit(1))
        both = left.unionByName(right)
        return both.groupBy("word", "_c").applyInPandas(
            _pair_gram_kernel, schema=(
                "ka long, kb long, word string, n long, "
                "num long, den1 long, den2 long"
            ),
        )
    # all-JVM fallback (non-integral keys / arrow_verify=False)
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
    spark = words.sparkSession
    # salt the word self-join: a coarse alphabet (16 words at 4×2)
    # would otherwise bound the explosion at |words| tasks
    n_salts = max(4, 2 * spark.sparkContext.defaultParallelism)
    wa = words.select(F.col(k).alias("ka"), "word").withColumn(
        "_s", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    wb = words.select(F.col(k).alias("kb"), "word").withColumn(
        "_s", F.pmod(F.xxhash64(F.col("kb")), F.lit(n_salts)).cast("int")
    )
    cand = wa.join(wb, ["word", "_s"]).where(F.col("ka") < F.col("kb")).drop("_s")
    # the verify tier is |keys| × |buckets| rows — tier-table
    # cardinality, tiny next to the candidate explosion — so BROADCAST
    # both sides: the |pairs| × |buckets| intermediate then never
    # crosses an exchange (scan→probe→partial-agg in one stage, and
    # because every row of a pair is produced in the task that
    # generated the pair, partial aggregation collapses each group
    # COMPLETELY before the one |pairs|-row exchange).
    ha = tier.select(
        F.col(k).alias("ka"),
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("long").alias("x"),
    )
    hb = tier.select(
        F.col(k).alias("kb"),
        F.col(order_col).alias("_t"),
        F.col(value_col).cast("long").alias("y"),
    )
    if broadcast_series:
        ha, hb = F.broadcast(ha), F.broadcast(hb)
    joined = cand.join(ha, "ka").join(hb, ["kb", "_t"])
    # Exact integer Pearson sufficient statistics per pair, summed in
    # LONG (codegen fast path) instead of rolling.pair_suffstats's
    # decimal(38,0): identical results while |value| ≤ ~1e9 over ≤ 1e6
    # aligned buckets (n·Σxy bounded far below 2⁶³); beyond that the
    # ANSI overflow check fails the query loudly instead of returning
    # a wrong row. Same n/num/den contract as pair_suffstats.
    agg = joined.groupBy("ka", "kb", "word").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum(F.col("x") * F.col("y")).alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).alias("_sxx"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    return agg.select(
        "ka",
        "kb",
        "word",
        n.cast("long").alias("n"),
        (n * sxy - sx * sy).cast("long").alias("num"),
        (n * sxx - sx * sx).cast("long").alias("den1"),
        (n * syy - sy * sy).cast("long").alias("den2"),
    )


def _pair_gram_kernel(pdf):
    """One (word, chunk) block → every (ka < kb) pair whose SMALLER key
    hashes to this chunk, with exact integer Pearson sufficient
    statistics via int64 Gram matrices.

    Rows with ``_role`` 1 carry the word's FULL membership (the right
    side); rows with ``_role`` 0 mark which members this chunk owns as
    the left side. With X the dense (member × bucket) value matrix
    (0 where absent), I the matching presence matrix, and L the left
    members' row subset:

        n = I_L·Iᵀ   sx = X_L·Iᵀ   sy = I_L·Xᵀ   sxy = X_L·Xᵀ
        sxx = (X∘X)_L·Iᵀ   syy = I_L·(X∘X)ᵀ

    — identical to the aligned inner-join semantics of the JVM
    fallback path. All arithmetic is int64 and EXACT; the guard below
    fails loudly when S·B² (S aligned buckets, B max |value|) could
    overflow rather than let NumPy wrap silently. Pairs with no
    aligned bucket (n = 0) are dropped, matching the join semantics;
    each pair is emitted by exactly one chunk (the smaller key's).
    """
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {c: pd.Series(dtype=d) for c, d in (
            ("ka", "int64"), ("kb", "int64"), ("word", "object"),
            ("n", "int64"), ("num", "int64"),
            ("den1", "int64"), ("den2", "int64"))}
    )
    role = pdf["_role"].to_numpy()
    full = pdf[role == 1]
    keys, kidx = np.unique(full["_k"].to_numpy(), return_inverse=True)
    m = len(keys)
    left_keys = np.unique(pdf["_k"].to_numpy()[role == 0])
    if m < 2 or len(left_keys) == 0:
        return empty
    lidx = np.searchsorted(keys, left_keys)
    buckets, bidx = np.unique(full["_t"].to_numpy(), return_inverse=True)
    S = len(buckets)
    v = full["_v"].to_numpy(np.int64)
    B = int(np.abs(v).max()) if len(v) else 0
    # |num| ≤ n·Σ|xy| ≤ S²·B²; keep it clear of 2⁶³ with margin
    if S * S * B * B >= 2 ** 62:
        raise ValueError(
            f"pair stats would overflow int64: S={S} buckets, max|v|={B}; "
            "reduce the verify grid or value scale"
        )
    X = np.zeros((m, S), dtype=np.int64)
    I = np.zeros((m, S), dtype=np.int64)
    X[kidx, bidx] = v
    I[kidx, bidx] = 1
    X2 = X * X
    Xl, Il, X2l = X[lidx], I[lidx], X2[lidx]
    n_m = Il @ I.T
    sx_m = Xl @ I.T
    sy_m = Il @ X.T
    sxy_m = Xl @ X.T
    sxx_m = X2l @ I.T
    syy_m = Il @ X2.T
    # pair (a, b): a from this chunk's left block, any b with ka < kb
    ka_grid = keys[lidx][:, None]
    kb_grid = keys[None, :]
    li, bi = np.nonzero((ka_grid < kb_grid) & (n_m > 0))
    if len(li) == 0:
        return empty
    n = n_m[li, bi]
    sx = sx_m[li, bi]
    sy = sy_m[li, bi]
    sxy = sxy_m[li, bi]
    sxx = sxx_m[li, bi]
    syy = syy_m[li, bi]
    return pd.DataFrame(
        {
            "ka": keys[lidx][li],
            "kb": keys[bi],
            "word": pdf["word"].iloc[0],
            "n": n,
            "num": n * sxy - sx * sy,
            "den1": n * sxx - sx * sx,
            "den2": n * syy - sy * sy,
        }
    )
