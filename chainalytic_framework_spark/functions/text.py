"""Text-analysis functions for training-data pipelines — all JVM-side
column expressions (whole-stage codegen; no UDFs).

Operators: token counting (whitespace + BPE-ish subword estimate),
quality scoring (length/punct/stopword ratios), n-gram language-ID
heuristic, document fingerprinting (md5 + rolling 32-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets — a deliberately simple n-gram
# heuristic (the container has no langid models; the *shape* is what the
# engine provides: per-language evidence columns → argmax)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "los"],
}

STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "it"]


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(c, r"\s+", -1)).cast("long")


def subword_estimate(text: Column | str, chars_per_token: float = 3.8) -> Column:
    """BPE-ish token estimate: length-scaled (GPT-family rule of thumb)
    plus a word-boundary floor — cheap, scan-friendly, good enough for
    budget accounting at corpus scale."""
    c = F.col(text) if isinstance(text, str) else text
    return F.greatest(
        F.ceil(F.length(c) / chars_per_token).cast("long"), token_count(c)
    )


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    )


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    c = F.col(text) if isinstance(text, str) else text
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = F.split(F.lower(c), r"\s+", -1)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard quality-filter feature block (Gopher/C4-style heuristics):
    token counts, mean word length, punct + stopword ratios."""
    c = F.col(text_col)
    ntok = token_count(c)
    return docs.withColumns(
        {
            "n_chars_txt": F.length(c).cast("long"),
            "n_tokens": ntok,
            "n_tokens_bpe_est": subword_estimate(c),
            "mean_word_len": F.length(F.regexp_replace(c, r"\s+", "")).cast("double")
            / F.greatest(ntok, F.lit(1)),
            "punct_ratio": punct_ratio(c),
            "stopword_ratio": stopword_ratio(c),
        }
    )


def quality_filter(docs: DataFrame, text_col: str = "text",
                   min_tokens: int = 3, max_mean_word_len: float = 25.0,
                   max_punct_ratio: float = 0.5) -> DataFrame:
    feats = quality_features(docs, text_col)
    return feats.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )


def lang_id_heuristic(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per-language hit counts → argmax (NULL
    when no markers hit). One pass, pure expressions."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+", -1)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return docs.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit(None))
    )


def fingerprint64(text: Column | str) -> Column:
    """64-bit content fingerprint (xxhash64 — JVM, fast path)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.xxhash64(c)


def rolling_fingerprint(text: Column | str, window: int = 64) -> Column:
    """Cheap rolling-hash sketch: xxhash64 of evenly-spaced substrings,
    combined — positional sensitivity without per-char UDF work."""
    c = F.col(text) if isinstance(text, str) else text
    parts = [
        F.xxhash64(F.substring(c, i * window + 1, window)) for i in range(4)
    ]
    return F.xxhash64(*parts)


# ---------------------------------------------------------------------------
# TF-IDF (corpus-level term weighting)
# ---------------------------------------------------------------------------

def term_frequencies(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", min_len: int = 1) -> DataFrame:
    """Per-(doc, term) counts: lowercase space tokens, length-filtered.
    One explode + one partial-aggregated groupBy — the canonical
    distributed TF stage (map-side combine collapses the repeats before
    the shuffle)."""
    toks = F.split(F.lower(F.col(text_col)), " ", -1)
    t = docs.select(F.col(id_col), F.explode(toks).alias("term")).where(
        F.length("term") >= min_len
    )
    return t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def idf_x1e4(docs: DataFrame, tf: DataFrame) -> DataFrame:
    """Integer-scaled inverse document frequency per term:
    round(ln(N / df) * 1e4) — integer so downstream rankings are
    deterministic across engines (floats order-tie only at < 0.5e-4,
    far above libm's 1-ulp divergence). N rides in as a broadcast
    1-row aggregate, keeping this a single logical plan."""
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return df_.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(F.log(F.col("n_docs") / F.col("df")) * 10000)
        .cast("long")
        .alias("idf_x1e4"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_len: int = 4,
) -> DataFrame:
    """Top-k characteristic terms per group by summed TF-IDF
    (integer score = Σtf × idf_x1e4; ties broken by term). All
    shuffles are keyed aggregations/joins; the explode stage dominates
    at corpus scale and everything after runs on the (term)-sized
    reduction, not the corpus."""
    from pyspark.sql import Window

    tf = term_frequencies(docs, text_col, id_col, min_len=min_len)
    idf = idf_x1e4(docs, tf)
    per_group = (
        tf.join(docs.select(id_col, group_col), id_col)
        .groupBy(group_col, "term")
        .agg(F.sum("tf").alias("sum_tf"))
    )
    scored = per_group.join(idf, "term").select(
        group_col, "term",
        (F.col("sum_tf") * F.col("idf_x1e4")).cast("long").alias("score"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def token_repetition(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Repetition features per document — the Gopher-style repetitive-
    content signals (duplicate-token fraction, most-frequent-token
    share) that catch keyword-stuffed / boilerplate pages the length
    and punctuation features miss.

    Exact integer outputs: ``n_tokens``, ``n_distinct_tokens``,
    ``top_token_count`` (longs) and floor-scaled ×1e4 ratios
    ``dup_token_frac_x1e4`` / ``top_token_share_x1e4`` — bit-identical
    across engines and shuffle orders.

    Plan: explode → two-level groupBy, both shuffles keyed by id (the
    second agg reuses the first's partitioning). Partial aggregation
    absorbs the per-token fan-out map-side, so at 10^12 docs the
    shuffle carries (doc, distinct-token) pairs, not raw tokens."""
    c = F.col(text_col)
    tok = docs.select(
        F.col(id_col), F.explode(F.split(c, r"\s+", -1)).alias("_tok")
    ).where(F.col("_tok") != "")
    per = tok.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    agg = per.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
        F.max("_c").cast("long").alias("top_token_count"),
    )
    n = F.col("n_tokens")
    return agg.withColumn(
        "dup_token_frac_x1e4",
        F.floor((n - F.col("n_distinct_tokens")) * 10000 / n).cast("long"),
    ).withColumn(
        "top_token_share_x1e4",
        F.floor(F.col("top_token_count") * 10000 / n).cast("long"),
    )


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean unigram surprisal — the dependency-free form
    of the perplexity filter LLM curation pipelines run (CCNet filters
    on a KenLM perplexity; with no model in the container, the corpus
    unigram distribution plays the language model):

        surp(term) = round(ln(N_tokens / corpus_tf(term)) · 1e4)
        score(doc) = floor(Σ_t tf_doc(t) · surp(t) / n_tokens(doc))

    High score = tokens rare in this corpus (gibberish, wrong-language,
    boilerplate-free prose); low = stopword soup. The per-TERM rounding
    to integer 1e-4 nats makes every downstream sum/division exact
    integer arithmetic — the same convention as idf_x1e4, so the score
    is hash-stable cross-engine and cross-partitioning.

    Plan: TF explode (corpus-dominant stage) → term-level aggregate
    (vocab-sized) → join back on term → per-doc sum. The term table is
    orders of magnitude smaller than the corpus; at 10^12 docs the
    term join is the classic broadcast candidate (vocab ≤ a few 1e8
    after min_df pruning; AQE picks broadcast when it fits).

    Returns (id_col, n_tokens, surprisal_x1e4).
    """
    # tf is consumed twice (corpus stats + per-doc join-back). Pass a
    # STORED tf table (the inverted index's TF stage, operators/index.py)
    # to avoid recomputing the explode: composed live, the plan pays the
    # explode twice — fine at test sf, not at corpus scale.
    if tf is None:
        tf = term_frequencies(docs, text_col, id_col)
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    # N_total re-derived from the vocab-sized corpus table, NOT from a
    # second pass over the exploded tf (plan audit: saves one full
    # explode+shuffle of the corpus)
    totals = corpus.agg(F.sum("cf").alias("n_total"))
    surp = corpus.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(F.log(F.col("n_total") / F.col("cf")) * 10000)
        .cast("long")
        .alias("surp_x1e4"),
    )
    return (
        tf.join(surp, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.floor(F.sum(F.col("tf") * F.col("surp_x1e4")) / F.sum("tf"))
            .cast("long")
            .alias("surprisal_x1e4"),
        )
    )


def ngram_counts(docs: DataFrame, n: int, text_col: str = "text",
                 group_cols: tuple[str, ...] = (),
                 top_k: int | None = None) -> DataFrame:
    """Corpus n-gram count table — the classic LM-training asset
    (Google-Books-style n-gram tables; also the base for KenLM-ish
    smoothed models). One explode + ONE groupBy; map-side partial
    aggregation collapses frequent n-grams before the shuffle, so the
    Zipf head never skews a task the way a per-gram window would.

    Returns (group_cols..., ngram, c) — all occurrences counted
    (multiset, not per-doc distinct). ``top_k`` bounds output per group
    with a total deterministic order (c DESC, ngram) via one group-keyed
    window on the AGGREGATED rows (bounded input, no raw-scan window).
    Reference analogue: the reference tabulates per-entity event counts
    (aggregator transforms); this is the text-corpus counterpart."""
    # explode the position index first; the gram string is then built
    # in a codegen projection instead of an interpreted transform
    # lambda (optimization r06 — same change as dedup.span_positions)
    toks = F.split(F.col(text_col), " ", -1)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    counts = (
        docs.select(*group_cols, toks.alias("_tk"), F.explode(idx).alias("_i"))
        .select(
            *group_cols,
            F.concat_ws(" ", F.slice(F.col("_tk"), F.col("_i"), n)).alias("ngram"),
        )
        .groupBy(*group_cols, "ngram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if top_k is None:
        return counts
    if not group_cols:
        # global top-k: orderBy+limit plans as TakeOrderedAndProject —
        # per-partition heaps + driver merge of k rows, never a sort of
        # the vocabulary table
        return counts.orderBy(F.desc("c"), F.asc("ngram")).limit(top_k)
    from pyspark.sql import Window

    # Two-phase top-k (ADVICE r4): with low-cardinality groups the
    # final row_number window would sort the WHOLE vocabulary in one
    # task. Phase 1 prunes per (group, ngram-hash shard): any global
    # top-k row is necessarily in its own shard's top-k, so keeping k
    # per shard is lossless and bounds the final window's input to
    # SHARDS·k rows regardless of vocabulary size.
    _SHARDS = 64
    shard = F.pmod(F.xxhash64("ngram"), F.lit(_SHARDS))
    w1 = Window.partitionBy(*group_cols, "_sh").orderBy(
        F.desc("c"), F.asc("ngram")
    )
    pruned = (
        counts.withColumn("_sh", shard)
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= top_k)
        .drop("_sh", "_rn")
    )
    w = Window.partitionBy(*group_cols)
    rn = F.row_number().over(w.orderBy(F.desc("c"), F.asc("ngram")))
    return pruned.withColumn("_rn", rn).where(F.col("_rn") <= top_k).drop("_rn")


def bigram_surprisal(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", lam_x100: int = 75) -> DataFrame:
    """Per-document mean BIGRAM surprisal under a Jelinek-Mercer
    interpolated corpus LM — one modeling step up from
    :func:`unigram_surprisal` toward the KenLM perplexity filter of
    CCNet/LLM curation pipelines (no model artifacts in the container;
    the corpus itself is the LM):

        p(w2|w1) = λ·c(w1 w2)/c(w1·) + (1-λ)·c(w2)/N
        surp(w1 w2) = round(-ln p · 1e4)          [per bigram TYPE]
        score(doc) = floor(Σ_occurrences surp / n_bigrams(doc))

    Per-TYPE rounding to integer 1e-4 nats before the per-doc sum makes
    everything downstream exact integer arithmetic — hash-stable
    cross-engine (the idf_x1e4 convention; libm ulp differences vanish
    in the rounding). c(w1·) counts bigram CONTEXTS (= occurrences of
    w1 as a left token), so p sums to 1 over the vocabulary per context
    up to the unigram back-off mass.

    Plan (ADVICE r4 skew/width hardening, same shape as the dup-span
    family): one bigram explode (corpus-dominant stage) → pre-aggregate
    per (doc, bigram) FIRST — the Zipf-head bigram collapses to ≤1 row
    per document, so no single join partition owns the head — then the
    bigram-type aggregate (vocab-bounded) + two broadcastable unigram
    aggregates hang off that same collapsed frame; the wide join back
    is keyed on xxhash64(bigram) so the shuffle carries 8-byte keys,
    never full-corpus strings → per-doc rollup weights each type by its
    occurrence count. Docs with < 2 tokens emit nothing. Returns
    (id_col, n_bigrams, bi_surprisal_x1e4)."""
    lam = F.lit(lam_x100 / 100.0)
    toks = F.split(F.col(text_col), " ", -1)
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
    occ_doc = (
        docs.select(F.col(id_col), F.explode(bi).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    bi_counts = occ_doc.groupBy("bg").agg(F.sum("n_occ").alias("c_bi"))
    w1 = F.split(F.col("bg"), " ", -1)[0]
    w2 = F.element_at(F.split(F.col("bg"), " ", -1), -1)
    ctx_counts = (
        bi_counts.groupBy(w1.alias("w1")).agg(F.sum("c_bi").alias("c_ctx"))
    )
    uni_counts = bi_counts.groupBy(w2.alias("w2")).agg(F.sum("c_bi").alias("c_w2"))
    n_total = bi_counts.agg(F.sum("c_bi").alias("n_total"))
    stats = (
        bi_counts.withColumn("w1", w1).withColumn("w2", w2)
        .join(ctx_counts, "w1")
        .join(uni_counts, "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.xxhash64("bg").alias("bgh"),
            F.round(
                -F.log(lam * F.col("c_bi") / F.col("c_ctx")
                       + (F.lit(1.0) - lam) * F.col("c_w2") / F.col("n_total"))
                * 10000, 0
            ).cast("long").alias("surp_x1e4"),
        )
    )
    return (
        occ_doc.select(id_col, F.xxhash64("bg").alias("bgh"), "n_occ")
        .join(stats, "bgh")
        .groupBy(id_col)
        .agg(F.sum("n_occ").alias("n_bigrams"),
             F.sum(F.col("n_occ") * F.col("surp_x1e4")).alias("_s"))
        .select(
            id_col, "n_bigrams",
            F.floor(F.col("_s") / F.col("n_bigrams")).cast("long")
            .alias("bi_surprisal_x1e4"),
        )
    )


def idf_shift(docs: DataFrame, part_col: Column, text_col: str = "text",
              id_col: str = "doc_id", min_len: int = 4,
              min_df: int = 5) -> DataFrame:
    """Corpus-drift detector: per-term IDF in two corpus partitions
    (``part_col`` boolean — crawl snapshots, sources, time halves) and
    the shift between them. Terms whose IDF *drops* sharply in the new
    partition are the emerging boilerplate / template vocabulary a
    training-data curation pass wants flagged before it floods the mix;
    rises are vocabulary going extinct. The reference's per-zone stat
    deltas (``storage.py:143-154`` serves per-height snapshots whose
    diffs play this role) motivate the shape.

    Integer-exact cross-engine via the idf_x1e4 convention: per-side
    ``round(ln(n_docs/df)·1e4)`` then an int subtraction. ``min_df``
    (per side, on distinct-doc df) bounds the output to stable terms.

    Scale shape: one explode → (doc, term, side) distinct-collapse with
    map-side combine → vocab-bounded per-side aggregate → self-join on
    term (vocab-sized, hash join) → filter. The two 1-row n_docs aggs
    ride in broadcast. No window, no skew key (terms at Zipf head are
    one row per side after the aggregate)."""
    toks = F.split(F.lower(F.col(text_col)), " ", -1)
    sided = docs.select(
        F.col(id_col), part_col.alias("_p"), F.explode(toks).alias("term")
    ).where(F.length("term") >= min_len)
    df_side = (
        sided.groupBy("_p", "term", id_col).agg(F.lit(1).alias("_one"))
        .groupBy("_p", "term").agg(F.count(F.lit(1)).alias("df"))
    )
    n_side = docs.groupBy(part_col.alias("_p")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    idf = df_side.join(F.broadcast(n_side), "_p").select(
        "_p", "term", "df",
        F.round(F.log(F.col("n_docs") / F.col("df")) * 10000)
        .cast("long").alias("idf_x1e4"),
    )
    a = idf.where(~F.col("_p")).select(
        "term", F.col("df").alias("df_a"), F.col("idf_x1e4").alias("idf_a_x1e4")
    )
    b = idf.where(F.col("_p")).select(
        "term", F.col("df").alias("df_b"), F.col("idf_x1e4").alias("idf_b_x1e4")
    )
    return (
        a.join(b, "term")
        .where((F.col("df_a") >= min_df) & (F.col("df_b") >= min_df))
        .select(
            "term", "idf_a_x1e4", "idf_b_x1e4",
            (F.col("idf_b_x1e4") - F.col("idf_a_x1e4")).alias("shift_x1e4"),
        )
    )


def distinctive_terms(
    docs: DataFrame, group_col: str, text_col: str = "text",
    k: int = 10, min_len: int = 1,
) -> DataFrame:
    """Top-k DISTINCTIVE terms per group by smoothed log-odds-ratio —
    "what does this lang/source say that the rest of the corpus
    doesn't" (Monroe et al.'s fightin'-words statistic, the corpus-
    comparison tool TF-IDF approximates badly: TF-IDF rewards terms
    rare everywhere; log-odds rewards terms COMMON here and rare
    elsewhere). With c = count(term in g), Cg = tokens in g,
    r = count(term elsewhere), Cr = tokens elsewhere:

        lor_x1e4 = round(ln( ((c+.5)·(Cr−r+.5)) / ((Cg−c+.5)·(r+.5)) )·1e4)

    +0.5 Haldane–Anscombe smoothing keeps group-only terms finite.
    Per-term rounding of a ratio of exact integers — the
    surprisal-family cross-engine determinism contract. Deterministic
    total order (lor DESC, term ASC).

    Plan (10^12-doc shape): one explode + one (group,term) hash agg
    (map-side combinable — the Zipf head collapses before the
    shuffle); term totals ride a term-partition window (≤ n_groups
    rows per term — no skew); group totals and the grand total are
    tiny broadcast sides; top-k uses the same two-phase shard prune as
    :func:`ngram_counts` so no task ever sorts a whole vocabulary.
    """
    from pyspark.sql import Window

    toks = F.explode(
        F.split(F.lower(F.col(text_col)), " ", -1)
    ).alias("term")
    tok = docs.select(F.col(group_col).alias("g"), toks).where(
        F.length("term") >= min_len
    )
    # ONE corpus explode: the (group,term) count table feeds three
    # consumers (term-total window, group totals, grand total) — without
    # the persist Spark re-derives it per branch and the raw scan runs
    # 3x (Catalyst's ReuseExchange doesn't unify the differently-pruned
    # branches; verified in tools/explain_audit.py). The persisted frame
    # is vocab-scale (groups x terms), not corpus-scale.
    cg0 = (
        tok.groupBy("g", "term").agg(F.count(F.lit(1)).alias("c")).persist()
    )
    cg = cg0.withColumn(
        "ct", F.sum("c").over(Window.partitionBy("term"))
    )
    gt = cg0.groupBy("g").agg(F.sum("c").alias("cgt"))
    tot = gt.agg(F.sum("cgt").alias("ctot"))
    j = (
        cg.join(F.broadcast(gt), "g")
        .crossJoin(F.broadcast(tot))
    )
    c = F.col("c").cast("double")
    r = (F.col("ct") - F.col("c")).cast("double")
    cgt = F.col("cgt").cast("double")
    crest = (F.col("ctot") - F.col("cgt")).cast("double")
    lor = F.round(
        F.log(((c + 0.5) * (crest - r + 0.5)) / ((cgt - c + 0.5) * (r + 0.5)))
        * 10000
    ).cast("long")
    scored = j.select(
        F.col("g").alias(group_col), "term",
        F.col("c").cast("long").alias("c"),
        lor.alias("lor_x1e4"),
    )
    # two-phase top-k (the ngram_counts pattern): shard prune bounds the
    # final per-group window to SHARDS*k rows regardless of vocabulary
    _SHARDS = 64
    w1 = Window.partitionBy(group_col, "_sh").orderBy(
        F.desc("lor_x1e4"), F.asc("term")
    )
    pruned = (
        scored.withColumn("_sh", F.pmod(F.xxhash64("term"), F.lit(_SHARDS)))
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_sh", "_rn")
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("lor_x1e4"), F.asc("term"))
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def vocab_overlap_pairs(
    docs: DataFrame, group_col: str, text_col: str = "text",
    min_len: int = 1,
) -> DataFrame:
    """Pairwise vocabulary Jaccard between groups (sources / langs /
    time slices) — the corpus-drift twin of :func:`distinctive_terms`:
    instead of WHICH terms differ, HOW MUCH the vocabularies overlap.
    Entirely exact integers (set cardinalities — no logs, no floats):

        jaccard_x1e4 = (|V_a ∩ V_b| * 10^4) intdiv |V_a ∪ V_b|

    over distinct-term sets V_g with ``length(term) >= min_len``.
    Pairs are emitted once with ``g_a < g_b``.

    Scale: distinct (group,term) is one map-side-combinable agg; the
    intersection is a TERM-KEYED self-join — each term contributes at
    most C(n_groups, 2) pairs, so the Zipf head is bounded by the
    GROUP count, never corpus frequency; per-group sizes broadcast.
    """
    tok = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.lower(F.col(text_col)), " ", -1)).alias("term"),
    ).where(F.length("term") >= min_len)
    v = tok.select("g", "term").distinct()
    sizes = v.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        v.alias("a")
        .join(v.select(F.col("g").alias("g2"), "term").alias("b"), "term")
        .where(F.col("g") < F.col("g2"))
        .groupBy(F.col("g").alias("g_a"), F.col("g2").alias("g_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(F.broadcast(sizes.withColumnRenamed("g", "g_a")
                               .withColumnRenamed("n", "n_a")), "g_a")
        .join(F.broadcast(sizes.withColumnRenamed("g", "g_b")
                          .withColumnRenamed("n", "n_b")), "g_b")
    )
    return out.select(
        "g_a", "g_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_common").cast("long").alias("n_common"),
        F.expr("(n_common * 10000) div (n_a + n_b - n_common)")
        .cast("long").alias("jaccard_x1e4"),
    )
