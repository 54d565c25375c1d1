"""Inverted index over the document corpus: sharded posting lists,
term statistics, and conjunctive (AND) search served from the stored
index — the retrieval face of the webtext stack (TF-IDF already
provides the ranking face, functions/text.py).

Index layout — why sharded: a naive ``term -> collect_list(doc_id)``
row for a stopword-grade term at 10^12 docs is a multi-GB array in one
task (the classic skewed-reduce OOM). Postings are therefore stored as
``(term, shard, postings)`` with ``shard = pmod(doc_id, n_shards)``:
every row is bounded by ~df/n_shards entries, shards of one term land
on different reducers (the groupBy key includes shard), and a
conjunctive query can intersect shard-by-shard — the same key-space
bucketing the engine already uses for fold state (bucketing.py) and
LSH bands (dedup.py). Postings are sorted within a shard, so the
layout is deterministic across parallelism levels.

Search path: AND-of-terms intersects postings by exploding the (few)
matching index rows back to (term, doc) pairs and keeping docs whose
distinct-term count equals the query arity. The scan is
index-partition-pruned: terms are the leading sort/partition key of
the stored index, so a 3-term query touches 3·n_shards rows of index,
never the corpus. tests/test_index.py proves the served result equals
the same query answered from raw tokens.

Reference analogue: none — the reference's lookups are key-exact
(S1/S8); full-text retrieval is engine-added capability for the
LLM-curation story (find near-boilerplate families, audit leakage,
serve "docs containing X and Y" without a corpus scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import term_frequencies


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Sharded posting lists: (term, shard, doc_freq, tf_total,
    postings sorted). One explode + two partial-aggregated shuffles."""
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    return (
        tf.withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int"))
        .groupBy("term", "shard")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("tf_total"),
            F.sort_array(F.collect_list(F.struct(F.col(id_col).alias("doc_id"), F.col("tf").alias("tf")))).alias("postings"),
        )
    )


def term_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_df: int = 1
) -> DataFrame:
    """Per-term corpus stats off the TF stage: document frequency,
    total term frequency, smallest containing doc id."""
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    out = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("tf_total"),
        F.min(id_col).alias("min_doc_id"),
    )
    return out.where(F.col("doc_freq") >= min_df)


def conjunctive_search_raw(
    docs: DataFrame, terms: list[str], text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """AND-search answered from raw tokens (the no-index baseline):
    docs containing every term, with the summed tf of the query terms."""
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    hits = tf.where(F.col("term").isin(terms))
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nt"),
            F.sum("tf").alias("sum_tf"),
        )
        .where(F.col("_nt") == len(terms))
        .select(id_col, "sum_tf")
    )


def conjunctive_search_indexed(index: DataFrame, terms: list[str]) -> DataFrame:
    """AND-search served from the STORED index: filter to the query
    terms (partition-pruned scan of 3·n_shards rows), explode postings,
    intersect by doc. Never touches the corpus."""
    hits = index.where(F.col("term").isin(terms)).select(
        "term", F.explode("postings").alias("p")
    )
    return (
        hits.select("term", F.col("p.doc_id").alias("doc_id"), F.col("p.tf").alias("tf"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nt"), F.sum("tf").alias("sum_tf"))
        .where(F.col("_nt") == len(terms))
        .select("doc_id", "sum_tf")
    )


def build_positional_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Positional posting lists: ``(term, shard, postings)`` where each
    posting is ``struct(doc_id, positions)`` with positions = 0-based
    token offsets in the ORIGINAL tokenization (empty tokens from runs
    of spaces are dropped but do not renumber, so adjacency is a pure
    ``pos+1`` test). Same shard-bounded layout as
    :func:`build_inverted_index` — a stopword's postings split across
    ``n_shards`` rows, every row bounded, deterministic sort within.

    Two partial-aggregated shuffles: (term, doc) collapses per-doc
    positions map-side; (term, shard) packs the shard row.
    """
    toks = F.split(F.lower(F.col(text_col)), " ", -1)
    t = (
        docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "term"))
        .where(F.length("term") >= 1)
    )
    per_doc = t.groupBy(id_col, "term").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    return (
        per_doc.withColumn(
            "shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
        )
        .groupBy("term", "shard")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("doc_id"),
                        F.col("positions").alias("positions"),
                    )
                )
            ).alias("postings"),
        )
    )


def phrase_search_indexed(index: DataFrame, phrase: str) -> DataFrame:
    """Exact-phrase search served from the STORED positional index:
    docs where the phrase's terms occur at consecutive positions.
    Offset-shifted position-list intersection — the classic positional
    posting-list merge (Manning et al., IIR §2.4, public) expressed as
    whole-stage-codegen array ops.

    Plan: partition-pruned index scan of |distinct terms|·n_shards
    rows → explode postings → ONE groupBy(doc) pivoting each phrase
    offset's positions into a column → ``array_intersect`` of the
    shifted lists. The corpus is never touched; work is bounded by the
    rarest term's document frequency after the intersection, and by
    the scanned postings before it.

    Output: ``doc_id``, ``n_occurrences`` (phrase matches in the doc),
    ``first_pos`` (0-based offset of the first match) — deterministic,
    no floats.
    """
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        raise ValueError("empty phrase")
    hits = index.where(F.col("term").isin(list(set(terms)))).select(
        "term", F.explode("postings").alias("p")
    )
    flat = hits.select(
        "term",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.positions").alias("positions"),
    )
    aggs = [
        F.max(F.when(F.col("term") == t, F.col("positions"))).alias(f"_pos{i}")
        for i, t in enumerate(terms)
    ]
    g = flat.groupBy("doc_id").agg(*aggs)

    def _shift(offset: int):
        # NB: must stay a ONE-argument lambda — F.transform passes the
        # array index to a second parameter, which would corrupt the shift
        return lambda x: x - F.lit(offset)

    matches = F.col("_pos0")
    for i in range(1, len(terms)):
        matches = F.array_intersect(
            matches, F.transform(F.col(f"_pos{i}"), _shift(i))
        )
    present = F.lit(True)
    for i in range(len(terms)):
        present = present & F.col(f"_pos{i}").isNotNull()
    return (
        g.where(present)
        .withColumn("_m", matches)
        .where(F.size("_m") > 0)
        .select(
            "doc_id",
            F.size("_m").cast("long").alias("n_occurrences"),
            F.array_min("_m").cast("long").alias("first_pos"),
        )
    )


def build_bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """BM25-ready sharded postings: ``(term, shard, doc_freq,
    postings[(doc_id, tf, dl)])`` — the document length rides INSIDE the
    posting (impact-ordered-index layout, Manning et al. IIR §7, public)
    so scoring never joins back to the corpus or a per-doc-length side
    table. At 10^12 docs that join would shuffle a trillion-row dl
    table for a 3-term query; storing the 8-byte dl per posting costs
    ~1 word and keeps the search path index-only.

    Same shard-bounded skew story as :func:`build_inverted_index`; the
    dl join here runs at BUILD time only, doc_id-keyed on both sides.
    """
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return (
        tf.join(dl, id_col)
        .withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int"))
        .groupBy("term", "shard")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("doc_id"),
                        F.col("tf").alias("tf"),
                        F.col("dl").alias("dl"),
                    )
                )
            ).alias("postings"),
        )
    )


def bm25_corpus_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-row corpus constants for BM25: ``(n_docs, avgdl)``. Doc
    length is a pure array expression over the scan (count of non-empty
    tokens) — no explode, no shuffle beyond the single global agg — so
    the stats pass is a straight corpus scan at any scale. Token counts
    are small integers, so the double-precision average is exact across
    engines and accumulation orders, and it matches the per-posting
    ``dl`` stored by :func:`build_bm25_index` (docs with zero tokens are
    excluded from both)."""
    ntok = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), " ", -1),
            lambda x: F.length(x) >= 1,
        )
    )
    return (
        docs.select(ntok.alias("dl"))
        .where(F.col("dl") > 0)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    )


def bm25_search_indexed(
    index: DataFrame,
    stats: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval served from the STORED index (Robertson/
    Spärck Jones probabilistic idf, the +1 'Lucene' variant so scores
    stay positive): partition-pruned scan of |terms|·n_shards index
    rows → broadcast the per-term global df (a |terms|-row aggregate
    over shards) → explode postings → one groupBy(doc) sum. The corpus
    is never touched; the shuffle is bounded by the matched postings.

    Output: ``doc_id``, ``n_terms`` (query terms present), and the
    float score (column ``bm25``) — callers round/rank; the contract
    query emits ``bm25_x1e4`` for cross-engine determinism.
    """
    terms = [t for t in dict.fromkeys(t.lower() for t in terms) if t]
    if not terms:
        raise ValueError("empty query")
    hits = index.where(F.col("term").isin(terms))
    df_ = hits.groupBy("term").agg(F.sum("doc_freq").alias("df"))
    post = hits.select("term", F.explode("postings").alias("p")).select(
        "term",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
        F.col("p.dl").alias("dl"),
    )
    j = post.join(F.broadcast(df_), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        j.select("doc_id", (idf * tf_part).alias("_s"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum("_s").alias("bm25"))
    )


def rrf_fuse(
    ranked: list[DataFrame], id_col: str = "doc_id", k: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009, public):
    ``score(d) = Σ_lists 1/(k + rank_d)``. Each input frame carries
    ``(id_col, rank)`` with rank 1-based and ties already broken
    deterministically (rank over an integer-scaled score, then id).
    Rank lists are top-N-bounded by construction, so the union + one
    groupBy is small regardless of corpus size — fusion cost scales
    with N·|lists|, never with the corpus.

    Output: ``(id_col, n_lists, rrf)`` — float score; contract queries
    integer-scale it. Summation is per-doc over ≤|lists| values, and
    IEEE addition of two doubles is commutative, so two-list fusion is
    bit-deterministic across engines.
    """
    if not ranked:
        raise ValueError("no ranked lists")
    u = ranked[0].select(id_col, "rank")
    for r in ranked[1:]:
        u = u.unionByName(r.select(id_col, "rank"))
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.sum(1.0 / (F.lit(float(k)) + F.col("rank"))).alias("rrf"),
    )
