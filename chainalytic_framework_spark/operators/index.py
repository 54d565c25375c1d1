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
