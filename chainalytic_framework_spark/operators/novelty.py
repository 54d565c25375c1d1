"""Per-batch content novelty: how much of each ingest batch is NEW.

The curation dashboard's dual to the vocabulary-growth curve
(``contract.py::vocab_growth_documents`` counts new *types*; this
weighs new content by how much of each DOCUMENT it covers): docs
arrive in ingest batches (a crawl snapshot, a dump partition); a doc's
k-word shingle is *novel* iff no doc in an EARLIER batch contains it.
The per-batch novel fraction is the dedup-rate curve CCNet/RefinedWeb
report when deduplicating each new crawl against all prior crawls —
when it flattens near zero, another crawl of the same frontier buys
almost no new training data.

Per batch the operator emits exact integers:

- ``n_docs``       docs contributing ≥1 shingle,
- ``n_pairs``      Σ over docs of |distinct shingles of the doc|,
- ``n_novel``      pairs whose shingle first appears in THIS batch
                   (within-batch duplication still counts as novel —
                   the batch is deduped against history, not itself),
- ``novelty_x1e4`` = n_novel·10⁴ div n_pairs (exact intdiv).

Scale shape: one shingle explode (set-semantics per doc — the same
array pipeline as ``operators/dedup.py::shingles``, inlined so the
batch column rides along without a join back to the corpus), a min-agg
keyed on the 8-byte xxhash64 shingle fingerprint (map-side combinable —
the Zipf-head boilerplate shingle collapses to one row per partition
before the shuffle), one h-keyed join of the (doc, h) pairs against
that |vocab|-row first-seen side, and a final #batches-row agg.  No
windows, no corpus-keyed sort; the hot-shingle probe skew is the
AQE-skew-join case the dedup family already documents.

Reference analogue: none — north-rule training-data tooling (the
reference re-aggregates every block unconditionally; a web corpus
needs to know when recrawling stops paying).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def batch_novelty(
    docs: DataFrame,
    batch: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-batch novel-shingle fractions vs all earlier batches.

    ``batch`` is any integer-valued Column over ``docs``'s columns
    (ingest partition, crawl id, ``doc_id // batch_size``); ordering of
    batch values IS ingest order. Docs with < k tokens contribute
    nothing (no shingles — same guard as the dedup funnel).
    """
    toks = F.split(F.col(text_col), " ", -1)
    # short-doc guard: Spark sequence(1, 0) DESCENDS — emit empty instead
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    pairs = docs.select(
        F.col(id_col).alias("_doc"),
        batch.cast("long").alias("_batch"),
        F.explode(F.array_distinct(sh)).alias("_s"),
    ).select("_doc", "_batch", F.xxhash64("_s").alias("_h"))

    first = pairs.groupBy("_h").agg(F.min("_batch").alias("_fb"))
    novel = (F.col("_fb") == F.col("_batch")).cast("long")
    return (
        pairs.join(first, "_h")
        .groupBy(F.col("_batch").alias("batch"))
        .agg(
            F.countDistinct("_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "batch",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.expr("n_novel * 10000 div n_pairs").alias("novelty_x1e4"),
        )
    )
