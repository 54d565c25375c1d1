"""BM25 ranked retrieval + reciprocal-rank fusion (operators/index.py):
indexed scores equal a NumPy reference, shard-count invariance, fusion
algebra, and the trigram vocabulary-growth curve's invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.index import (
    bm25_corpus_stats,
    bm25_search_indexed,
    build_bm25_index,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark hash merge join scan"),
        (2, "spark spark hash filter"),
        (3, "merge hash spark spark merge"),
        (4, "hash only here"),
        (5, "spark merge no middle term"),
        (6, "SPARK Hash MERGE case test"),
        (17, "spark hash merge again"),
        (8, "completely unrelated words in this one"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _bm25_reference(rows, terms, k1=1.2, b=0.75):
    """Row-wise reference implementation (plain Python floats)."""
    toks = {d: t.lower().split(" ") for d, t in rows}
    toks = {d: [w for w in ws if w] for d, ws in toks.items()}
    dl = {d: len(ws) for d, ws in toks.items()}
    n = len(toks)
    avgdl = sum(dl.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for ws in toks.values() if term in ws)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d, ws in toks.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            s = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl[d] / avgdl)
            )
            nt, tot = out.get(d, (0, 0.0))
            out[d] = (nt + 1, tot + s)
    return out


def test_bm25_matches_reference(spark, docs):
    idx = build_bm25_index(docs, n_shards=4)
    stats = bm25_corpus_stats(docs)
    got = {
        r.doc_id: (r.n_terms, r.bm25)
        for r in bm25_search_indexed(idx, stats, ["spark", "merge"]).collect()
    }
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    want = _bm25_reference(rows, ["spark", "merge"])
    assert set(got) == set(want)
    for d, (nt, s) in want.items():
        assert got[d][0] == nt
        assert got[d][1] == pytest.approx(s, abs=1e-12)


def test_bm25_shard_count_invariant(spark, docs):
    stats = bm25_corpus_stats(docs)
    a = {
        r.doc_id: round(r.bm25, 10)
        for r in bm25_search_indexed(
            build_bm25_index(docs, n_shards=1), stats, ["spark", "hash"]
        ).collect()
    }
    b = {
        r.doc_id: round(r.bm25, 10)
        for r in bm25_search_indexed(
            build_bm25_index(docs, n_shards=16), stats, ["spark", "hash"]
        ).collect()
    }
    assert a == b


def test_bm25_rare_term_outscores_common(spark, docs):
    """idf must rank the rarer term higher at equal tf/dl."""
    idx = build_bm25_index(docs, n_shards=4)
    stats = bm25_corpus_stats(docs)
    # 'filter' appears in 1 doc, 'spark' in 6 — query them separately
    rare = bm25_search_indexed(idx, stats, ["filter"]).collect()
    common = bm25_search_indexed(idx, stats, ["spark"]).collect()
    assert max(r.bm25 for r in rare) > max(r.bm25 for r in common)


def test_bm25_dedupes_and_lowercases_query(spark, docs):
    idx = build_bm25_index(docs, n_shards=4)
    stats = bm25_corpus_stats(docs)
    a = {
        (r.doc_id, r.n_terms, round(r.bm25, 10))
        for r in bm25_search_indexed(idx, stats, ["SPARK", "spark", "Merge"]).collect()
    }
    b = {
        (r.doc_id, r.n_terms, round(r.bm25, 10))
        for r in bm25_search_indexed(idx, stats, ["spark", "merge"]).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        bm25_search_indexed(idx, stats, ["", ""])


def test_rrf_fuse_algebra(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc_id long, rank int"
    )
    got = {r.doc_id: (r.n_lists, r.rrf) for r in rrf_fuse([a, b], k=60).collect()}
    want = {
        1: (2, 1 / 61 + 1 / 62),
        2: (1, 1 / 62),
        3: (2, 1 / 63 + 1 / 61),
        9: (1, 1 / 63),
    }
    assert set(got) == set(want)
    for d, (nl, s) in want.items():
        assert got[d][0] == nl
        assert got[d][1] == pytest.approx(s, abs=0)
    # doc in both lists at rank 3 beats doc in one list at rank 1
    assert got[3][1] > got[9][1]
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_vocab_growth_invariants(spark):
    """Contract query invariants: cumulative curve is monotone
    non-decreasing, per-batch increments sum to the distinct trigram
    count, and every trigram is counted exactly once (first batch)."""
    from chainalytic_framework_spark.contract import _QUERIES

    out = _QUERIES["vocab_growth_documents"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 2
    batches = [r.batch for r in out]
    assert batches == sorted(batches)
    cum = 0
    for r in out:
        assert r.new_terms >= 1
        cum += r.new_terms
        assert r.vocab_size == cum
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tris = (
        docs.select(F.split(F.lower("text"), " ", -1).alias("t"))
        .where(F.size("t") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3),"
                    " i -> concat_ws(' ', slice(t, i + 1, 3)))"
                )
            ).alias("g")
        )
        .agg(F.countDistinct("g"))
        .collect()[0][0]
    )
    assert cum == tris
