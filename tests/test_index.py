"""Inverted index (operators/index.py): indexed search equals raw
search, shard bounding, posting determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.index import (
    build_inverted_index,
    conjunctive_search_indexed,
    conjunctive_search_raw,
    term_stats,
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
        (17, "spark hash merge again"),  # doc_id collides with 1 mod 16
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_indexed_equals_raw(docs):
    terms = ["spark", "hash", "merge"]
    idx = build_inverted_index(docs, n_shards=4)
    a = {(r["doc_id"], r["sum_tf"]) for r in conjunctive_search_indexed(idx, terms).collect()}
    b = {(r["doc_id"], r["sum_tf"]) for r in conjunctive_search_raw(docs, terms).collect()}
    assert a == b
    assert {d for d, _ in a} == {1, 3, 6, 17}  # lowercased match includes 6


def test_sum_tf_counts_all_occurrences(docs):
    idx = build_inverted_index(docs, n_shards=4)
    got = {r["doc_id"]: r["sum_tf"] for r in
           conjunctive_search_indexed(idx, ["spark", "hash", "merge"]).collect()}
    assert got[3] == 2 + 1 + 2  # spark x2, hash x1, merge x2


def test_sharding_bounds_posting_rows(docs):
    idx = build_inverted_index(docs, n_shards=4).collect()
    for r in idx:
        assert len(r["postings"]) == r["doc_freq"]
        for p in r["postings"]:
            assert p["doc_id"] % 4 == r["shard"]
        ids = [p["doc_id"] for p in r["postings"]]
        assert ids == sorted(ids)  # deterministic layout


def test_term_stats_min_df(docs):
    st = {r["term"]: r for r in term_stats(docs, min_df=3).collect()}
    assert set(st) == {"spark", "hash", "merge"}
    assert st["spark"]["doc_freq"] == 6
    assert st["spark"]["tf_total"] == 8
    assert st["spark"]["min_doc_id"] == 1


def test_empty_result_when_term_missing(docs):
    idx = build_inverted_index(docs, n_shards=4)
    assert conjunctive_search_indexed(idx, ["spark", "zzznope"]).count() == 0
