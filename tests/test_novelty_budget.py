"""Batch novelty curve and largest-remainder crawl-budget apportionment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.novelty import batch_novelty
from chainalytic_framework_spark.operators.recrawl import apportion_budget

# ----------------------------------------------------------- novelty


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_batch_fully_novel(spark):
    rows = [(0, "a b c d"), (1, "e f g h")]
    out = batch_novelty(_docs(spark, rows), F.lit(0)).collect()
    assert len(out) == 1
    r = out[0]
    # doc 0: shingles {a b c, b c d}; doc 1: {e f g, f g h} -> 4 pairs
    assert (r["n_docs"], r["n_pairs"], r["n_novel"]) == (2, 4, 4)
    assert r["novelty_x1e4"] == 10000


def test_exact_repeat_batch_zero_novelty(spark):
    rows = [(0, "a b c d"), (1, "a b c d")]
    out = batch_novelty(
        _docs(spark, rows), F.col("doc_id"), id_col="doc_id"
    ).orderBy("batch")
    got = {r["batch"]: r for r in out.collect()}
    assert got[0]["novelty_x1e4"] == 10000
    # batch 1 repeats batch 0's text verbatim -> nothing novel
    assert got[1]["n_pairs"] == 2 and got[1]["n_novel"] == 0
    assert got[1]["novelty_x1e4"] == 0


def test_within_batch_duplication_still_novel(spark):
    # Two identical docs in the SAME batch: dedup is vs history, not
    # within the batch, so both docs' pairs count as novel.
    rows = [(0, "x y z w"), (1, "x y z w")]
    r = batch_novelty(_docs(spark, rows), F.lit(5)).collect()[0]
    assert (r["n_docs"], r["n_pairs"], r["n_novel"]) == (2, 4, 4)


def test_short_docs_contribute_nothing(spark):
    rows = [(0, "a b"), (1, "only two"), (2, "a b c")]
    out = batch_novelty(_docs(spark, rows), F.lit(0), k=3).collect()
    assert len(out) == 1
    r = out[0]
    # only doc 2 has >= 3 tokens -> one shingle
    assert (r["n_docs"], r["n_pairs"]) == (1, 1)


def test_partial_overlap_fraction(spark):
    # batch 1 doc shares exactly half its distinct shingles with batch 0.
    rows = [(0, "a b c d"), (10, "a b c q")]
    out = batch_novelty(
        _docs(spark, rows), (F.col("doc_id") / 10).cast("long")
    ).orderBy("batch")
    got = {r["batch"]: r for r in out.collect()}
    # batch 1 shingles: {a b c (old), b c q (new)} -> 1/2 novel
    assert got[1]["n_pairs"] == 2 and got[1]["n_novel"] == 1
    assert got[1]["novelty_x1e4"] == 5000


# ------------------------------------------------------ apportionment


def _weights(spark, rows):
    return spark.createDataFrame(rows, "host long, w long")


def _check(spark, rows, budget, shards=64):
    out = apportion_budget(
        _weights(spark, rows), ["host"], "w", budget, shards=shards
    ).collect()
    quotas = {r["host"]: r["quota"] for r in out}
    assert sum(quotas.values()) == budget if any(
        w > 0 for _, w in rows
    ) else sum(quotas.values()) == 0
    return quotas


def test_budget_sums_exactly(spark):
    rows = [(h, (h * 37) % 101 + 1) for h in range(50)]
    quotas = _check(spark, rows, 1000)
    assert len(quotas) == 50


def test_proportional_within_one_slot(spark):
    # Hamilton satisfies quota: floor(share) <= quota <= ceil(share).
    rows = [(0, 10), (1, 20), (2, 30), (3, 40)]
    quotas = _check(spark, rows, 17)
    w_total = 100
    for h, w in rows:
        exact = 17 * w / w_total
        assert int(exact) <= quotas[h] <= int(exact) + 1


def test_zero_weight_gets_zero(spark):
    rows = [(0, 0), (1, 5), (2, 5)]
    quotas = _check(spark, rows, 7)
    assert quotas[0] == 0 and quotas[1] + quotas[2] == 7


def test_zero_budget_all_zero(spark):
    rows = [(0, 3), (1, 9)]
    out = apportion_budget(_weights(spark, rows), ["host"], "w", 0).collect()
    assert all(r["quota"] == 0 for r in out)


def test_shard_count_invariant(spark):
    # The two-phase top-R prune must be a pure optimization: quotas
    # identical at any shard count (incl. shards=1, the naive path).
    rows = [(h, (h * 13) % 7 + 1) for h in range(40)]
    a = _check(spark, rows, 333, shards=1)
    b = _check(spark, rows, 333, shards=64)
    assert a == b


def test_tiny_budget_ties_break_by_host(spark):
    # Equal weights, budget < n_hosts: bonus slots go to remainder-DESC
    # then host-ASC -> lowest host ids win deterministically.
    rows = [(h, 10) for h in range(5)]
    quotas = _check(spark, rows, 3)
    assert quotas == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0}


def test_negative_budget_raises(spark):
    with pytest.raises(ValueError):
        apportion_budget(_weights(spark, [(0, 1)]), ["host"], "w", -1)
