"""Heavy-hitter partials (operators/heavyhitters.py): exactness at
capacity, Misra-Gries error bounds under truncation, heavy-key
retention, and merge-vs-direct consistency."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.heavyhitters import (
    topk_partial_merge,
    topk_partial_rollup,
)


@pytest.fixture(scope="module")
def stream(spark):
    # 6 hourly buckets, Zipf-ish keys: key i appears ~ 600/i times/hour
    rng = random.Random(7)
    rows = []
    for h in range(6):
        for i in range(1, 40):
            # rotate the mid-rank keys per hour so hourly top-8 sets differ
            # (k01-k03 stay globally heavy; the tail churns) — this is what
            # makes the merge genuinely lossy at small k
            rank = i if i <= 3 else 4 + (i - 4 + 7 * h) % 36
            for _ in range(600 // rank):
                rows.append((h * 3600 + rng.randrange(3600), f"k{i:02d}"))
    return spark.createDataFrame(rows, "t long, key string").cache()


def _be(secs):
    return (F.col("t") / secs).cast("long") * secs


def _exact(stream, secs):
    return {
        (r["b"], r["key"]): r["c"]
        for r in stream.select(_be(secs).alias("b"), "key")
        .groupBy("b", "key")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_exact_when_capacity_covers_keys(stream):
    partials = topk_partial_rollup(stream, _be(3600), "key", k=100)
    merged = topk_partial_merge(partials, 86400, k=100)
    truth = _exact(stream, 86400)
    got = merged.collect()
    assert len(got) == len(truth)
    for r in got:
        assert r["exact"] and r["err"] == 0
        assert r["cnt_lb"] == truth[(r["bucket_epoch"], r["key"])]


def test_error_bounds_contain_truth_under_truncation(stream):
    partials = topk_partial_rollup(stream, _be(3600), "key", k=8)
    merged = topk_partial_merge(partials, 86400, k=50)
    truth = _exact(stream, 86400)
    got = merged.collect()
    assert got
    saw_inexact = False
    for r in got:
        true_c = truth[(r["bucket_epoch"], r["key"])]
        assert r["cnt_lb"] <= true_c <= r["cnt_lb"] + r["err"], (r, true_c)
        saw_inexact = saw_inexact or not r["exact"]
    assert saw_inexact  # k=8 over 39 keys must actually truncate


def test_heavy_keys_always_retained(stream):
    # per-bucket frequency > n_bucket/k can never be dropped; k1/k2 are
    # far above that bar at k=8 and must surface in the merged top
    partials = topk_partial_rollup(stream, _be(3600), "key", k=8)
    merged = topk_partial_merge(partials, 86400, k=8)
    keys = {r["key"] for r in merged.collect()}
    assert {"k01", "k02", "k03"} <= keys


def test_top_ranks_exact_on_skewed_head(stream):
    # the head of the merged ranking must match the exact ranking as
    # long as lower bounds separate: check rank-1 key and count
    partials = topk_partial_rollup(stream, _be(3600), "key", k=8)
    merged = topk_partial_merge(partials, 86400, k=1).first()
    truth = _exact(stream, 86400)
    best = max(truth.items(), key=lambda kv: (kv[1], ))
    assert merged["key"] == "k01"
    assert merged["cnt_lb"] == truth[(merged["bucket_epoch"], "k01")] == best[1]


def test_summary_columns_shape(stream):
    partials = topk_partial_rollup(stream, _be(3600), "key", k=8).collect()
    per_bucket = {}
    for r in partials:
        per_bucket.setdefault(r["bucket_epoch"], []).append(r)
    for b, rows in per_bucket.items():
        assert len(rows) == 8  # 39 keys > k=8: every bucket truncates
        oms = {r["others_max"] for r in rows}
        ots = {r["others_total"] for r in rows}
        assert len(oms) == 1 and len(ots) == 1  # bucket-constant columns
        (om,), (ot,) = oms, ots
        assert om >= 1 and ot >= om
        # every kept count must dominate the dropped maximum
        assert min(r["cnt"] for r in rows) >= om


def test_no_truncation_yields_null_summary(spark):
    df = spark.createDataFrame([(0, "a"), (0, "a"), (0, "b")], "t long, key string")
    rows = topk_partial_rollup(df, _be(3600), "key", k=8).collect()
    assert len(rows) == 2
    assert all(r["others_max"] is None and r["others_total"] is None for r in rows)
