"""KMV intersection sketches (operators/kmv.py) and hysteresis alert
episodes (operators/states.py::alert_episodes)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.kmv import (
    M60,
    kmv_estimate,
    kmv_overlap,
    kmv_sketch,
)
from chainalytic_framework_spark.operators.states import alert_episodes


def _h60(v, seed=7) -> int:
    return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)


def _vals_df(spark, pairs):
    return spark.createDataFrame(pairs, "grp string, v long")


# ---------------------------------------------------------------- KMV


def test_unsaturated_sketch_is_the_exact_hash_set(spark):
    vals = [("a", i) for i in range(10)]
    sk = kmv_sketch(_vals_df(spark, vals), ["grp"], "v", k=16).collect()
    assert len(sk) == 1
    row = sk[0]
    assert row["sk_size"] == 10
    assert row["hashes"] == sorted(_h60(i) for i in range(10))
    est = kmv_estimate(
        kmv_sketch(_vals_df(spark, vals), ["grp"], "v", k=16), k=16
    ).collect()[0]
    assert est["distinct_est"] == 10  # exact below saturation


def test_saturated_estimate_matches_formula_and_is_accurate(spark):
    n = 5000
    vals = [("a", i) for i in range(n)] * 2  # duplicates must not matter
    k = 256
    row = kmv_estimate(
        kmv_sketch(_vals_df(spark, vals), ["grp"], "v", k=k), k=k
    ).collect()[0]
    hs = sorted(_h60(i) for i in range(n))[:k]
    assert row["hashes"] == hs
    expect = (k - 1) * M60 // hs[-1]
    assert row["distinct_est"] == expect
    assert abs(expect - n) / n < 0.25  # ~4 sigma at k=256


def test_shard_prune_is_lossless(spark):
    vals = [("a", i * 7) for i in range(2000)]
    df = _vals_df(spark, vals)
    one = kmv_sketch(df, ["grp"], "v", k=64, shards=1).collect()[0]
    many = kmv_sketch(df, ["grp"], "v", k=64, shards=32).collect()[0]
    assert one["hashes"] == many["hashes"]


def test_parallelism_invariance(spark):
    vals = [("g%d" % (i % 3), i) for i in range(3000)]
    df = _vals_df(spark, vals)
    a = {
        r["grp"]: r["hashes"]
        for r in kmv_sketch(df.repartition(1), ["grp"], "v", k=32).collect()
    }
    b = {
        r["grp"]: r["hashes"]
        for r in kmv_sketch(df.repartition(16), ["grp"], "v", k=32).collect()
    }
    assert a == b


def test_overlap_exact_mode_is_set_arithmetic(spark):
    a = [("a", i) for i in range(10)]
    b = [("b", i) for i in range(5, 15)]  # |A∩B|=5, |A∪B|=15
    sk = kmv_sketch(_vals_df(spark, a + b), ["grp"], "v", k=16)
    row = kmv_overlap(sk, ["grp"], k=16).collect()[0]
    assert row["union_est"] == 15
    assert row["inter_est"] == 5 * 15 // 15
    assert row["jaccard_x1e4"] == 5 * 10000 // 15


def test_overlap_saturated_estimates_are_accurate(spark):
    a = [("a", i) for i in range(6000)]
    b = [("b", i) for i in range(3000, 9000)]  # true j=3000/9000=1/3
    k = 256
    sk = kmv_sketch(_vals_df(spark, a + b), ["grp"], "v", k=k)
    row = kmv_overlap(sk, ["grp"], k=k).collect()[0]
    assert abs(row["union_est"] - 9000) / 9000 < 0.25
    assert abs(row["jaccard_x1e4"] - 3333) < 1200
    assert abs(row["inter_est"] - 3000) / 3000 < 0.45


def test_overlap_pairs_are_strictly_ordered_once(spark):
    vals = [(g, i) for g in ("x", "y", "z") for i in range(20)]
    sk = kmv_sketch(_vals_df(spark, vals), ["grp"], "v", k=16)
    pairs = {
        (r["grp_a"], r["grp_b"])
        for r in kmv_overlap(sk, ["grp"], k=16).collect()
    }
    assert pairs == {("x", "y"), ("x", "z"), ("y", "z")}


def test_kmv_k_validation(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_vals_df(spark, [("a", 1)]), ["grp"], "v", k=1)


# ------------------------------------------------- alert episodes


def _series(spark, rows):
    return spark.createDataFrame(rows, "key string, t long, v long")


def test_hysteresis_hand_case(spark):
    # open at >=100, close at <=50; dead band (50, 100) keeps it open
    rows = [
        ("a", 1, 10),
        ("a", 2, 120),  # opens
        ("a", 3, 70),  # dead band: still firing
        ("a", 4, 150),  # peak
        ("a", 5, 40),  # closes (not part of the episode)
        ("a", 6, 80),  # dead band while CLOSED: must not open
        ("a", 7, 110),  # opens again, open-ended at series end
    ]
    out = sorted(
        alert_episodes(
            _series(spark, rows), ["key"], "t", "v", hi=100, lo=50
        ).collect(),
        key=lambda r: r["episode"],
    )
    assert len(out) == 2
    e1, e2 = out
    assert (e1["episode_start"], e1["episode_end"]) == (2, 4)
    assert e1["n_buckets"] == 3 and e1["peak_value"] == 150
    assert (e2["episode_start"], e2["episode_end"]) == (7, 7)
    assert e2["n_buckets"] == 1 and e2["peak_value"] == 110


def test_dead_band_alone_never_opens(spark):
    rows = [("a", t, 75) for t in range(1, 6)]
    out = alert_episodes(
        _series(spark, rows), ["key"], "t", "v", hi=100, lo=50
    ).collect()
    assert out == []


def test_keys_are_isolated_and_numbering_is_per_key(spark):
    rows = [
        ("a", 1, 200),
        ("a", 2, 0),
        ("a", 3, 200),
        ("b", 1, 200),
    ]
    out = alert_episodes(
        _series(spark, rows), ["key"], "t", "v", hi=100, lo=50
    ).collect()
    by = {(r["key"], r["episode"]) for r in out}
    assert by == {("a", 1), ("a", 2), ("b", 1)}


def test_episode_parallelism_invariance(spark):
    rows = [
        ("k%d" % (i % 7), t, (i * 37 + t * 91) % 300)
        for i in range(40)
        for t in range(30)
    ]
    df = _series(spark, rows).groupBy("key", "t").agg(F.max("v").alias("v"))
    a = sorted(
        map(
            tuple,
            alert_episodes(
                df.repartition(1), ["key"], "t", "v", hi=200, lo=80
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            alert_episodes(
                df.repartition(16), ["key"], "t", "v", hi=200, lo=80
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_threshold_validation(spark):
    with pytest.raises(ValueError):
        alert_episodes(_series(spark, [("a", 1, 1)]), ["key"], "t", "v", 50, 50)


# ------------------------------------------------- merge / ranges


def test_merge_of_partial_sketches_equals_direct_sketch(spark):
    """Lossless mergeability: k-min of the union of per-day k-mins ==
    k-min of the whole range's distinct set — EXACT equality, the same
    contract as the additive tier cascade."""
    from chainalytic_framework_spark.operators.kmv import kmv_merge

    rows = [("g%d" % (i % 2), i % 5, (i * 13) % 900) for i in range(4000)]
    df = spark.createDataFrame(rows, "grp string, day long, v long")
    daily = kmv_sketch(df, ["grp", "day"], "v", k=32)
    merged = {
        r["grp"]: r["hashes"]
        for r in kmv_merge(daily, ["grp"], k=32).collect()
    }
    direct = {
        r["grp"]: r["hashes"]
        for r in kmv_sketch(df, ["grp"], "v", k=32).collect()
    }
    assert merged == direct and len(merged) == 2


def test_overlap_ranges_exact_mode(spark):
    from chainalytic_framework_spark.operators.kmv import kmv_overlap_ranges

    a = kmv_sketch(
        _vals_df(spark, [("g", i) for i in range(10)]), ["grp"], "v", k=16
    )
    b = kmv_sketch(
        _vals_df(spark, [("g", i) for i in range(5, 15)]), ["grp"], "v", k=16
    )
    row = kmv_overlap_ranges(a, b, ["grp"], k=16).collect()[0]
    assert row["union_est"] == 15
    assert row["inter_est"] == 5
    assert row["jaccard_x1e4"] == 5 * 10000 // 15


def test_overlap_ranges_drops_one_sided_keys(spark):
    from chainalytic_framework_spark.operators.kmv import kmv_overlap_ranges

    a = kmv_sketch(
        _vals_df(spark, [("only_a", 1), ("both", 2)]), ["grp"], "v", k=8
    )
    b = kmv_sketch(_vals_df(spark, [("both", 2)]), ["grp"], "v", k=8)
    out = kmv_overlap_ranges(a, b, ["grp"], k=8).collect()
    assert {r["grp"] for r in out} == {"both"}
