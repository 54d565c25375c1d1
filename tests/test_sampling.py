"""Deterministic sampling properties: split disjoint/exhaustive,
partition-layout invariance, per-group reservoir size, stratified
rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.sampling import (
    hash_sample,
    reservoir_per_group,
    split_train_holdout,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod("id", 4)).cast("string").alias("lang"),
    )


def test_split_disjoint_and_exhaustive(spark):
    d = _docs(spark)
    train, hold = split_train_holdout(d, 0.25, "doc_id", seed=1)
    nt, nh = train.count(), hold.count()
    assert nt + nh == 2000
    assert train.join(hold, "doc_id", "inner").count() == 0
    # deterministic rate within binomial tolerance (p=.25, n=2000 → σ≈19)
    assert abs(nh - 500) < 100


def test_sample_invariant_under_repartition(spark):
    d = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(d, 0.1, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(d.repartition(17, "lang"), 0.1, "doc_id").collect()
    }
    c = {r["doc_id"] for r in hash_sample(d.coalesce(1), 0.1, "doc_id").collect()}
    assert a == b == c and len(a) > 0


def test_new_rows_join_same_split(spark):
    # growing the table never reassigns an existing row's side
    small, big = _docs(spark, 500), _docs(spark, 2000)
    h_small = {r["doc_id"] for r in split_train_holdout(small, 0.3, "doc_id")[1].collect()}
    h_big = {r["doc_id"] for r in split_train_holdout(big, 0.3, "doc_id")[1].collect()}
    assert h_small == {x for x in h_big if x < 500}


def test_stratified_rates(spark):
    d = _docs(spark, 4000)  # 1000 per lang
    s = stratified_sample(d, "lang", {"0": 0.05, "1": 0.5}, key="doc_id",
                          default_rate=0.2, seed=2)
    counts = {r["lang"]: r["n"] for r in
              s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["0"] < 120 and 380 < counts["1"] < 620
    assert 120 < counts.get("2", 0) < 320 and 120 < counts.get("3", 0) < 320


def test_reservoir_sizes_and_determinism(spark):
    d = _docs(spark, 100)  # 25 per lang
    r = reservoir_per_group(d, ["lang"], 7, key="doc_id", seed=5)
    sizes = {x["lang"]: x["n"] for x in
             r.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 7 for v in sizes.values())
    # k larger than the group keeps the whole group
    tiny = d.where("doc_id < 3")
    assert reservoir_per_group(tiny, ["lang"], 10, key="doc_id").count() == 3
    # identical pick under a different partitioning
    r2 = reservoir_per_group(d.repartition(13), ["lang"], 7, key="doc_id", seed=5)
    assert {tuple(x) for x in r.collect()} == {tuple(x) for x in r2.collect()}


def test_split_assign_exhaustive_disjoint_stable(spark):
    """Every row gets exactly one label; fractions land near targets;
    assignment is stable under repartitioning and incremental arrival."""
    import pytest

    from chainalytic_framework_spark.operators.sampling import split_assign

    df = spark.range(20_000).withColumnRenamed("id", "k")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(df, splits, key="k", seed=3)
    counts = {r["split"]: r["c"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == 20_000
    for name, frac in splits.items():
        assert abs(counts[name] / 20_000 - frac) < 0.02, (name, counts)

    # partition-layout independence + incremental stability
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {r["k"]: r["split"]
         for r in split_assign(df.repartition(17), splits, "k", seed=3).collect()}
    assert a == b
    late = {r["k"]: r["split"]
            for r in split_assign(df.where(F.col("k") >= 15_000), splits, "k", seed=3).collect()}
    assert all(a[k] == v for k, v in late.items())

    with pytest.raises(ValueError, match="sum"):
        split_assign(df, {"a": 0.5, "b": 0.4}, key="k")
