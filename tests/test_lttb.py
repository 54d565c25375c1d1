"""LTTB downsampling: endpoints kept, count honored, extremes
preserved, deterministic across partitionings."""

from __future__ import annotations

import math

from chainalytic_framework_spark.operators.lttb import lttb_downsample


def _series(spark, n=500):
    rows = []
    for i in range(n):
        v = math.sin(i / 25.0) * 100
        if i == 137:
            v = 10_000.0  # a spike LTTB must keep
        rows.append((1, float(i), v))
    return spark.createDataFrame(rows, "k long, t double, v double")


def test_lttb_counts_endpoints_and_spike(spark):
    df = _series(spark)
    out = lttb_downsample(df, ["k"], "t", "v", 60).collect()
    assert len(out) == 60
    ts = sorted(r["t"] for r in out)
    assert ts[0] == 0.0 and ts[-1] == 499.0  # endpoints always kept
    assert any(r["v"] == 10_000.0 for r in out)  # the spike survives


def test_lttb_short_series_passthrough(spark):
    df = _series(spark, n=20)
    out = lttb_downsample(df, ["k"], "t", "v", 60).collect()
    assert len(out) == 20


def test_lttb_partitioning_invariant(spark):
    df = _series(spark)
    a = {(r["t"], r["v"]) for r in lttb_downsample(df, ["k"], "t", "v", 40).collect()}
    b = {(r["t"], r["v"]) for r in lttb_downsample(df.repartition(13), ["k"], "t", "v", 40).collect()}
    assert a == b


def test_lttb_multiple_keys_independent(spark):
    d1 = _series(spark)
    d2 = d1.selectExpr("2 as k", "t", "v * 2 as v")
    both = d1.unionByName(d2)
    out = lttb_downsample(both, ["k"], "t", "v", 30)
    counts = {r["k"]: r["n"] for r in out.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    assert counts == {1: 30, 2: 30}
