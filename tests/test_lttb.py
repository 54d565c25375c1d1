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


def _int_series(spark, n=500):
    rows = []
    base_t, base_v = 1_700_000_000, 50_000
    for i in range(n):
        v = int(round(math.sin(i / 25.0) * 10_000)) + base_v
        if i == 137:
            v = 1_000_000  # spike
        rows.append((1, base_t + i * 60, v))
    return spark.createDataFrame(rows, "k long, t long, v long")


def test_lttb_exact_counts_endpoints_and_spike(spark):
    from chainalytic_framework_spark.operators.lttb import lttb_downsample_exact

    df = _int_series(spark)
    out = lttb_downsample_exact(df, ["k"], "t", "v", 60).collect()
    assert len(out) == 60
    ts = sorted(r["t"] for r in out)
    assert ts[0] == 1_700_000_000 and ts[-1] == 1_700_000_000 + 499 * 60
    assert any(r["v"] == 1_000_000 for r in out)


def test_lttb_exact_matches_float_on_unambiguous_series(spark):
    """On a series whose triangle areas are far from ties, the integer
    selection and the float selection pick identical points (the exact
    variant is a reformulation, not a different algorithm)."""
    from chainalytic_framework_spark.operators.lttb import lttb_downsample_exact

    df = _int_series(spark)
    ex = {(r["t"], r["v"]) for r in lttb_downsample_exact(df, ["k"], "t", "v", 40).collect()}
    fl = {
        (int(r["t"]), int(r["v"]))
        for r in lttb_downsample(
            df.selectExpr("k", "cast(t as double) t", "cast(v as double) v"),
            ["k"], "t", "v", 40,
        ).collect()
    }
    assert ex == fl


def test_lttb_exact_translation_invariant(spark):
    """Rebasing t/v by constants changes nothing — the documented
    invariance the int64 overflow bound relies on."""
    from chainalytic_framework_spark.operators.lttb import lttb_downsample_exact

    df = _int_series(spark)
    a = {(r["t"], r["v"]) for r in lttb_downsample_exact(df, ["k"], "t", "v", 40).collect()}
    shifted = df.selectExpr("k", "t + 123456 as t", "v - 777 as v")
    b = {(r["t"] - 123456, r["v"] + 777) for r in lttb_downsample_exact(shifted, ["k"], "t", "v", 40).collect()}
    assert a == b
