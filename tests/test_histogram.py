"""Histogram tiers (operators/histogram.py): exact bucket math,
lossless cascade merge, quantile-from-histogram semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.histogram import (
    decade_digit_bucket,
    entropy_by_group,
    histogram_downsample,
    histogram_rollup,
    quantile_from_histogram,
)


def test_decade_digit_bucket_exact(spark):
    cases = [(-5, 0), (0, 0), (1, 1), (7, 7), (9, 9), (10, 10), (19, 10),
             (99, 90), (100, 100), (955, 900), (1000, 1000), (65535, 60000),
             (10**12 + 7, 10**12)]
    df = spark.createDataFrame([(c,) for c, _ in cases], "c long").select(
        "c", decade_digit_bucket(F.col("c")).alias("lo")
    )
    got = {r["c"]: r["lo"] for r in df.collect()}
    for c, want in cases:
        assert got[c] == want, (c, got[c], want)


def test_bucket_bound_relative_error(spark):
    # the lower bound underestimates by < one leading-digit step:
    # lo <= c < lo + 10^(digits-1), i.e. relative gap <= 1/first_digit <= 100%
    # but for the BOUND itself: c/lo < 2 when first digit >= 1 (c < lo+step <= 2*lo)
    vals = [(v,) for v in range(1, 5000, 7)]
    df = spark.createDataFrame(vals, "c long").select(
        "c", decade_digit_bucket(F.col("c")).alias("lo")
    )
    for r in df.collect():
        assert r["lo"] <= r["c"] < 2 * r["lo"]


@pytest.fixture(scope="module")
def ev(spark):
    # 2 series, values spanning several decades, 3 days of minutes
    rows = []
    for i in range(4000):
        t = i * 97  # ~4.5 days, irregular minute coverage
        rows.append(("a", t, (i * i) % 7919 + 1))
        if i % 3 == 0:
            rows.append(("b", t, (i * 31) % 997 + 1))
    return spark.createDataFrame(rows, "k string, t long, v long").cache()


def _rollup(ev, secs):
    be = ((F.col("t") / secs).cast("long") * secs).alias("bucket_epoch")
    return histogram_rollup(ev, be, ["k"], F.col("v"))


def test_cascade_merge_lossless(ev):
    # 1m -> 1h -> 1d merged == direct 1d rollup, bit-identical
    h1m = _rollup(ev, 60)
    merged = histogram_downsample(histogram_downsample(h1m, ["k"], 3600), ["k"], 86400)
    direct = _rollup(ev, 86400)
    assert merged.exceptAll(direct).isEmpty() and direct.exceptAll(merged).isEmpty()


def test_total_count_preserved(ev):
    h = _rollup(ev, 3600)
    assert h.agg(F.sum("hb_count")).first()[0] == ev.count()


def test_quantile_semantics_vs_exact(ev):
    # the histogram p90 bucket is exactly the bucket of the discrete
    # rank statistic v* = smallest v with |{x <= v}| >= ceil(0.9 n)
    from pyspark.sql import Window

    h = _rollup(ev, 86400)
    q = quantile_from_histogram(h, ["k"], 90, out_col="p90_lo")
    be = ((F.col("t") / 86400).cast("long") * 86400).alias("bucket_epoch")
    raw = ev.select("k", be, "v")
    w = Window.partitionBy("k", "bucket_epoch").orderBy("v")
    wall = Window.partitionBy("k", "bucket_epoch")
    vstar = (
        raw.select(
            "k", "bucket_epoch", "v",
            F.count(F.lit(1)).over(w).alias("_cum"),
            F.count(F.lit(1)).over(wall).alias("_n"),
        )
        .where(F.col("_cum") >= F.ceil(F.col("_n") * 90 / 100).cast("long"))
        .groupBy("k", "bucket_epoch")
        .agg(F.min("v").alias("vstar"))
        .select("k", "bucket_epoch", decade_digit_bucket(F.col("vstar")).alias("want_lo"))
    )
    joined = q.join(vstar, ["k", "bucket_epoch"]).collect()
    assert joined
    for r in joined:
        assert r["p90_lo"] == r["want_lo"], r


def test_quantile_exact_on_degenerate_buckets(spark):
    # every value its own bucket (single-digit values): histogram quantile
    # == exact discrete quantile (smallest v with cum >= ceil(0.5*n))
    df = spark.createDataFrame(
        [("a", 0, v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9]], "k string, t long, v long"
    )
    h = _rollup(df, 60)
    got = quantile_from_histogram(h, ["k"], 50, out_col="p50").first()
    assert got["p50"] == 5


# --------------------------------------------------------------------------
# psi_drift
# --------------------------------------------------------------------------


def _psi(spark, rows):
    from chainalytic_framework_spark.operators.histogram import psi_drift

    df = spark.createDataFrame(rows, "k string, w int, bin long")
    return {r.k: r for r in psi_drift(df, ["k"], "w", "bin").collect()}


def test_psi_identical_distributions_zero(spark):
    rows = [("a", w, b) for w in (0, 1) for b in (10, 20, 30) for _ in range(5)]
    out = _psi(spark, rows)["a"]
    assert out.psi_x1e8 == 0
    assert out.n_bins_both == 3
    assert out.n_bins_a_only == 0 and out.n_bins_b_only == 0


def test_psi_shift_is_positive_and_matches_python(spark):
    import math

    a = [10] * 8 + [20] * 2
    b = [10] * 2 + [20] * 8
    rows = [("a", 0, x) for x in a] + [("a", 1, x) for x in b]
    out = _psi(spark, rows)["a"]
    exp = sum(
        round((ca / 10 - cb / 10) * math.log((ca * 10) / (cb * 10)) * 1e8)
        for ca, cb in ((8, 2), (2, 8))
    )
    assert out.psi_x1e8 == exp > 0


def test_psi_appeared_vanished_bins_reported_not_smoothed(spark):
    rows = [("a", 0, 10), ("a", 0, 20), ("a", 1, 10), ("a", 1, 30)]
    out = _psi(spark, rows)["a"]
    assert out.n_bins_both == 1
    assert out.n_bins_a_only == 1  # bin 20 vanished
    assert out.n_bins_b_only == 1  # bin 30 appeared
    assert out.psi_x1e8 == 0  # the shared bin has equal proportions


# --- entropy_by_group -------------------------------------------------------


def test_entropy_uniform_is_ln_k(spark):
    import math

    rows = [("s", f"c{i % 4}") for i in range(400)]
    out = entropy_by_group(
        spark.createDataFrame(rows, ["g", "cat"]), ["g"], "cat"
    ).collect()[0]
    # 4 uniform categories: per-term round((1/4)*ln(4)*1e8) * 4
    assert out.entropy_x1e8 == 4 * round(0.25 * math.log(4.0) * 1e8)
    assert out.n_categories == 4 and out.n_total == 400


def test_entropy_single_category_zero(spark):
    rows = [("s", "only")] * 10
    out = entropy_by_group(
        spark.createDataFrame(rows, ["g", "cat"]), ["g"], "cat"
    ).collect()[0]
    assert out.entropy_x1e8 == 0 and out.n_categories == 1


def test_entropy_precounted_equals_raw(spark):
    rows = [("s", "a")] * 7 + [("s", "b")] * 3 + [("t", "a")] * 5
    raw = spark.createDataFrame(rows, ["g", "cat"])
    pre = raw.groupBy("g", "cat").count()
    a = {r.g: r.entropy_x1e8
         for r in entropy_by_group(raw, ["g"], "cat").collect()}
    b = {r.g: r.entropy_x1e8
         for r in entropy_by_group(pre, ["g"], "cat", "count").collect()}
    assert a == b
