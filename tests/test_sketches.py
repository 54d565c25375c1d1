"""HLL sketch partials: cascade-merge correctness and error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.fold import prepare_observations
from chainalytic_framework_spark.operators.sketches import (
    url_sketch_downsample,
    url_sketch_rollup,
    with_estimate,
)
from chainalytic_framework_spark.plans.pipeline import run_pipeline
from chainalytic_framework_spark.synth import generate_pages
from chainalytic_framework_spark.tables import TableStore


def _assert_close(est_df, exact_df, keys):
    j = est_df.join(exact_df, keys).select("distinct_urls_est", "exact")
    bad = j.where(
        (F.abs(F.col("distinct_urls_est") - F.col("exact")) > 5)
        & (F.abs(F.col("distinct_urls_est") - F.col("exact")) / F.col("exact") > 0.05)
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_sketch_cascade_error_bound(spark, pages):
    """Sketches built at 1m and UNIONED up to 1d must estimate within
    the HLL error bound of the exact distinct count computed from raw."""
    obs = prepare_observations(pages).cache()
    sk = url_sketch_rollup(obs, "1m")
    for child in ("1h", "1d"):
        sk = url_sketch_downsample(sk, child)
    est = with_estimate(sk)
    exact = (
        obs.select(
            F.timestamp_seconds((F.col("warc_ts").cast("long") / 86400).cast("long") * 86400)
            .alias("bucket_start"),
            "lang",
            "url",
        )
        .groupBy("bucket_start", "lang")
        .agg(F.count_distinct("url").alias("exact"))
    )
    _assert_close(est, exact, ["bucket_start", "lang"])
    # merged point_count partial must stay exact
    pc = sk.groupBy().agg(F.sum("point_count").alias("n")).first()["n"]
    assert pc == obs.count()


def test_pipeline_writes_sketch_tiers(spark, tmp_path):
    pages = generate_pages(spark, 3000).cache()
    store = TableStore(spark, str(tmp_path / "wh"))
    run_pipeline(spark, pages, store, with_fold=False, with_sketches=True)
    for t in ("1m", "1h", "1d", "30d"):
        assert store.exists(f"sketch_{t}"), t
    est = with_estimate(store.read("sketch_1d"))
    exact = (
        prepare_observations(pages)
        .select(
            F.timestamp_seconds((F.col("warc_ts").cast("long") / 86400).cast("long") * 86400)
            .alias("bucket_start"),
            "lang",
            "url",
        )
        .groupBy("bucket_start", "lang")
        .agg(F.count_distinct("url").alias("exact"))
    )
    _assert_close(est, exact, ["bucket_start", "lang"])


def test_kll_quantile_cascade_error_bound(spark, pages):
    """KLL partials built at 1m and MERGED up to 1d must land within the
    sketch's rank-error bound of the exact per-bucket percentiles."""
    from chainalytic_framework_spark.operators.sketches import (
        quantile_sketch_downsample,
        quantile_sketch_rollup,
        with_quantiles,
    )

    obs = prepare_observations(pages).cache()
    sk = quantile_sketch_rollup(obs, "1m", value_col="text_len")
    for child in ("1h", "1d"):
        sk = quantile_sketch_downsample(sk, child)
    est = with_quantiles(sk, qs=(0.5, 0.95))

    exact = (
        obs.select(
            F.timestamp_seconds((F.col("warc_ts").cast("long") / 86400).cast("long") * 86400)
            .alias("bucket_start"),
            "lang",
            "text_len",
        )
        .groupBy("bucket_start", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(text_len, 0.5)").alias("x50"),
            F.expr("percentile(text_len, 0.95)").alias("x95"),
            F.expr("percentile(text_len, 0.465)").alias("x50_lo"),
            F.expr("percentile(text_len, 0.535)").alias("x50_hi"),
            F.expr("percentile(text_len, 0.915)").alias("x95_lo"),
            F.expr("percentile(text_len, 0.985)").alias("x95_hi"),
        )
    )
    # KLL k=200 guarantees ~1.3% rank error; allow 3.5% rank slack:
    # the q-th estimate must lie within the exact [q-3.5%, q+3.5%] band.
    # Groups with n < 50 are excluded — there Spark's exact percentile
    # INTERPOLATES between data values while KLL returns an actual data
    # value, so the comparison is structural noise, not sketch error.
    j = est.join(exact, ["bucket_start", "lang"]).where("n >= 50")
    bad = j.where(
        (F.col("q50") < F.col("x50_lo")) | (F.col("q50") > F.col("x50_hi"))
        | (F.col("q95") < F.col("x95_lo")) | (F.col("q95") > F.col("x95_hi"))
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_theta_retention_error_bound(spark, pages):
    """Theta-sketch retention estimates must track the exact day-over-day
    intersection within 5% (or ±5 keys on small days)."""
    from chainalytic_framework_spark.operators.sketches import (
        retained_estimate,
        theta_key_sketch_daily,
    )

    obs = prepare_observations(pages).cache()
    est = retained_estimate(theta_key_sketch_daily(obs, key_col="url"))

    d = obs.select(F.to_date("warc_ts").alias("day"), "url").distinct()
    a, b = d.alias("a"), d.alias("b")
    exact = (
        a.join(b, (F.col("a.url") == F.col("b.url"))
               & (F.col("b.day") == F.date_add(F.col("a.day"), 1)))
        .groupBy(F.col("b.day").alias("day"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    j = est.join(exact, "day")
    bad = j.where(
        (F.abs(F.col("retained_est") - F.col("exact")) > 5)
        & (F.abs(F.col("retained_est") - F.col("exact")) / F.col("exact") > 0.05)
    )
    assert j.count() > 0
    assert bad.count() == 0, bad.limit(5).collect()
