"""Cold-tier blobs: Spark-side encode/decode round-trip + compression."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.cold_store import decode_cold, encode_cold
from chainalytic_framework_spark.operators.rollup import rollup_pages

MEASURES = ["point_count", "byte_size", "text_len_sum"]


def test_cold_roundtrip(spark, pages):
    tier = rollup_pages(pages, "1h", grain="url").cache()
    cold = encode_cold(tier, MEASURES, n_buckets=16).cache()
    back = decode_cold(cold)

    # long-form original points
    orig = None
    for m in MEASURES:
        part = tier.select(
            "url", "url_hash", F.lit(m).alias("measure"), "bucket_start",
            F.col(m).cast("long").alias("value"),
        )
        orig = part if orig is None else orig.unionByName(part)

    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_cold_metadata_and_compression(spark, pages):
    tier = rollup_pages(pages, "1h", grain="url")
    cold = encode_cold(tier, MEASURES, n_buckets=16).cache()
    bad = cold.where(
        (F.col("n_points") <= 0) | (F.col("t1") < F.col("t0")) | (F.col("blob_bytes") <= 0)
    )
    assert bad.count() == 0
    # compression beats raw 16B/point on real series (header overhead
    # dominates below ~4 points — cold tiers only pack mature series)
    dense = cold.where(F.col("n_points") >= 16)
    assert dense.count() > 0
    tot = dense.agg(F.sum("raw_bytes").alias("raw"), F.sum("blob_bytes").alias("enc")).first()
    assert tot["enc"] < tot["raw"]


def test_series_points_unified_hot_cold(spark, pages):
    """Cold-migrating a tier then retention-dropping the old hot buckets
    must not change what series_points serves."""
    import datetime as dt

    from pyspark.sql import functions as F

    from chainalytic_framework_spark.operators.cold_store import encode_cold
    from chainalytic_framework_spark.operators.rollup import rollup_pages
    from chainalytic_framework_spark.queries import series_points

    tier = rollup_pages(pages, "1d", grain="url").cache()
    baseline = series_points(tier, None, measure="byte_size")

    cold = encode_cold(tier, measures=["byte_size"]).cache()
    cut = tier.agg(F.min("bucket_start")).first()[0] + dt.timedelta(days=3)
    hot_recent = tier.where(F.col("bucket_start") >= F.lit(cut))  # retention dropped the rest
    unified = series_points(hot_recent, cold, measure="byte_size")

    assert unified.exceptAll(baseline).count() == 0
    assert baseline.exceptAll(unified).count() == 0

    # single-url + window path (blob pruning on metadata)
    u = tier.select("url").first()["url"]
    t0 = dt.datetime(2024, 1, 2)
    a = series_points(tier, None, measure="byte_size", url=u, t0=t0)
    b = series_points(hot_recent, cold, measure="byte_size", url=u, t0=t0)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
