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
