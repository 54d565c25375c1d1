"""Synthetic pages generator invariants (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.synth import generate_pages


def test_deterministic_across_partitioning(spark):
    a = generate_pages(spark, 2000, n_partitions=2).orderBy("url", "warc_ts").toPandas()
    b = generate_pages(spark, 2000, n_partitions=7).orderBy("url", "warc_ts").toPandas()
    assert a.equals(b)


def test_primary_key_unique(pages):
    n = pages.count()
    assert pages.select("url", "warc_ts").distinct().count() == n


def test_hot_domain_skew(pages):
    top = (
        pages.withColumn("d", F.substring_index(F.substring_index("url", "/", 3), "/", -1))
        .groupBy("d")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top["count"] >= 0.15 * pages.count()


def test_text_pure_function_of_url_and_rev(pages):
    # text must be byte-identical for the same url+rev — group by (url, text)
    # and ensure no url has two texts within one revision key embedded in text
    dup = (
        pages.groupBy("url", "text").count().groupBy("url").count().where("count > 5")
    )
    # urls may have up to 5 revisions (rev in 0..4 per day-window); never more texts
    assert dup.count() == 0


def test_singleton_urls_exist(pages):
    singles = pages.groupBy("url").count().where("count = 1").count()
    assert singles > 0


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    kinds = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert kinds["html"] == "binary"
    assert kinds["warc_ts"].startswith("timestamp")
