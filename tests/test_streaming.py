"""Structured Streaming ingestion: availableNow drain produces the same
1m tier as the batch rollup (streaming/batch parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.rollup import rollup_pages
from chainalytic_framework_spark.streaming.stream import start_stream_to_store
from chainalytic_framework_spark.synth import generate_pages
from chainalytic_framework_spark.tables import TableStore


def test_stream_drain_matches_batch(spark, tmp_path):
    pages = generate_pages(spark, 2000)
    src = str(tmp_path / "pages_src")
    pages.write.mode("overwrite").parquet(src)
    store = TableStore(spark, str(tmp_path / "wh"))

    q = start_stream_to_store(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(300)

    # append mode only emits CLOSED windows: buckets newer than
    # (max event time − watermark) legitimately stay pending at drain
    # end — compare the closed region only (T3 late-data policy).
    raw = spark.read.parquet(src)
    horizon = raw.agg(F.max("warc_ts")).first()[0] - __import__("datetime").timedelta(minutes=11)
    got = (
        store.read("tier_1m_stream").drop("bucket_day", "url_bucket")
        .where(F.col("bucket_start") < F.lit(horizon))
    )
    exp = rollup_pages(raw, "1m", grain="url").where(F.col("bucket_start") < F.lit(horizon))
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # restarting against the same checkpoint re-processes nothing
    n_before = store.read("tier_1m_stream").count()
    q2 = start_stream_to_store(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q2.awaitTermination(300)
    assert store.read("tier_1m_stream").count() == n_before


def test_stream_sketch_partials_match_exact(spark, tmp_path):
    """Streaming HLL partial log, merged at read, must estimate the
    exact per-bucket distinct-url counts within the sketch bound."""
    pages = generate_pages(spark, 2000)
    src = str(tmp_path / "pages_src")
    pages.write.mode("overwrite").parquet(src)
    store = TableStore(spark, str(tmp_path / "wh"))

    from chainalytic_framework_spark.streaming.stream import stream_sketch_estimate

    q = start_stream_to_store(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True, with_sketches=True,
    )
    q.awaitTermination(300)

    est = stream_sketch_estimate(store)
    raw = spark.read.parquet(src)
    horizon = raw.agg(F.max("warc_ts")).first()[0] - __import__("datetime").timedelta(minutes=11)
    exact = (
        raw.select(
            F.timestamp_seconds((F.col("warc_ts").cast("long") / 60).cast("long") * 60)
            .alias("bucket_start"),
            "lang",
            "url",
        )
        .groupBy("bucket_start", "lang")
        .agg(F.count_distinct("url").alias("exact"))
        .where(F.col("bucket_start") < F.lit(horizon))
    )
    j = est.join(exact, ["bucket_start", "lang"])
    bad = j.where(
        (F.abs(F.col("distinct_urls_est") - F.col("exact")) > 5)
        & (F.abs(F.col("distinct_urls_est") - F.col("exact")) / F.col("exact") > 0.05)
    )
    assert j.count() > 0
    assert bad.count() == 0


def test_compact_stream_into_batch_matches_batch_rollup(spark, tmp_path):
    """Drain a stream, compact into tier_1m: the compacted region must
    equal the batch rollup of the same input, and the stream table must
    be empty afterwards (handoff complete)."""
    from chainalytic_framework_spark.streaming.stream import compact_stream_into_batch

    pages = generate_pages(spark, 2000)
    src = str(tmp_path / "pages_src")
    pages.write.mode("overwrite").parquet(src)
    store = TableStore(spark, str(tmp_path / "wh"))
    q = start_stream_to_store(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(300)

    days = compact_stream_into_batch(store)
    assert days
    assert not store.exists("tier_1m_stream")  # partitions dropped

    raw = spark.read.parquet(src)
    horizon = raw.agg(F.max("warc_ts")).first()[0] - __import__("datetime").timedelta(minutes=11)
    got = (
        store.read("tier_1m").drop("bucket_day", "url_bucket", "tier", "gap_filled")
        .where(F.col("bucket_start") < F.lit(horizon))
    )
    exp = (
        rollup_pages(raw, "1m", grain="url").drop("tier", "gap_filled")
        .where(F.col("bucket_start") < F.lit(horizon))
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # idempotent: compacting again is a no-op
    assert compact_stream_into_batch(store) == []


def test_stream_histogram_partials_match_batch(spark, tmp_path):
    """Streaming histogram partial log, merged at read, must equal the
    batch histogram_rollup over the finalized region exactly — counts
    are mergeable integers, so parity is equality, not an estimate
    bound. This is the quantile-serving edge (VERDICT r2 #7)."""
    import datetime as dt

    from chainalytic_framework_spark.operators.histogram import (
        histogram_rollup,
        quantile_from_histogram,
    )
    from chainalytic_framework_spark.streaming.stream import (
        start_histogram_stream_to_store,
        stream_histogram_counts,
    )

    pages = generate_pages(spark, 2000)
    src = str(tmp_path / "pages_src")
    pages.write.mode("overwrite").parquet(src)
    store = TableStore(spark, str(tmp_path / "wh"))

    q = start_histogram_stream_to_store(
        spark, src, store, checkpoint_dir=str(tmp_path / "ckpt_hist"),
        trigger_available_now=True,
    )
    q.awaitTermination(300)

    raw = spark.read.parquet(src)
    horizon = (
        raw.agg(F.max("warc_ts")).first()[0] - dt.timedelta(minutes=11)
    ).timestamp()
    got = stream_histogram_counts(store).where(F.col("bucket_epoch") < F.lit(int(horizon)))
    be = (F.col("warc_ts").cast("long") / 60).cast("long") * 60
    exp = histogram_rollup(raw, be, ["lang"], F.length("text").cast("long")).where(
        F.col("bucket_epoch") < F.lit(int(horizon))
    ).select("bucket_epoch", "lang", "hb_lo", "hb_count")
    got = got.select("bucket_epoch", "lang", "hb_lo", "hb_count")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0

    # and the merged partials serve a quantile read directly
    p90 = quantile_from_histogram(
        stream_histogram_counts(store), ["lang"], 90, out_col="p90_lo"
    )
    assert p90.count() > 0
