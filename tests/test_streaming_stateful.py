"""applyInPandasWithState streaming fold: drained stream must equal the
batch fold exactly when micro-batches arrive in event-time order
(day-sequential files), state carrying across batches."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.fold import fold_observations, prepare_observations
from chainalytic_framework_spark.streaming.stateful import streaming_fold
from chainalytic_framework_spark.synth import generate_pages


def test_streaming_fold_matches_batch(spark, tmp_path):
    pages = generate_pages(spark, 1500).cache()
    src = str(tmp_path / "pages_src")
    # one file per day, written in day order (mtime order == event order)
    days = sorted(r["d"] for r in pages.select(F.to_date("warc_ts").alias("d")).distinct().collect())
    for d in days:
        pages.where(F.to_date("warc_ts") == F.lit(d)).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")

    def sink(batch_df, batch_id):  # parquet sink rejects update mode
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_fold(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination(300)

    cols = ["url", "warc_ts", "is_new", "text_changed", "content_rev",
            "gap_seconds", "expired", "cum_points"]
    got = spark.read.parquet(out_dir).select(*cols)
    batch = fold_observations(
        prepare_observations(spark.read.parquet(src), n_buckets=16)
    ).select(*cols)

    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_streaming_fold_emits_ttl_expiry_events(spark, tmp_path):
    """A url that goes silent while event time (watermark) advances past
    its TTL must produce one explicit expiry EVENT row (W5 timer), and
    its state must be dropped."""
    import datetime as dt

    from chainalytic_framework_spark.streaming.stateful import (
        TTL_SECONDS,
        streaming_fold_with_expiry,
    )

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def mk(rows):
        return spark.createDataFrame(
            [(u, t, bytearray(b"<html>x</html>"), txt, "en") for u, t, txt in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    # file 1: A and B crawl; then A goes silent while B keeps crawling
    # far past A's TTL (3 days); trailing files advance the watermark.
    files = [
        [("A", t0, "a0"), ("B", t0, "b0")],
        [("B", t0 + dt.timedelta(days=2), "b1")],
        [("B", t0 + dt.timedelta(days=6), "b2")],
        [("B", t0 + dt.timedelta(days=9), "b3")],
        [("B", t0 + dt.timedelta(days=12), "b4")],
    ]
    for rows in files:
        mk(rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_fold_with_expiry(stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    exp = out.where("expiry_event").collect()
    assert len(exp) == 1 and exp[0]["url"] == "A"
    assert exp[0]["expired"] is True and exp[0]["cum_points"] == 1
    # the timer fired AT last_ts + TTL in event time
    assert exp[0]["warc_ts"] == t0 + dt.timedelta(seconds=TTL_SECONDS)
    # observation rows unaffected
    assert out.where("NOT expiry_event").count() == 6


def test_streaming_cusum_matches_scalar_replay(spark, tmp_path):
    """Drained streaming CUSUM must equal a scalar Page recursion over
    each key's ordered values — statistic, alarms, and post-alarm
    restarts — across micro-batch boundaries (2 files => >=2 batches)."""
    import datetime as dt

    from chainalytic_framework_spark.streaming.stateful import streaming_cusum

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    vals = {"a": [], "b": []}
    rng = __import__("random").Random(9)
    for i in range(400):
        for k in ("a", "b"):
            v = rng.gauss(10.0, 1.0) + (3.0 if (k == "a" and i >= 200) else 0.0)
            rows.append((k, t0 + dt.timedelta(minutes=i), v))
            vals[k].append(v)
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    src = str(tmp_path / "src")
    df.where(F.col("ts") < t0 + dt.timedelta(minutes=200)).coalesce(1).write.parquet(src + "/p1")
    import time as _time

    _time.sleep(1.1)  # distinct mtimes: the file source orders by them
    df.where(F.col("ts") >= t0 + dt.timedelta(minutes=200)).coalesce(1).write.parquet(src + "/p2")

    stream = (
        spark.readStream.schema("k string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out_dir = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        streaming_cusum(stream, "k", "ts", "value", k_ref=10.5, threshold=12.0)
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["series_key"], r["ts"]): (r["cusum"], r["alarm"])
        for r in spark.read.parquet(out_dir).collect()
    }
    import pytest as _p

    n_alarms = 0
    for k in ("a", "b"):
        s = 0.0
        for i, v in enumerate(vals[k]):
            s = max(0.0, s + (v - 10.5))
            alarm = s >= 12.0
            ts = t0 + dt.timedelta(minutes=i)
            g_c, g_a = got[(k, ts)]
            assert g_c == _p.approx(s, abs=1e-9), (k, i)
            assert g_a == alarm, (k, i)
            if alarm:
                s = 0.0
                n_alarms += 1
    assert n_alarms > 0  # the drifted key must actually fire
