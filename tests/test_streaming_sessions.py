"""Streaming session windows (streaming/stream.py::streaming_sessions):
append-mode emission of closed sessions must match the batch
sessionizer's boundaries exactly (gap-boundary alignment included)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.sessions import session_aggregates
from chainalytic_framework_spark.streaming.stream import streaming_sessions

GAP = 60  # seconds


def _ts(sec):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)


def _events():
    rows = []
    # user a: burst (2 sessions; second starts at EXACTLY gap+1)
    rows += [("a", _ts(0)), ("a", _ts(30)), ("a", _ts(60))]
    rows += [("a", _ts(60 + GAP + 1)), ("a", _ts(60 + GAP + 20))]
    # user b: boundary case — consecutive events exactly GAP apart
    # must stay ONE session in both engines
    rows += [("b", _ts(500)), ("b", _ts(500 + GAP)), ("b", _ts(500 + 2 * GAP))]
    # sentinel far in the future pushes the watermark past everything above
    rows += [("z", _ts(100000))]
    return rows


def test_streaming_sessions_match_batch_closed(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = _events()
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    # two files in event-time order so the watermark advances between batches
    early = [r for r in rows if r[1] < _ts(50000)]
    late = [r for r in rows if r[1] >= _ts(50000)]
    spark.createDataFrame(early, "user_id string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(late, "user_id string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")

    q = (
        streaming_sessions(stream, gap_seconds=GAP, watermark="10 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = session_aggregates(df, gap_seconds=GAP)
    want = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in batch.where(F.col("user_id") != "z").collect()
    }
    assert got == want
    # semantic spot checks: a has two sessions (3 + 2 events), b ONE
    # session of 3 despite exact-gap spacing
    a = sorted((s, n) for (u, s, n) in got if u == "a")
    assert [n for _, n in a] == [3, 2]
    b = [(s, n) for (u, s, n) in got if u == "b"]
    assert len(b) == 1 and b[0][1] == 3


def test_streaming_dedupe_drops_redeliveries(spark, tmp_path):
    """streaming_dedupe: duplicate (event_id) re-deliveries within the
    watermark are admitted exactly once; distinct ids all survive."""
    from chainalytic_framework_spark.streaming.stream import streaming_dedupe

    src = str(tmp_path / "src")
    rows1 = [(1, _ts(0)), (2, _ts(10)), (3, _ts(20))]
    rows2 = [(2, _ts(10)), (4, _ts(30)), (1, _ts(0))]  # 2 redeliveries
    spark.createDataFrame(rows1, "event_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(rows2, "event_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        streaming_dedupe(stream, ["event_id"], watermark="10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 2, 3, 4]
