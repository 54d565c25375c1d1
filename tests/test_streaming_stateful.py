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
