"""Runtime bloom-filter injection evidence: the targeted-backfill
semi-join shape (small touched-keys set joining a big history scan)
must get a row-level runtime filter pushed into the probe scan —
the mechanism that makes backfill O(matching) instead of O(history)
at cluster scale. Session conf enables it (session.py); sandbox-size
thresholds are lowered here to make the optimizer fire on test data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def runtime_filter_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join path
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_backfill_semijoin_gets_runtime_filter(spark, tmp_path, runtime_filter_conf):
    big = str(tmp_path / "history")
    small = str(tmp_path / "touched")
    spark.range(200_000).select(
        (F.col("id") % 5000).alias("url_hash"), (F.col("id") * 7).alias("v")
    ).write.parquet(big)
    spark.range(200).select(
        (F.col("id") * 25).alias("url_hash"), (F.col("id") % 10).alias("day")
    ).write.parquet(small)

    # the targeted-backfill shape: history scan feeding a per-key
    # aggregation (the re-fold), semi-joined against the touched-keys
    # set which carries a selective predicate (the backfilled day).
    # Spark's InjectRuntimeFilter fires when (a) the creation side has
    # a selective filter over a scan and (b) the application side
    # contains a shuffle to amortize against — both true here and in
    # plans/pipeline.py's backfill path.
    probe = spark.read.parquet(big).groupBy("url_hash").agg(F.sum("v").alias("v"))
    build = spark.read.parquet(small).where(F.col("day") == 3)
    joined = probe.join(build.select("url_hash"), "url_hash", "left_semi")

    opt = joined._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "might_contain" in opt and "bloom_filter_agg" in opt, opt[:2000]
    # the might_contain filter must sit on the SCAN side, below the agg
    assert opt.index("might_contain") < opt.index("relation [url_hash")
    # and the filtered result is still exact: day==3 keeps 20 keys
    assert joined.count() == 20
