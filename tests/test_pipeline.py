"""Pipeline resumability (T1 semantics): incremental runs equal one full
run; re-running committed work is a no-op; retention drops partitions
only when safely covered."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.retention import (
    DEFAULT_HORIZONS,
    enforce_retention,
    safe_horizon,
)
from chainalytic_framework_spark.plans.checkpoint import read_manifest
from chainalytic_framework_spark.plans.pipeline import run_pipeline
from chainalytic_framework_spark.synth import generate_pages
from chainalytic_framework_spark.tables import TableStore


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "wh"))


def test_incremental_equals_full(spark, tmp_path):
    pages = generate_pages(spark, 4000).cache()
    cut = dt.datetime(2024, 1, 4)

    full_store = TableStore(spark, str(tmp_path / "full"))
    run_pipeline(spark, pages, full_store, with_fold=False)

    inc_store = TableStore(spark, str(tmp_path / "inc"))
    run_pipeline(spark, pages.where(F.col("warc_ts") < F.lit(cut)), inc_store, with_fold=False)
    r2 = run_pipeline(spark, pages, inc_store, with_fold=False)
    assert r2["pending_days"] > 0

    for tier in ("1m", "1h", "1d", "30d"):
        a = full_store.read(f"tier_{tier}")
        b = inc_store.read(f"tier_{tier}")
        assert a.exceptAll(b).count() == 0, tier
        assert b.exceptAll(a).count() == 0, tier


def test_rerun_is_noop(spark, store):
    pages = generate_pages(spark, 2000).cache()
    r1 = run_pipeline(spark, pages, store, with_fold=False)
    assert r1["pending_days"] > 0
    r2 = run_pipeline(spark, pages, store, with_fold=False)
    assert r2["pending_days"] == 0
    m = read_manifest(store)
    days = store.read("tier_1m").select("bucket_day").distinct().count()
    assert m.where("tier = '1m'").count() == days  # one row per committed day


def test_manifest_metrics(spark, store):
    pages = generate_pages(spark, 2000).cache()
    run_pipeline(spark, pages, store, with_fold=False)
    m = read_manifest(store).toPandas()
    assert set(m["tier"]) == {"1m", "1h", "1d", "30d"}
    assert (m["wall_seconds"] > 0).all()
    assert (m[m["tier"] == "1m"]["docs_per_sec"] > 0).all()


def test_fold_state_incremental(spark, store):
    pages = generate_pages(spark, 3000).cache()
    cut = dt.datetime(2024, 1, 4)
    run_pipeline(spark, pages.where(F.col("warc_ts") < F.lit(cut)), store, with_fold=True)
    run_pipeline(spark, pages, store, with_fold=True)
    state_inc = store.read("fold_state")

    from chainalytic_framework_spark.operators.fold import extract_state, fold_observations, prepare_observations

    expect = extract_state(fold_observations(prepare_observations(pages)))
    assert state_inc.exceptAll(expect).count() == 0
    assert expect.exceptAll(state_inc).count() == 0


def test_retention_drops_only_covered(spark, store):
    pages = generate_pages(spark, 2000).cache()
    run_pipeline(spark, pages, store, with_fold=False)
    now = dt.datetime(2024, 3, 1)
    # 1m horizon is 7 days → all Jan buckets expired; 1h tier committed
    # through Jan 8 so cover allows the drop
    parent_max = store.read("tier_1h").agg(F.max("bucket_start")).first()[0]
    dropped = enforce_retention(store, "tier_1m", "1m", now, parent_committed_max=parent_max)
    assert dropped > 0
    # but if parent had no coverage, nothing can be dropped
    h = safe_horizon(now - dt.timedelta(seconds=DEFAULT_HORIZONS["1m"]), dt.datetime(2023, 12, 1), "1h")
    assert h == dt.datetime(2023, 12, 1)


def test_safe_horizon_epoch_space():
    """Horizon math is done in UTC epoch space: tz-aware, naive-UTC and
    raw-epoch inputs all agree regardless of the driver's local zone."""
    naive = dt.datetime(2024, 2, 1, 12, 30)
    aware = naive.replace(tzinfo=dt.timezone.utc)
    import calendar

    epoch = calendar.timegm(naive.timetuple())
    req = dt.datetime(2024, 3, 1)
    for pmax in (naive, aware, epoch):
        h = safe_horizon(req, pmax, "1h")
        assert h == dt.datetime(2024, 2, 1, 12, 0)  # floored to the 1h cover


def test_pipeline_cold_and_retention_stages(spark, store):
    import datetime as dt2

    pages = generate_pages(spark, 2000).cache()
    r = run_pipeline(
        spark, pages, store, with_fold=False, with_cold_tier=True,
        enforce_retention_now=dt2.datetime(2024, 3, 1),
    )
    assert r["pending_days"] > 0
    cold = store.read("cold_1d")
    assert cold.count() > 0
    assert {"blob", "n_points", "t0", "t1"} <= set(cold.columns)
    # 1m horizon (7d) passed for Jan data and 1h cover exists → dropped
    assert not store.exists("tier_1m") or \
        store.read("tier_1m").count() < store.read("tier_1h").count() * 100
    m = read_manifest(store)
    assert m.where("tier = 'cold_1d'").count() == 1
