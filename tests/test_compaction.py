"""Small-file compaction: fewer files, identical data, untouched
partitions byte-stable, oversized partitions split to target size."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from chainalytic_framework_spark.tables import TableStore, rewrite_data_files_sql


def _files(store, name, part):
    base = os.path.join(store.path(name), part)
    if not os.path.isdir(base):
        return []
    return sorted(
        (f, os.path.getsize(os.path.join(base, f)))
        for f in os.listdir(base)
        if f.endswith(".parquet")
    )


def _mk(spark, tmp_path, n_files=12):
    store = TableStore(spark, str(tmp_path / "wh"))
    df = spark.range(4000).select(
        F.col("id"),
        (F.pmod("id", 3)).cast("string").alias("day"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    # many small files per partition: pre-shuffle round-robin
    store.write(df.repartition(n_files), "t", partition_by=["day"])
    return store, df


def test_compact_reduces_files_preserves_data(spark, tmp_path):
    store, df = _mk(spark, tmp_path)
    before = store.partition_file_stats("t")
    assert all(n > 4 for n, _ in before.values())
    rows_before = sorted(tuple(r) for r in store.read("t").collect())

    n = store.compact_partitions("t", ["day"], max_files_per_partition=4)
    assert n == 3
    after = store.partition_file_stats("t")
    assert set(after) == set(before)
    assert all(n == 1 for n, _ in after.values())  # all small → 1 file each
    assert sorted(tuple(r) for r in store.read("t").collect()) == rows_before
    # staging dir cleaned up
    assert not os.path.isdir(store.path("t__compact_staged"))


def test_compact_skips_ok_partitions(spark, tmp_path):
    store, _ = _mk(spark, tmp_path)
    # compact day=0 only by making others already-compact
    store.compact_partitions("t", ["day"], max_files_per_partition=4)
    snap = {p: _files(store, "t", p) for p in ("day=0", "day=1", "day=2")}
    # second run: nothing over threshold → zero rewrites, files untouched
    assert store.compact_partitions("t", ["day"], max_files_per_partition=4) == 0
    assert {p: _files(store, "t", p) for p in snap} == snap


def test_oversized_partition_splits_to_target(spark, tmp_path):
    store, df = _mk(spark, tmp_path)
    _, b0 = store.partition_file_stats("t")["day=0"]
    # target smaller than the partition → ceil(b/target) files
    target = max(1, b0 // 3)
    rows_before = sorted(tuple(r) for r in store.read("t").collect())
    store.compact_partitions("t", ["day"], max_files_per_partition=4,
                             target_bytes=target)
    n0, _ = store.partition_file_stats("t")["day=0"]
    assert 2 <= n0 <= 6  # split, but bounded near ceil(b/target)
    assert sorted(tuple(r) for r in store.read("t").collect()) == rows_before


def test_rewrite_data_files_sql():
    s = rewrite_data_files_sql("rollup", "ns", "tier_1m", 134217728)
    assert s == (
        "CALL rollup.system.rewrite_data_files(table => 'ns.tier_1m', "
        "strategy => 'binpack', "
        "options => map('target-file-size-bytes', '134217728'))"
    )
