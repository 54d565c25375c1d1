"""TableStore semantics: snapshot ids, dynamic partition overwrite."""

from __future__ import annotations

from chainalytic_framework_spark.tables import TableStore


def test_snapshot_id_tracks_data(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    assert store.snapshot_id("t") == "empty"
    df = spark.range(10).selectExpr("id", "id % 3 as p")
    store.write(df, "t", partition_by=["p"])
    s1 = store.snapshot_id("t")
    assert s1 != "empty"
    assert store.snapshot_id("t") == s1  # stable
    store.write(spark.range(20).selectExpr("id", "id % 3 as p"), "t", partition_by=["p"])
    assert store.snapshot_id("t") != s1  # changes with data


def test_dynamic_overwrite_touches_only_written_partitions(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.range(10).selectExpr("id", "cast(id % 2 as string) as p")
    store.write(df, "t", partition_by=["p"])
    patch = spark.range(100, 103).selectExpr("id", "'0' as p")
    store.overwrite_partitions(patch, "t", ["p"])
    out = store.read("t")
    assert out.where("p = '0'").count() == 3      # replaced
    assert out.where("p = '1'").count() == 5      # untouched


def test_delete_where_partition(spark, tmp_path):
    store = TableStore(spark, str(tmp_path))
    df = spark.range(10).selectExpr("id", "cast(id % 2 as string) as p")
    store.write(df, "t", partition_by=["p"])
    removed = store.delete_where_partition("t", "p", ["0", "nonexistent"])
    assert removed == 1
    assert store.read("t").where("p = '0'").count() == 0
