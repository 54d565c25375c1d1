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


def test_merge_upsert_sequence_equals_last_wins(spark, tmp_path):
    """N sequential merge_upserts must leave exactly the last-written row
    per key, regardless of which buckets each delta touched."""
    import random

    from pyspark.sql import functions as F

    from chainalytic_framework_spark.tables import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    rng = random.Random(7)
    expected: dict[str, int] = {}
    for round_no in range(4):
        keys = rng.sample([f"u{i}" for i in range(40)], k=rng.randint(5, 15))
        rows = [(k, round_no * 1000 + i) for i, k in enumerate(keys)]
        for k, v in rows:
            expected[k] = v
        delta = spark.createDataFrame(rows, "url string, val long").select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            "val",
            F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("state_bucket"),
        )
        store.merge_upsert(delta, "seq_state", key="url", partition_col="state_bucket")

    got = {r["url"]: r["val"] for r in store.read("seq_state").collect()}
    assert got == expected


def test_merge_into_sql_shape():
    from chainalytic_framework_spark.tables import merge_into_sql

    sql = merge_into_sql(
        "rollup.ns.fold_state", "_src", "url",
        ["url", "url_hash", "last_ts", "content_rev"],
    )
    assert sql == (
        "MERGE INTO rollup.ns.fold_state t "
        "USING _src s ON t.url = s.url "
        "WHEN MATCHED THEN UPDATE SET t.url_hash = s.url_hash, "
        "t.last_ts = s.last_ts, t.content_rev = s.content_rev "
        "WHEN NOT MATCHED THEN INSERT (url, url_hash, last_ts, content_rev) "
        "VALUES (s.url, s.url_hash, s.last_ts, s.content_rev)"
    )
