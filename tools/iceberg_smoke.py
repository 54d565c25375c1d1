"""Real-catalog Iceberg smoke test — the cluster counterpart of the
recorder-fake unit tests (``tests/test_tables.py::test_iceberg_*``).

The sandbox ships no Iceberg jars, so ``IcebergBackend``'s statements
are unit-tested against fakes; a cluster operator runs THIS script once
per deployment to execute every statement the engine issues against a
live catalog. Run:

    spark-submit \\
      --py-files <(cd /path/to/repo && zip -r - chainalytic_framework_spark) \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
      --conf spark.sql.catalog.rollup=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.rollup.type=hadoop \\
      --conf spark.sql.catalog.rollup.warehouse=hdfs:///tmp/iceberg_smoke_wh \\
      --conf spark.sql.catalog.rollup.namespace=smoke \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      tools/iceberg_smoke.py

(Swap ``type=hadoop``+``warehouse`` for your REST/Glue/Hive catalog
conf; any catalog named ``rollup`` works — the engine keys off
``spark.sql.catalog.rollup``.)

Steps, in pipeline order — each maps to an engine call site and a
recorder-fake test:

  1  CREATE NAMESPACE                      (bootstrap)
  2  run_pipeline over synthetic pages     write/append/overwritePartitions
                                           → test_iceberg_store_read_write_append_resolve_to_catalog,
                                             test_iceberg_overwrite_partitions_branches
  3  snapshot_id + read_as_of time travel  → test_iceberg_delete_and_snapshot_and_stats
  4  MERGE INTO single-key upsert          → test_iceberg_merge_upsert_single_row_issues_merge_into
  5  dynamic partition-overwrite restate   → test_iceberg_merge_upsert_multirow_overwrites_partitions_no_staging
  6  retention DELETE by partition         → test_iceberg_delete_and_snapshot_and_stats
  7  rewrite_data_files compaction         → test_rewrite_data_files_sql (pure SQL shape)

``python tools/iceberg_smoke.py --dry-run`` needs no Spark session or
jars: it prints the step plan and the exact SQL the pure builders
produce, so the script stays parse-checked in the sandbox.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from chainalytic_framework_spark.tables import (  # noqa: E402
    delete_where_sql,
    merge_into_sql,
    rewrite_data_files_sql,
)

STEPS = [
    "create namespace",
    "pipeline day build (write/append/overwritePartitions)",
    "snapshot lineage + time-travel read",
    "MERGE INTO upsert",
    "partition restatement (dynamic overwrite)",
    "retention DELETE",
    "rewrite_data_files compaction",
]


def dry_run() -> None:
    print("iceberg_smoke plan (no session — statement shapes only):")
    for i, s in enumerate(STEPS, 1):
        print(f"  {i}. {s}")
    print("\nexact statements the engine issues (pure builders):")
    print(" ", merge_into_sql("rollup.smoke.fold_state", "_merge_src_fold_state",
                              "url", ["url", "url_hash", "content_rev"]))
    print(" ", delete_where_sql("rollup.smoke.tier_1m", "bucket_day",
                                ["2024-01-01", "2024-01-02"]))
    print(" ", rewrite_data_files_sql("rollup", "smoke", "tier_1m",
                                      128 * 1024 * 1024))


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from chainalytic_framework_spark.plans.pipeline import run_pipeline
    from chainalytic_framework_spark.synth import generate_pages
    from chainalytic_framework_spark.tables import TableStore, iceberg_available

    spark = SparkSession.builder.appName("iceberg_smoke").getOrCreate()
    if not iceberg_available(spark):
        raise SystemExit(
            "spark.sql.catalog.rollup is not configured — launch via "
            "spark-submit with the iceberg-spark-runtime package and the "
            "catalog confs shown in this script's docstring"
        )
    store = TableStore(spark, root="/unused-on-iceberg")
    b = store.iceberg
    assert b is not None

    # 1. namespace bootstrap (idempotent)
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {b.catalog}.{b.namespace}")
    print(f"[1/7] namespace {b.catalog}.{b.namespace} ready")

    # 2. one pipeline build over synthetic pages — every tier write goes
    # through the catalog (writerV2 createOrReplace / overwritePartitions)
    pages = generate_pages(spark, 50_000)
    stats = run_pipeline(spark, pages, store, with_fold=True,
                         with_histograms=True)
    n_1m = store.read("tier_1m").count()
    assert stats["docs"] > 0 and n_1m > 0
    print(f"[2/7] pipeline: {stats['docs']} docs → {n_1m} tier_1m rows")

    # 3. snapshot lineage + time travel: the id recorded by checkpoint
    # manifests must re-read the exact input
    snap = store.snapshot_id("tier_1m")
    assert snap not in ("", "empty")
    assert store.read_as_of("tier_1m", snap).count() == n_1m
    print(f"[3/7] snapshot {snap} time-travel read matches ({n_1m} rows)")

    # 4. MERGE INTO (single row per key — the fold-state upsert path;
    # fold_state is keyed by url, one row each, exactly what Iceberg
    # MERGE requires)
    delta = (
        store.read("fold_state").limit(10)
        .withColumn("content_rev", F.lit(999_999))
    )
    store.merge_upsert(delta, "fold_state", key="url",
                       partition_col="state_bucket",
                       single_row_per_key=True)
    n_hit = store.read("fold_state").where(
        F.col("content_rev") == 999_999).count()
    assert n_hit >= 1
    print(f"[4/7] MERGE INTO upserted {n_hit} fold-state rows")

    # 5. restatement: dynamic overwrite of one day must leave other days'
    # snapshots untouched
    days = [r["bucket_day"] for r in
            store.read("tier_1m").select("bucket_day").distinct().collect()]
    one_day = store.read("tier_1m").where(F.col("bucket_day") == days[0])
    before_others = store.read("tier_1m").where(
        F.col("bucket_day") != days[0]).count()
    store.overwrite_partitions(one_day, "tier_1m", ["bucket_day"])
    after_others = store.read("tier_1m").where(
        F.col("bucket_day") != days[0]).count()
    assert before_others == after_others
    print(f"[5/7] dynamic overwrite of {days[0]} left "
          f"{after_others} other-day rows untouched")

    # 6. retention DELETE by partition value
    victim = str(days[-1])
    store.delete_where_partition("tier_1m", "bucket_day", [victim])
    assert store.read("tier_1m").where(
        F.col("bucket_day") == F.lit(victim).cast("date")).count() == 0
    print(f"[6/7] retention DELETE dropped day {victim}")

    # 7. binpack compaction via the system procedure
    store.compact_partitions("tier_1m", ["bucket_day"])
    print("[7/7] rewrite_data_files compaction submitted")

    print("ICEBERG SMOKE: ALL OK")
    return 0


if __name__ == "__main__":
    if "--dry-run" in sys.argv:
        dry_run()
    else:
        raise SystemExit(main())
