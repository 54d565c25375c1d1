"""SparkSession factory tuned for the rollup engine.

Defaults are chosen for the 100 TB design point and scaled down by env
vars for the local[32] sandbox:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing),
- Arrow on (every pandas UDF crosses the JVM/Python boundary in batches),
- UTC session timezone (tier buckets are epoch-aligned; oracle parity),
- shuffle partitions sized by env (32 locally; thousands on a cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(
    app_name: str = "chainalytic-framework-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    On a real cluster the same settings apply unchanged; only
    ``master`` and ``shuffle_partitions`` change (set shuffle
    partitions to ~2-3x total executor cores, or rely on AQE
    coalescing from a high initial value).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{DEFAULT_CPUS}]")
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        # AQE: runtime partition coalescing + skew-join handling. At 100 TB
        # this is the first line of defense against hot-domain skew; the
        # second is explicit salting in operators/rollup.py.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas UDF traffic; modest batch size keeps peak
        # Python-worker memory bounded when html blobs ride along.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 128 MB input splits — at 100 TB this yields ~800k scan tasks,
        # the right granularity for 1000 executors.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Deterministic timestamp semantics for parquet across engines.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors' Python workers — the
    programmatic equivalent of ``spark-submit --py-files pkg.zip``.
    Without it, any pandas-UDF stage fails with ModuleNotFoundError
    whenever the driver's cwd is not the repo root (cluster reality)."""
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        zip_base = os.path.join(tempfile.gettempdir(), "chainalytic_framework_spark_pkg")
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir),
        )
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # already added in this context, or read-only tmp: non-fatal


def get_active_or_build(**kwargs) -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return build_session(**kwargs)
