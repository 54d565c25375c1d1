"""Per-partition checkpoint/lineage manifest (FIXTURES.md §3).

One row per committed work unit ``(tier, bucket_day)`` carrying lineage
(input snapshot fingerprint) and emitted metrics (rows, wall seconds,
docs/sec). Resume = anti-join of the input's bucket_days against the
manifest — re-running a committed unit is a no-op; re-running a
half-written unit is safe because tier writes are dynamic-partition
overwrites (idempotent).

Reference analogue: the ``last_block_height`` cursor + rewind gate
(``/root/reference/src/chainalytic/warehouse/storage.py:29``,
``zones/.../transform_registry/stake_history.py:46-56``) — made
idempotent instead of rewinding, and extended from a scalar cursor to
per-partition lineage rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import TableStore

MANIFEST_TABLE = "checkpoints"

MANIFEST_SCHEMA = (
    "tier string, bucket_range_start timestamp, bucket_range_end timestamp, "
    "partition_id int, input_snapshot_id string, rows_in bigint, rows_out bigint, "
    "wall_seconds double, docs_per_sec double, committed_at timestamp"
)


def read_manifest(store: TableStore) -> DataFrame | None:
    if not store.exists(MANIFEST_TABLE):
        return None
    return store.read(MANIFEST_TABLE)


def committed_days(store: TableStore, tier: str, snapshot_id: str | None = None) -> DataFrame | None:
    """Distinct committed bucket days for a tier (optionally only those
    committed against the given input snapshot)."""
    m = read_manifest(store)
    if m is None:
        return None
    m = m.where(F.col("tier") == tier)
    if snapshot_id is not None:
        m = m.where(F.col("input_snapshot_id") == snapshot_id)
    return m.select(F.to_date("bucket_range_start").alias("day")).distinct()


def append_entries(
    spark: SparkSession,
    store: TableStore,
    entries: list[dict],
) -> None:
    """Atomically append manifest rows (one parquet commit)."""
    if not entries:
        return

    def _utc(x: dt.datetime) -> dt.datetime:
        # tz-aware UTC: a NAIVE datetime is serialized through the
        # driver's LOCAL timezone (TimestampType.toInternal/mktime), so
        # on a non-UTC driver naive manifest rows shift — committed_days
        # then renders a different UTC day and resume re-runs committed
        # work forever. Aware datetimes serialize via .timestamp(): exact.
        return x.replace(tzinfo=dt.timezone.utc) if x.tzinfo is None else x

    now = dt.datetime.now(dt.timezone.utc)
    rows = [
        (
            e["tier"],
            _utc(e["bucket_range_start"]),
            _utc(e["bucket_range_end"]),
            int(e.get("partition_id", -1)),
            e.get("input_snapshot_id", ""),
            int(e.get("rows_in", 0)),
            int(e.get("rows_out", 0)),
            float(e.get("wall_seconds", 0.0)),
            float(e.get("docs_per_sec", 0.0)),
            now,
        )
        for e in entries
    ]
    df = spark.createDataFrame(rows, schema=MANIFEST_SCHEMA)
    store.append(df, MANIFEST_TABLE)


def high_water(store: TableStore, tier: str) -> dt.datetime | None:
    m = read_manifest(store)
    if m is None:
        return None
    r = m.where(F.col("tier") == tier).agg(F.max("bucket_range_end")).first()
    return r[0]
