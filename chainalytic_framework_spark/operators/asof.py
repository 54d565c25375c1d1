"""As-of join: match each left row with the latest right row at or
before its timestamp (per key) — the time-series join Spark lacks as a
built-in (SURVEY.md §2.3 gap note).

Two strategies:

- ``asof_join``: union-marker plan — tag both sides, union, and run a
  single ``last(ignorenulls)`` over a per-key ordered window. ONE
  shuffle on (key), no range-explosion, no pandas. This is the
  scale-correct default: the window is per-key ordered, so Spark sorts
  within partitions after hash-partitioning by key.
- ``asof_join_pandas``: cogrouped ``merge_asof`` per key bucket —
  for callers that need tolerance semantics pandas already implements.

Reference analogue: J1 state-lookup (each event joined to the most
recent prior state, ``stake_history.py:110-125``) — an as-of join
against a changelog instead of a mutable KV store.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """For every left row: latest right values with right.on <= left.on,
    per key. Left rows with no prior right row get NULLs."""
    rcols = right_value_cols or [c for c in right.columns if c not in (on, key)]
    l = left.withColumn("_side", F.lit(1))
    # Whole-row atomicity: carry ONE struct of all right value columns
    # through last(ignorenulls) so the latest right ROW wins as a unit.
    # Carrying each column independently would stitch values from
    # different right rows whenever a newer right row holds a NULL in
    # one column (and an older non-NULL would override a newer
    # legitimate NULL) — diverging from merge_asof/DuckDB ASOF semantics.
    r = right.select(
        key, on, F.struct(*rcols).alias("_rrow")
    ).withColumn("_side", F.lit(0))

    lcols = [c for c in left.columns if c not in (on, key)]
    merged = l.unionByName(r, allowMissingColumns=True)

    # order: time asc, right rows before left rows at the same instant
    # (a state row effective AT t is visible to an event AT t)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        key,
        on,
        "_side",
        *lcols,
        F.last("_rrow", ignorenulls=True).over(w).alias("_rrow"),
    )
    return carried.where(F.col("_side") == 1).select(
        key, on, *lcols, *[F.col(f"_rrow.{c}").alias(c) for c in rcols]
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    key: str,
    tolerance_seconds: int | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """merge_asof variant with optional tolerance, cogrouped by a hash
    bucket of the key (bounded group sizes at scale)."""
    import pyspark.sql.types as T

    rcols = [c for c in right.columns if c not in (on, key)]
    out_fields = left.schema.fields + [right.schema[c] for c in rcols]
    schema = T.StructType(out_fields)

    kb = F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(n_buckets)).cast("int")
    lb = left.withColumn("_b", kb)
    rb = right.withColumn("_b", kb)
    tol = pd.Timedelta(seconds=tolerance_seconds) if tolerance_seconds else None

    def join(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        lp = lp.drop(columns=["_b"]).sort_values(on, kind="mergesort")
        rp = rp.drop(columns=["_b"]).sort_values(on, kind="mergesort")
        if len(rp) == 0:
            for c in rcols:
                lp[c] = None
            return lp
        return pd.merge_asof(lp, rp[[key, on, *rcols]], on=on, by=key, tolerance=tol)

    return lb.groupBy("_b").cogroup(rb.groupBy("_b")).applyInPandas(join, schema=schema)
