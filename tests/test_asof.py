"""As-of join: union-marker plan vs pandas merge_asof ground truth."""

from __future__ import annotations

import pandas as pd

from chainalytic_framework_spark.operators.asof import asof_join, asof_join_pandas


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 5, "e0"), (2, 15, "e3"), (3, 7, "e4")],
        "key long, t long, ev string",
    ).selectExpr("key", "timestamp_seconds(t) as ts", "ev")
    right = spark.createDataFrame(
        [(1, 4, 100), (1, 10, 200), (1, 19, 300), (2, 30, 400)],
        "key long, t long, val long",
    ).selectExpr("key", "timestamp_seconds(t) as ts", "val")
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {
        (r["key"], r["ev"]): r["val"]
        for r in asof_join(left, right, on="ts", key="key").collect()
    }
    assert out[(1, "e0")] == 100      # t=5 → right t=4
    assert out[(1, "e1")] == 200      # t=10 → right t=10 (same instant visible)
    assert out[(1, "e2")] == 300      # t=20 → right t=19
    assert out[(2, "e3")] is None     # right t=30 is in the future
    assert out[(3, "e4")] is None     # no right rows for key


def test_asof_join_pandas_matches_plan(spark):
    left, right = _frames(spark)
    a = asof_join(left, right, on="ts", key="key").toPandas()
    b = asof_join_pandas(left, right, on="ts", key="key").toPandas()
    a = a.sort_values(["key", "ts"], ignore_index=True)[["key", "ts", "ev", "val"]]
    b = b.sort_values(["key", "ts"], ignore_index=True)[["key", "ts", "ev", "val"]]
    pd.testing.assert_frame_equal(a.astype({"val": "float64"}), b.astype({"val": "float64"}))


def test_asof_whole_row_atomicity(spark):
    """The latest right ROW must win as a unit: a newer right row with a
    NULL in one value column must NOT inherit that column from an older
    row (merge_asof / DuckDB ASOF whole-row semantics)."""
    left = spark.createDataFrame(
        [(1, 20, "e")], "key long, t long, ev string"
    ).selectExpr("key", "timestamp_seconds(t) as ts", "ev")
    right = spark.createDataFrame(
        [(1, 5, 100, 111), (1, 10, None, 222)],
        "key long, t long, a long, b long",
    ).selectExpr("key", "timestamp_seconds(t) as ts", "a", "b")
    row = asof_join(left, right, on="ts", key="key").collect()[0]
    assert row["b"] == 222
    assert row["a"] is None  # newer row's legitimate NULL wins; 100 must not leak


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        (r["key"], r["ev"]): r["val"]
        for r in asof_join_pandas(left, right, on="ts", key="key", tolerance_seconds=2).collect()
    }
    assert out[(1, "e0")] == 100      # gap 1s ≤ 2s
    assert out[(1, "e2")] == 300      # gap 1s
    assert out[(1, "e1")] == 200      # gap 0
