"""Period-over-period contribution analysis
(operators/contribution.py)."""

from __future__ import annotations

import pytest

from chainalytic_framework_spark.operators.contribution import contribution


def _df(spark, rows):
    return spark.createDataFrame(rows, "key string, t long, v long")


def test_hand_case_shares_and_deltas(spark):
    rows = [
        ("a", 10, 100),  # A
        ("a", 20, 300),  # B: delta +200
        ("b", 11, 500),  # A only: delta -500
        ("c", 25, 400),  # B only: delta +400
    ]
    out = {
        r["key"]: r
        for r in contribution(
            _df(spark, rows), ["key"], "t", "v", 0, 15, 15, 30
        ).collect()
    }
    assert out["a"]["v_a"] == 100 and out["a"]["v_b"] == 300
    assert out["a"]["delta"] == 200
    assert out["b"]["delta"] == -500 and out["b"]["v_b"] == 0
    assert out["c"]["delta"] == 400 and out["c"]["v_a"] == 0
    total = 200 - 500 + 400  # +100
    assert all(r["total_delta"] == total for r in out.values())
    # shares: signed intdiv of |delta|*1e4 by |total|
    assert out["a"]["share_x1e4"] == 200 * 10000 // 100
    assert out["b"]["share_x1e4"] == -(500 * 10000 // 100)
    assert out["c"]["share_x1e4"] == 400 * 10000 // 100


def test_shares_sum_to_1e4_up_to_truncation(spark):
    rows = [("k%d" % i, 5 + (i % 2) * 10, (i * 37) % 100 + 1) for i in range(60)]
    out = contribution(_df(spark, rows), ["key"], "t", "v", 0, 10, 10, 20).collect()
    total = out[0]["total_delta"]
    assert total != 0
    s = sum(r["share_x1e4"] for r in out)
    # per-key truncation loses < 1 unit per key
    assert abs(s - 10000) <= len(out)


def test_zero_total_delta_yields_null_shares(spark):
    rows = [("a", 1, 100), ("a", 11, 200), ("b", 2, 200), ("b", 12, 100)]
    out = contribution(_df(spark, rows), ["key"], "t", "v", 0, 10, 10, 20).collect()
    assert all(r["total_delta"] == 0 for r in out)
    assert all(r["share_x1e4"] is None for r in out)
    assert {r["delta"] for r in out} == {100, -100}


def test_rows_outside_both_ranges_are_ignored(spark):
    rows = [("a", 1, 100), ("a", 50, 999999), ("a", 11, 150)]
    out = contribution(_df(spark, rows), ["key"], "t", "v", 0, 10, 10, 20).collect()
    assert len(out) == 1
    assert out[0]["v_a"] == 100 and out[0]["v_b"] == 150


def test_range_validation(spark):
    with pytest.raises(ValueError):
        contribution(_df(spark, [("a", 1, 1)]), ["key"], "t", "v", 10, 10, 0, 5)


def test_parallelism_invariance(spark):
    rows = [
        ("k%d" % (i % 9), (i * 7) % 20, (i * 13) % 500 - 250)
        for i in range(500)
    ]
    df = _df(spark, rows)
    a = sorted(map(tuple, contribution(
        df.repartition(1), ["key"], "t", "v", 0, 10, 10, 20).collect()))
    b = sorted(map(tuple, contribution(
        df.repartition(16), ["key"], "t", "v", 0, 10, 10, 20).collect()))
    assert a == b and len(a) > 0
