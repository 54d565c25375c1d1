"""Counter semantics: reset-corrected deltas, windowed increase,
time-weighted average — integer-exact, tie-safe."""

from __future__ import annotations

from chainalytic_framework_spark.operators.counters import (
    counter_delta,
    counter_increase,
    time_weighted_avg_x1e4,
)


def test_counter_delta_resets(spark):
    rows = [(1, 10, 5), (1, 20, 9), (1, 30, 2), (1, 40, 7)]  # 9→2 reset
    df = spark.createDataFrame(rows, "k long, t long, v long")
    got = {r["t"]: (r["delta"], r["reset"]) for r in counter_delta(df, ["k"], "t", "v").collect()}
    assert got[10] == (None, False)
    assert got[20] == (4, False)
    assert got[30] == (2, True)  # post-reset value IS the increase
    assert got[40] == (5, False)


def test_counter_increase_buckets(spark):
    rows = [(1, 0, 1), (1, 50, 4), (1, 100, 2), (1, 150, 6)]  # reset at t=100
    df = spark.createDataFrame(rows, "k long, t long, v long")
    got = {r["bucket_epoch"]: (r["increase"], r["resets"])
           for r in counter_increase(df, ["k"], "t", "v", 100).collect()}
    assert got[0] == (3, 0)       # first delta NULL, then +3
    assert got[100] == (6, 1)     # reset to 2 (+2), then +4


def test_twa_locf_weighting(spark):
    # v=10 for 30s, v=20 for 70s → twa = (10*30 + 20*70)/100 = 17
    rows = [(1, 0, 10), (1, 30, 20), (1, 100, 99)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    r = time_weighted_avg_x1e4(df, ["k"], "t", "v").first()
    assert (r["twa_num"], r["twa_den"], r["twa_x1e4"]) == (1700, 100, 170000)


def test_twa_single_point_null(spark):
    df = spark.createDataFrame([(1, 0, 10)], "k long, t long, v long")
    r = time_weighted_avg_x1e4(df, ["k"], "t", "v").first()
    assert r["twa_den"] == 0 and r["twa_x1e4"] is None


def test_tie_safety_composite_order(spark):
    # two rows at t=5: composite (t, v) tiebreak makes the spanning value
    # deterministic — v=9 spans [5, 9)
    rows = [(1, 0, 3), (1, 5, 9), (1, 5, 1), (1, 9, 4)]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    a = time_weighted_avg_x1e4(df, ["k"], ["t", "v"], "v").first()
    b = time_weighted_avg_x1e4(df.repartition(7), ["k"], ["t", "v"], "v").first()
    assert (a["twa_num"], a["twa_den"]) == (b["twa_num"], b["twa_den"])
    # 3*5 + 1*0 + 9*4 + (last null) = 15 + 36 = 51 over 9s
    assert a["twa_num"] == 51 and a["twa_den"] == 9
