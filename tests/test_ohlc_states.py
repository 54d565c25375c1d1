"""OHLC candle partials/merge (operators/ohlc.py), state durations
(operators/states.py), MAD anomalies (operators/rolling.py::mad_anomaly)
and quality-aware survivors (operators/components.py::dedup_survivors_by)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.components import dedup_survivors_by
from chainalytic_framework_spark.operators.ohlc import ohlc_merge, ohlc_partials
from chainalytic_framework_spark.operators.rolling import mad_anomaly
from chainalytic_framework_spark.operators.states import (
    state_intervals,
    state_totals,
)


def _ev(spark, rows):
    # (key, bucket, ts_epoch, tie, value)
    return spark.createDataFrame(
        rows, "k string, b long, ts long, tie long, v long"
    )


def test_ohlc_partials_basic_and_tie_determinism(spark):
    df = _ev(
        spark,
        [
            ("a", 0, 10, 2, 500),   # same ts as tie=1 row: open must be tie=1
            ("a", 0, 10, 1, 300),
            ("a", 0, 20, 3, 100),
            ("a", 0, 30, 4, 400),
        ],
    )
    out = ohlc_partials(df, ["k", "b"], "ts", "tie", "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["open_val"], r["high_val"], r["low_val"], r["close_val"]) == (
        300, 500, 100, 400,
    )
    assert (r["open_ts"], r["open_tie"]) == (10, 1)
    assert (r["close_ts"], r["close_tie"]) == (30, 4)
    assert r["point_count"] == 4


def test_ohlc_merge_equals_direct(spark):
    # two fine buckets per coarse bucket; merged candle must equal the
    # candle computed directly at the coarse grain (cascade exactness)
    rows = [
        ("a", i // 2, 100 * i + (7 * i) % 3, i, (i * 37) % 11 - 5)
        for i in range(12)
    ]
    df = _ev(spark, rows)
    fine = ohlc_partials(df, ["k", "b"], "ts", "tie", "v")
    merged = ohlc_merge(
        fine.withColumn("b", (F.col("b") / 3).cast("long")), ["k", "b"]
    )
    direct = ohlc_partials(
        df.withColumn("b", (F.col("b") / 3).cast("long")),
        ["k", "b"], "ts", "tie", "v",
    )
    assert merged.exceptAll(direct).isEmpty()
    assert direct.exceptAll(merged).isEmpty()


def test_state_intervals_and_totals(spark):
    ev = spark.createDataFrame(
        [
            (1, "view", 100, 1),
            (1, "click", 160, 2),   # view lasted 60s
            (1, "view", 400, 3),    # click lasted 240s; final view open-ended
            (2, "view", 0, 4),      # single event: no interval at all
        ],
        "user_id long, event_type string, ts long, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = state_intervals(ev, "user_id", "event_type", "ts", "event_id")
    got = {(r["user_id"], r["state"]): r["duration_secs"] for r in iv.collect()}
    assert got == {(1, "view"): 60, (1, "click"): 240}
    tot = {r["state"]: (r["n_intervals"], r["total_secs"])
           for r in state_totals(iv).collect()}
    assert tot == {"view": (1, 60), "click": (1, 240)}


def test_state_intervals_tie_ordering(spark):
    # two events with identical ts: event_id orders them, so durations
    # are deterministic (0s for the first, 50s for the second)
    ev = spark.createDataFrame(
        [(1, "a", 100, 2), (1, "b", 100, 1), (1, "c", 150, 3)],
        "user_id long, event_type string, ts long, event_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = state_intervals(ev, "user_id", "event_type", "ts", "event_id")
    got = {r["state"]: r["duration_secs"] for r in iv.collect()}
    assert got == {"b": 0, "a": 50}


def test_mad_anomaly_exact_and_robust(spark):
    rows = (
        [("x", 100)] * 5 + [("x", 1000)]          # mad=0: only the deviant flags
        + [("y", 100), ("y", 200), ("y", 300), ("y", 400)]  # even-n interp
    )
    df = spark.createDataFrame(rows, "event_type string, v long")
    got = {r["event_type"]: r for r in
           mad_anomaly(df, ["event_type"], "v", k=3).collect()}
    x, y = got["x"], got["y"]
    # median 100 (the spike does NOT drag it — robustness), MAD 0,
    # strict > 0 flags exactly the spike
    assert (x["med_cents_x2"], x["mad_cents_x2"], x["n_anomalies"]) == (200, 0, 1)
    # median 250, adev {150,50,50,150}, MAD 100, 3*100=300: none exceed
    assert (y["med_cents_x2"], y["mad_cents_x2"], y["n_anomalies"]) == (500, 200, 0)
    assert (x["n_points"], y["n_points"]) == (6, 4)


def test_dedup_survivors_by_picks_longest_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7), (5, 20), (6, 20)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_survivors_by(docs, pairs, "doc_id", "n_chars").collect()
    )
    # group {1,2,3}: 2 wins on n_chars; singleton 4 kept;
    # group {5,6}: tie on n_chars -> min id 5
    assert kept == [2, 4, 5]
