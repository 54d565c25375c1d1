"""Sessionization semantics on a hand-built timeline."""

from __future__ import annotations

from chainalytic_framework_spark.operators.sessions import session_aggregates, sessionize


def _events(spark):
    rows = [
        (1, 0), (1, 100), (1, 1700),      # session 1 (gaps < 1800)
        (1, 4000), (1, 4100),             # session 2 (gap 2300)
        (2, 50),                          # singleton session
    ]
    return spark.createDataFrame(rows, "user_id long, t long").selectExpr(
        "user_id", "timestamp_seconds(t) as ts"
    )


def test_session_numbering(spark):
    out = sessionize(_events(spark), key="user_id", ts="ts", gap_seconds=1800)
    got = {(r["user_id"], r["ts"].second + r["ts"].minute * 60 + r["ts"].hour * 3600): r["session_no"]
           for r in out.collect()}
    assert got[(1, 0)] == got[(1, 100)] == got[(1, 1700)] == 1
    assert got[(1, 4000)] == got[(1, 4100)] == 2
    assert got[(2, 50)] == 1


def test_session_aggregates(spark):
    out = {(r["user_id"], r["session_no"]): r for r in
           session_aggregates(_events(spark), gap_seconds=1800).collect()}
    s1 = out[(1, 1)]
    assert s1["n_events"] == 3 and s1["duration_seconds"] == 1700
    s2 = out[(1, 2)]
    assert s2["n_events"] == 2 and s2["duration_seconds"] == 100
    assert out[(2, 1)]["duration_seconds"] == 0


def test_boundary_exact_gap_is_same_session(spark):
    rows = [(1, 0), (1, 1800), (1, 3601)]
    df = spark.createDataFrame(rows, "user_id long, t long").selectExpr(
        "user_id", "timestamp_seconds(t) as ts"
    )
    out = sessionize(df, gap_seconds=1800).collect()
    nos = sorted(r["session_no"] for r in out)
    assert nos == [1, 1, 2]  # gap == 1800 keeps session; 1801 splits
