"""Hex decode fidelity vs Python int(x, 16) ground truth (reference F1)."""

from __future__ import annotations

import decimal

from pyspark.sql import functions as F

from chainalytic_framework_spark.functions.decode import (
    hex_to_decimal_udf,
    hex_to_scaled_double,
    hex_to_scaled_double_udf,
)

CASES = [
    "0",
    "de0b6b3a7640000",                    # 1e18 → 1.0
    "1bc16d674ec80000",                   # 2e18 → 2.0
    "ffffffffffffffff",                   # 2^64-1 (> conv range)
    "152d02c7e14af6800000",               # 1e23 / 1e18 = 100000.0
    "0x2b5e3af16b1880000",                # 0x prefix, 50e18
    "not-hex",
    None,
]


def _truth(x):
    if x is None:
        return None
    try:
        return float(int(str(x).replace("0x", ""), 16)) / 1e18
    except ValueError:
        return None


def test_udf_matches_python_int(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "h string")
    got = {r["h"]: r["v"] for r in df.select("h", hex_to_scaled_double_udf()(
        F.regexp_replace("h", "^0x", "")).alias("v")).collect()}
    for c in CASES:
        assert got[c] == _truth(c), c


def test_jvm_fast_path_agrees_in_range(spark):
    small = [c for c in CASES if c and all(ch in "0123456789abcdef" for ch in c) and len(c) <= 15]
    df = spark.createDataFrame([(c,) for c in small], "h string")
    rows = df.select(
        hex_to_scaled_double("h").alias("jvm"), hex_to_scaled_double_udf()("h").alias("py")
    ).collect()
    for r in rows:
        assert r["jvm"] == r["py"]


def test_decimal_exactness(spark):
    df = spark.createDataFrame([("152d02c7e14af6800000",)], "h string")
    v = df.select(hex_to_decimal_udf()("h").alias("v")).first()["v"]
    assert v == decimal.Decimal(10**23) / decimal.Decimal(10**18)
