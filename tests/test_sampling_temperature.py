"""Temperature mixture resampling: exact-integer membership."""

from __future__ import annotations

import hashlib

from chainalytic_framework_spark.operators.sampling import (
    hash_sample,
    temperature_resample,
)


def _ppm_py(key, seed):
    h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def _docs(spark, counts):
    rows = []
    i = 0
    for g, n in counts.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_temperature_membership_matches_python_reference(spark):
    df = _docs(spark, {"en": 400, "de": 100, "sw": 4})
    out = temperature_resample(df, "lang", "doc_id", coeff_ppm=2_000_000,
                               a=1, b=2, seed=11)
    got = {r["doc_id"] for r in out.collect()}
    n = {"en": 400, "de": 100, "sw": 4}
    langs = {i: ("en" if i < 400 else "de" if i < 500 else "sw")
             for i in range(504)}
    expect = {
        i for i in range(504)
        if _ppm_py(i, 11) ** 2 * n[langs[i]] < 2_000_000 ** 2
    }
    assert got == expect


def test_temperature_small_group_saturates(spark):
    # coeff/1e6 = 2.0 -> groups with n <= 4 keep EVERY row (p = 1).
    df = _docs(spark, {"big": 500, "tiny": 4})
    out = temperature_resample(df, "lang", "doc_id", coeff_ppm=2_000_000,
                               a=1, b=2, seed=3)
    kept = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in kept}
    assert by.get("tiny") == 4
    assert by.get("big", 0) < 500


def test_temperature_alpha_one_equals_hash_sample(spark):
    df = _docs(spark, {"en": 300, "de": 50})
    t = temperature_resample(df, "lang", "doc_id", coeff_ppm=250_000,
                             a=1, b=1, seed=5)
    h = hash_sample(df, 0.25, "doc_id", seed=5)
    assert {r["doc_id"] for r in t.collect()} == {
        r["doc_id"] for r in h.collect()
    }


def test_temperature_flattens_mixture(spark):
    # alpha = 1/2: kept counts ~ coeff/1e6 * sqrt(n_g) -> the 16:1 input
    # imbalance compresses toward 4:1.
    df = _docs(spark, {"en": 1600, "sw": 100})
    out = temperature_resample(df, "lang", "doc_id", coeff_ppm=400_000,
                               a=1, b=2, seed=1)
    by = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # expected: en 1600*0.4/40 = 16, sw 100*0.4/10 = 4 (+- hash noise)
    ratio = by["en"] / by["sw"]
    assert 2 <= ratio <= 8, by
