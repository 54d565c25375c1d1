"""Differential tests: closing-session operators vs brute-force Python
references on randomized inputs (seeded — deterministic)."""

from __future__ import annotations

import datetime as dt
import random

from chainalytic_framework_spark.operators.dedup import (
    containment_pairs,
    shingles,
)
from chainalytic_framework_spark.operators.robust import trimmed_mean
from chainalytic_framework_spark.operators.states import tier_coverage


def _ref_trimmed(values: list[int], trim_pct: int) -> tuple[int, int, int]:
    s = sorted(values)
    k = len(s) * trim_pct // 100
    kept = s[k: len(s) - k]
    return len(s), len(kept), sum(kept)


def test_trimmed_mean_matches_reference_on_random_groups(spark):
    rng = random.Random(7)
    rows, ref = [], {}
    for g in range(20):
        n = rng.randint(1, 60)
        vals = [rng.randint(-10**6, 10**6) for _ in range(n)]
        ref[f"g{g}"] = _ref_trimmed(vals, 10)
        rows += [(f"g{g}", v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, cents long, tie long")
    out = trimmed_mean(df, ["grp"], "cents", "tie", trim_pct=10).collect()
    assert len(out) == 20
    for r in out:
        n, n_kept, kept_sum = ref[r["grp"]]
        assert (r["n"], r["n_kept"], r["kept_sum"]) == (n, n_kept, kept_sum)
        # Spark's long `div` truncates toward zero (Java semantics);
        # Python's // floors — emulate truncation explicitly
        q = kept_sum * 100
        trunc = -((-q) // n_kept) if q < 0 else q // n_kept
        assert r["trimmed_mean_x100"] == trunc


def _ref_coverage(minutes: list[int]) -> tuple[int, int]:
    present = sorted(set(minutes))
    runs = [present[0]] + [
        b - a - 1 for a, b in zip(present, present[1:])
    ] + [1439 - present[-1]]
    return len(present), max(runs)


def test_tier_coverage_matches_reference_on_random_days(spark):
    rng = random.Random(11)
    rows, ref = [], {}
    day0 = dt.datetime(2024, 3, 1)
    for t in range(12):
        mins = [rng.randrange(1440) for _ in range(rng.randint(1, 300))]
        ref[f"t{t}"] = _ref_coverage(mins)
        rows += [(f"t{t}", day0 + dt.timedelta(minutes=m)) for m in mins]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = tier_coverage(df, ["event_type"], "ts").collect()
    assert len(out) == 12
    for r in out:
        n_present, longest = ref[r["event_type"]]
        assert r["n_present"] == n_present
        assert r["longest_missing_buckets"] == longest
        assert r["coverage_x1e4"] == n_present * 10000 // 1440


def test_containment_matches_reference_sets(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 80))))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets = {
        r["doc_id"]: set()
        for r in df.select("doc_id").collect()
    }
    for r in shingles(df).collect():
        sets[r["doc_id"]].add(r["shingle"])
    out = containment_pairs(df, min_inter=1).collect()
    seen = set()
    for r in out:
        a, b = r["id_a"], r["id_b"]
        inter = len(sets[a] & sets[b])
        assert r["n_inter"] == inter
        assert r["cont_a_in_b_x1e4"] == inter * 10000 // len(sets[a])
        assert r["cont_b_in_a_x1e4"] == inter * 10000 // len(sets[b])
        seen.add((a, b))
    # completeness: every intersecting pair is reported exactly once
    expected = {
        (a, b)
        for a in sets for b in sets
        if a < b and sets[a] & sets[b]
    }
    assert seen == expected
