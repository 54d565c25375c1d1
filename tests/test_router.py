"""Tier router (operators/router.py): exact segment covers, routed
reads equal to finest-tier truth, and the row-scan reduction that is
the router's entire point."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.bucketing import SECONDS
from chainalytic_framework_spark.operators.cascade import build_all_tiers
from chainalytic_framework_spark.operators.router import read_routed, route_range


def test_route_range_exact_cover_properties():
    rng = random.Random(11)
    widths = [SECONDS[t] for t in ("1m", "1h", "1d", "30d")]
    for _ in range(200):
        lo = rng.randrange(0, 10**9 // 60) * 60
        hi = lo + rng.randrange(1, 100000) * 60
        segs = route_range(lo, hi)
        # disjoint, ordered, exact cover
        assert segs[0][1] == lo and segs[-1][2] == hi
        for (t, a, b), (t2, a2, b2) in zip(segs, segs[1:]):
            assert b == a2
        for t, a, b in segs:
            w = SECONDS[t]
            assert a % w == 0 and b % w == 0 and a < b
        # coarsest-fit: a segment of tier t must never contain a whole
        # aligned bucket of the next coarser tier
        order = ["1m", "1h", "1d", "30d"]
        for t, a, b in segs:
            i = order.index(t)
            if i + 1 < len(order):
                wc = SECONDS[order[i + 1]]
                assert (b // wc) * wc <= -(-a // wc) * wc  # no full coarse bucket inside


def test_route_range_rejects_unaligned():
    with pytest.raises(ValueError):
        route_range(30, 3600)


@pytest.fixture(scope="module")
def tiers(spark, pages):
    # lang grain: DENSE series (few keys, every bucket populated) — the
    # regime where coarse tiers collapse rows and routing pays off; the
    # url-grain sparse regime routes identically (exactness test covers
    # any grain) but saves I/O only via partition pruning, not row count
    t = build_all_tiers(pages, grain="lang")
    return {k: v.cache() for k, v in t.items()}


def test_read_routed_equals_finest(tiers):
    lo = tiers["1m"].agg(F.min(F.col("bucket_start").cast("long"))).first()[0]
    hi = tiers["1m"].agg(F.max(F.col("bucket_start").cast("long"))).first()[0] + 60
    rng = random.Random(5)
    for _ in range(4):
        a = lo + rng.randrange(0, max(1, (hi - lo) // 60)) * 60
        b = min(hi, a + rng.randrange(1, (hi - lo) // 60 + 1) * 60)
        if a >= b:
            continue
        routed = {
            r["lang"]: r["point_count"]
            for r in read_routed(tiers, a, b, "point_count", keys=("lang",)).collect()
        }
        direct = {
            r["lang"]: r["pc"]
            for r in tiers["1m"]
            .where(
                (F.col("bucket_start").cast("long") >= a)
                & (F.col("bucket_start").cast("long") < b)
            )
            .groupBy("lang")
            .agg(F.sum("point_count").alias("pc"))
            .collect()
        }
        assert routed == direct


def test_routed_scans_fewer_rows(tiers):
    # a month-long aligned range must be served almost entirely from
    # coarse tiers: count the rows each plan touches
    lo = tiers["1d"].agg(F.min(F.col("bucket_start").cast("long"))).first()[0]
    b0 = -(-lo // 86400) * 86400
    a, b = b0, b0 + 20 * 86400
    segs = route_range(a, b)
    tiers_used = {t for t, _, _ in segs}
    assert "1d" in tiers_used and "1m" not in tiers_used or len(segs) > 0
    n_routed = 0
    for t, s0, s1 in segs:
        n_routed += (
            tiers[t]
            .where(
                (F.col("bucket_start").cast("long") >= s0)
                & (F.col("bucket_start").cast("long") < s1)
            )
            .count()
        )
    n_direct = (
        tiers["1m"]
        .where(
            (F.col("bucket_start").cast("long") >= a)
            & (F.col("bucket_start").cast("long") < b)
        )
        .count()
    )
    assert n_routed < n_direct / 5  # at least 5x fewer rows touched
