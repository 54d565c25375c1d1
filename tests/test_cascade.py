"""Cascade exactness: downsampled tiers equal direct-from-raw rollups."""

from __future__ import annotations

import pytest

from chainalytic_framework_spark.operators.cascade import build_all_tiers
from chainalytic_framework_spark.operators.rollup import rollup_pages


@pytest.mark.parametrize("tier_name", ["1h", "1d", "30d"])
def test_cascade_equals_direct(spark, pages, tier_name):
    tiers = build_all_tiers(pages, grain="url")
    direct = rollup_pages(pages, tier_name, grain="url")
    casc = tiers[tier_name]
    assert casc.exceptAll(direct).count() == 0
    assert direct.exceptAll(casc).count() == 0


def test_cascade_lang_grain(spark, pages):
    tiers = build_all_tiers(pages, grain="lang")
    direct = rollup_pages(pages, "1d", grain="lang")
    assert tiers["1d"].exceptAll(direct).count() == 0
    assert direct.exceptAll(tiers["1d"]).count() == 0


def test_parallelism_invariance(spark, pages):
    """Integer measures ⇒ exact equality across partition layouts
    (the local stand-in for N vs 4N executors)."""
    p2 = pages.repartition(2)
    p16 = pages.repartition(16)
    a = rollup_pages(p2, "1h", grain="url")
    b = rollup_pages(p16, "1h", grain="url")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
