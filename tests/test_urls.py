"""URL hygiene (functions/urls.py): canonicalization edge cases,
eTLD+1 heuristic, path depth, and the dedup-collapse property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.functions.urls import (
    canonicalize_url,
    path_depth,
    registrable_domain,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonical_collapses_aliases(spark):
    aliases = [
        "https://Example.COM/a/b?x=1&y=2",
        "HTTPS://example.com:443/a/b?y=2&x=1",
        "https://example.com/a/b/?x=1&y=2#section",
        "https://example.com/a/b?utm_source=tw&x=1&utm_campaign=c&y=2",
    ]
    got = set(_canon(spark, aliases))
    assert got == {"https://example.com/a/b?x=1&y=2"}


def test_canonical_preserves_distinctions(spark):
    distinct = [
        "https://example.com/a/b?x=1",     # different param value
        "https://example.com/a/b?x=2",
        "https://example.com/a/B",          # path case is significant
        "https://example.com/a/b",
        "http://example.com/a/b",           # scheme differs
        "https://example.com:8080/a/b",     # non-default port kept
    ]
    assert len(set(_canon(spark, distinct))) == len(distinct)


def test_canonical_no_query_no_path(spark):
    assert _canon(spark, ["https://Example.com"]) == ["https://example.com"]
    assert _canon(spark, ["https://example.com/?utm_x=1"]) == ["https://example.com"]


def test_registrable_domain_heuristic(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.news.co.uk": "news.co.uk",
        "shop.com.au": "shop.com.au",     # penult 'com', 3 labels
        "deep.sub.shop.com.au": "shop.com.au",
        "example.org": "example.org",
        "localhost": "localhost",
        "example.com:8080": "example.com",
    }
    df = spark.createDataFrame([(h,) for h in cases], "h string").select(
        "h", registrable_domain(F.col("h")).alias("d")
    )
    got = {r["h"]: r["d"] for r in df.collect()}
    assert got == cases


def test_path_depth(spark):
    cases = {
        "https://e.com": 0,
        "https://e.com/": 0,
        "https://e.com/a": 1,
        "https://e.com/a/b/c?q=1": 3,
        "https://e.com//a//b/": 2,  # empty segments don't count
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string").select(
        "u", path_depth(F.col("u")).alias("d")
    )
    got = {r["u"]: r["d"] for r in df.collect()}
    assert got == cases


def test_host_extraction_malformed_degrades(spark):
    df = spark.createDataFrame([("not a url",), ("",)], "u string").select(
        url_host(F.col("u")).alias("h")
    )
    assert [r["h"] for r in df.collect()] == ["", ""]


def test_path_prefixes(spark):
    from chainalytic_framework_spark.functions.urls import path_prefixes

    cases = {
        "https://e.com/a/b/c": ["/a", "/a/b", "/a/b/c"],
        "https://e.com/a/b/c/d/e": ["/a", "/a/b", "/a/b/c"],  # capped at 3
        "https://e.com/a": ["/a"],
        "https://e.com/": [],
        "https://e.com//a//b": ["/a", "/a/b"],  # empty segments skipped
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string").select(
        "u", path_prefixes(F.col("u"), 3).alias("p")
    )
    got = {r["u"]: list(r["p"]) for r in df.collect()}
    assert got == cases
