"""Sitemap parsing and frontier seeding.

The discovery half of the crawl planner: parse sitemap.xml bodies into
(loc, lastmod) url entries and diff them against the known-url state to
seed the frontier — NEW urls enter immediately, KNOWN urls re-enter
when the sitemap's lastmod postdates the last successful fetch, and
everything else defers to the change-rate schedule
(``operators/recrawl.py``). Together with ``operators/robots.py`` this
closes the crawl loop: sitemap says what exists, robots says what may
be fetched, recrawl says when it is due, politeness says when it
actually runs.

Parsing is the same deterministic RE2-chain discipline as
``functions/html.py`` (no XML library dependency, byte-identical
cross-engine): ``<url>`` blocks are matched non-greedily, ``<loc>`` is
required, ``<lastmod>`` optional W3C date/datetime (date-only rounds
to midnight UTC; a trailing ``Z`` or ``±HH:MM`` timezone designator is
parsed and the epoch normalized to true UTC). Malformed blocks yield
no row rather than an error — web sitemaps are exactly as dirty as
web HTML.

Scale: parse is explode-per-entry (bounded by the 50k-url sitemap spec
per file); the seed diff is one key-partitioned outer join of two
|urls|-row frames — co-located on a cluster that buckets both by
url_hash, the same argument as ``operators/diff.py``.

Reference analogue: the reference discovers work by block height
(``next = last + 1``, aggregator/__main__.py) — a web corpus has no
height, so discovery needs this operator instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?is)<url\s*>(.*?)</url\s*>"
_LOC_RE = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"
_LASTMOD_RE = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"


def parse_sitemap(
    sitemaps: DataFrame,
    host_col: str,
    xml_col: str,
) -> DataFrame:
    """(host, loc, lastmod_epoch) per ``<url>`` entry.

    ``lastmod_epoch`` is BIGINT epoch seconds or null (absent or
    unparseable lastmod); date-only values are midnight UTC. Blocks
    without a ``<loc>`` are dropped.
    """
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), F.lit(1))
        ).alias("block"),
    )
    loc = F.regexp_extract("block", _LOC_RE, 1)
    lastmod = F.regexp_extract("block", _LASTMOD_RE, 1)
    # W3C datetime: YYYY-MM-DD[THH:MM:SS[TZD]]; the naive prefix parses
    # via to_timestamp (session tz is UTC), then the timezone designator
    # (Z or ±HH:MM) is subtracted to normalize to true UTC — a +02:00
    # lastmod must compare correctly against a UTC fetch watermark
    naive = F.when(
        lastmod.rlike(r"^\d{4}-\d{2}-\d{2}$"),
        F.to_timestamp(lastmod, "yyyy-MM-dd"),
    ).when(
        lastmod.rlike(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"),
        F.to_timestamp(F.substring(lastmod, 1, 19), "yyyy-MM-dd'T'HH:mm:ss"),
    ).cast("long")
    off_sign = F.when(
        F.regexp_extract(lastmod, r"([+-])\d{2}:\d{2}$", 1) == "-", -1
    ).otherwise(1)
    off_secs = (
        F.coalesce(
            F.regexp_extract(lastmod, r"[+-](\d{2}):\d{2}$", 1).try_cast("long"),
            F.lit(0),
        )
        * 3600
        + F.coalesce(
            F.regexp_extract(lastmod, r"[+-]\d{2}:(\d{2})$", 1).try_cast("long"),
            F.lit(0),
        )
        * 60
    ) * off_sign
    ts = naive - off_secs
    return (
        blocks.select(
            "host",
            loc.alias("loc"),
            ts.cast("long").alias("lastmod_epoch"),
        )
        .where(F.col("loc") != "")
    )


def seed_frontier(
    entries: DataFrame,
    known: DataFrame,
    url_col: str = "loc",
    fetched_epoch_col: str = "last_fetch_epoch",
) -> DataFrame:
    """Diff sitemap entries against crawl state → frontier seeds.

    ``entries`` is :func:`parse_sitemap` output; ``known`` carries one
    row per already-crawled url (``url_col``) with its last successful
    fetch time. Output keeps every sitemap url with a ``reason``:

    - ``'new'``    url never fetched,
    - ``'stale'``  lastmod present and > last fetch,
    - ``'fresh'``  known and not stale (defer to the recrawl schedule).

    One key-partitioned left join; classification is pure expressions.
    """
    k = known.select(
        F.col(url_col).alias("loc"),
        F.col(fetched_epoch_col).alias("_fetched"),
    )
    j = entries.join(k, "loc", "left")
    reason = (
        F.when(F.col("_fetched").isNull(), F.lit("new"))
        .when(
            F.col("lastmod_epoch").isNotNull()
            & (F.col("lastmod_epoch") > F.col("_fetched")),
            F.lit("stale"),
        )
        .otherwise(F.lit("fresh"))
    )
    return j.select(
        "host", "loc", "lastmod_epoch",
        F.col("_fetched").alias("last_fetch_epoch"),
        reason.alias("reason"),
    )
