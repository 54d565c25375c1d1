"""URL normalization & domain analytics — the key hygiene layer of a
web-crawl pipeline. Everything here is pure Column expressions
(regexp / split / higher-order array functions), whole-stage codegen,
no UDF — and every regex is portable to the DuckDB oracle, so the
operators are hash-checkable cross-engine.

Why this matters at 10^12 docs: crawl dedup keys on the URL, and raw
crawl URLs disagree on case, fragments, default ports, trailing
slashes, tracking params, and param order. Canonicalizing BEFORE
hashing collapses those families (typically several % of a crawl) and
is the difference between "exact dedup" and "exact dedup of strings".

Functions:
- ``url_host / url_path / url_query``: component extraction by anchored
  regex (deliberately regex, not ``parse_url``: bit-identical twin
  exists in every SQL engine, and malformed URLs degrade to '' instead
  of NULL-poisoning downstream keys).
- ``canonicalize_url``: lowercase scheme+host, strip fragment + default
  port + trailing slash, drop ``utm_*`` tracking params, SORT remaining
  params (order-insensitive equality) — the RFC 3986 §6 safe
  normalizations plus the de-facto tracking-param strip.
- ``registrable_domain``: eTLD+1 heuristic — last two labels, or three
  when the penultimate label is a known second-level suffix (co.uk,
  com.au, …). The full public-suffix list is a data file a cluster
  deployment broadcast-joins; the heuristic covers the overwhelming
  bulk and keeps this module dependency-free (documented limitation).
- ``path_depth``: non-empty path segment count (crawl-frontier and
  quality signal; depth>6 is a classic spider-trap marker).

Reference analogue: none — the reference's keys are exact addresses
(S8); URL hygiene is engine-added webtext capability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HOST_RE = "^[a-zA-Z]+://([^/?#]+)"
_PATH_RE = "^[a-zA-Z]+://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# second-level suffixes where eTLD+1 needs three labels
_SL_SUFFIXES = ("co", "com", "org", "net", "ac", "gov", "edu")


def url_host(url: Column) -> Column:
    """Hostname (with port if present), lowercased."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _QUERY_RE, 1)


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercased scheme+host, no default port, no
    fragment, no trailing path slash, utm_* params dropped, remaining
    params sorted. Empty query/path degrade cleanly."""
    scheme = F.lower(F.regexp_extract(url, "^([a-zA-Z]+)://", 1))
    host = F.regexp_replace(url_host(url), ":(80|443)$", "")
    path = F.regexp_replace(url_path(url), "/+$", "")
    q = url_query(url)
    params = F.filter(
        F.split(q, "&", -1),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic from a hostname (port stripped): last 2 labels,
    or 3 when the penultimate label is a second-level suffix."""
    h = F.regexp_replace(host, ":[0-9]+$", "")
    labels = F.split(h, r"\.", -1)
    n = F.size(labels)
    penult = F.element_at(labels, -2)
    take3 = (n >= 3) & penult.isin(*_SL_SUFFIXES)
    tail = F.when(take3, F.slice(labels, n - 2, 3)).otherwise(
        F.when(n >= 2, F.slice(labels, n - 1, 2)).otherwise(labels)
    )
    return F.array_join(tail, ".")


def path_depth(url: Column) -> Column:
    """Count of non-empty path segments."""
    segs = F.filter(F.split(url_path(url), "/", -1), lambda s: s != "")
    return F.size(segs).cast("long")


def path_prefixes(url: Column, max_depth: int = 3) -> Column:
    """Array of cumulative path prefixes: for ``/a/b/c`` returns
    ``['/a', '/a/b', '/a/b/c']`` (up to ``max_depth`` levels) — the
    hierarchical rollup key for per-directory crawl stats (a trie
    rollup without a trie: explode + groupBy gives every directory's
    aggregate in one shuffle; the reference ships an unused trie,
    ``common/trie.py`` — this is its warehouse-scale replacement).
    Pure higher-order functions, no UDF."""
    segs = F.filter(F.split(url_path(url), "/", -1), lambda s: s != "")
    depth = F.least(F.size(segs), F.lit(max_depth))
    return F.when(depth > 0, F.transform(
        F.sequence(F.lit(1), depth),
        lambda i: F.concat(F.lit("/"), F.array_join(F.slice(segs, 1, i), "/")),
    )).otherwise(F.array().cast("array<string>"))
