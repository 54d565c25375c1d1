"""Link graph (operators/graph.py): edge extraction, degree stats,
PageRank vs closed form and numpy power iteration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.graph import (
    host_degree_stats,
    link_edges,
    pagerank,
)


def _page(url, hrefs):
    html = "<html><body>" + "".join(f'<a href="{h}">x</a>' for h in hrefs) + "</body></html>"
    return (url, bytearray(html.encode()))


@pytest.fixture(scope="module")
def edges(spark):
    rows = [
        _page("http://a.com/1", ["http://b.com/x", "http://b.com/y", "/local"]),
        _page("http://b.com/1", ["http://c.com/", "mailto:z@q"]),
        _page("http://c.com/1", ["http://a.com/2"]),
        _page("http://d.com/1", []),  # isolated page, no links
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    return link_edges(df).cache()


def test_link_edges_hand_case(edges):
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    # two b.com hrefs collapse to ONE edge; relative link -> self edge
    assert got == {
        ("a.com", "b.com"),
        ("a.com", "a.com"),
        ("b.com", "c.com"),
        ("c.com", "a.com"),
    }


def test_degree_stats(edges):
    d = {r["host"]: (r["out_degree"], r["in_degree"]) for r in
         host_degree_stats(edges).collect()}
    assert d["a.com"] == (2, 2)
    assert d["b.com"] == (1, 1)
    assert d["c.com"] == (1, 1)


def test_pagerank_cycle_uniform(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    ranks = {r["host"]: r["rank"] for r in pagerank(e, n_iters=5).collect()}
    for v in ranks.values():
        assert abs(v - 1 / 3) < 1e-12
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_matches_numpy_power_iteration(spark):
    rng = np.random.RandomState(5)
    n = 12
    pairs = {(int(a), int(b)) for a, b in rng.randint(0, n, size=(40, 2))}
    e = spark.createDataFrame(
        [(f"h{a}", f"h{b}") for a, b in pairs], "src string, dst string"
    )
    iters, d = 8, 0.85
    got = {r["host"]: r["rank"] for r in pagerank(e, n_iters=iters, damping=d).collect()}

    hosts = sorted({h for p in pairs for h in (f"h{p[0]}", f"h{p[1]}")})
    idx = {h: i for i, h in enumerate(hosts)}
    m = len(hosts)
    out = np.zeros(m)
    adj = np.zeros((m, m))
    for a, b in pairs:
        adj[idx[f"h{b}"], idx[f"h{a}"]] += 1
        out[idx[f"h{a}"]] += 1
    r = np.full(m, 1 / m)
    for _ in range(iters):
        contrib = np.where(out > 0, r / np.maximum(out, 1), 0.0)
        dangling = r[out == 0].sum()
        r = (1 - d) / m + d * (adj @ contrib + dangling / m)
    for h in hosts:
        assert abs(got[h] - r[idx[h]]) < 1e-9, h
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_on_extracted_edges(edges):
    ranks = pagerank(edges, n_iters=6).collect()
    total = sum(r["rank"] for r in ranks)
    assert abs(total - 1.0) < 1e-9
    by = {r["host"]: r["rank"] for r in ranks}
    # a.com has two in-edges (incl. self) -> highest rank
    assert by["a.com"] == max(by.values())


def test_link_edges_protocol_relative(spark):
    """//host/path hrefs carry their own host (ADVICE r3): they must
    resolve cross-host via the href's authority, not to a self-edge."""
    rows = [_page("http://a.com/1", ["//cdn.example.com/lib.js", "//a.com/self",
                                     "/local", "http://b.com/x"])]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r["src"], r["dst"]) for r in link_edges(df).collect()}
    assert got == {
        ("a.com", "cdn.example.com"),
        ("a.com", "a.com"),  # //a.com/self and /local both land here
        ("a.com", "b.com"),
    }


def test_extract_anchor_pairs_cleaning(spark):
    from chainalytic_framework_spark.functions.html import extract_anchor_pairs
    from pyspark.sql import functions as F

    html = (
        '<body><a href="/x">Hello <b>World</b></a>'
        '<a class="z" href="/y"> Fish &amp; Chips </a>'
        "<a href='/sq'>single-quoted too</a></body>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    h, t = extract_anchor_pairs(F.col("html"))
    row = df.select(h.alias("h"), t.alias("t")).collect()[0]
    # double-quoted anchors in document order, then single-quoted ones
    assert row["h"] == ["/x", "/y", "/sq"]
    assert row["t"] == ["Hello World", "Fish & Chips", "single-quoted too"]


def test_anchor_text_index_top_term_deterministic(spark):
    from chainalytic_framework_spark.operators.graph import anchor_text_index

    def a(href, text):
        return f'<a href="{href}">{text}</a>'

    rows = [
        (a("/t", "alpha") + a("/t", "beta"),),
        (a("/t", "beta") + a("/u", "only"),),
        (a("/t", "alpha"),),
    ]
    df = spark.createDataFrame(rows, "html string")
    out = {r["dst"]: r for r in anchor_text_index(df).collect()}
    t = out["/t"]
    # alpha:2 beta:2 -> tie broken toward lexicographically GREATER term
    assert (t["n_refs"], t["n_terms"]) == (4, 2)
    assert (t["top_term"], t["top_term_refs"]) == ("beta", 2)
    assert out["/u"]["n_refs"] == 1 and out["/u"]["top_term"] == "only"


def test_anchor_text_index_skips_empty(spark):
    from chainalytic_framework_spark.operators.graph import anchor_text_index

    df = spark.createDataFrame(
        [('<a href="">no dst</a><a href="/k"> <b> </b> </a>'
          '<a href="/k">kept</a>',)],
        "html string",
    )
    out = anchor_text_index(df).collect()
    assert len(out) == 1
    assert out[0]["dst"] == "/k" and out[0]["n_refs"] == 1
