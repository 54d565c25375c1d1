"""Web link graph over crawled pages: edges from extracted hrefs,
degree statistics, and PageRank.

The Common-Crawl-shaped corpus carries its own hyperlink graph in the
``html`` column; this module turns it into analytics the crawl/quality
side of a web pipeline actually uses — host-level in/out degrees
(frontier prioritization, spam-hub detection) and PageRank (the
canonical centrality prior for crawl scheduling and quality weighting;
Page et al. 1999).

Scale shapes:

- ``link_edges``: one scan — `extract_links` (RE2 chain,
  functions/html.py) → explode → host normalization; edges land as
  (src_host, dst_host) with an optional registrable-domain grain.
- ``host_degree_stats``: two groupBys on the edge list (SQL-exact,
  oracle-paired as ``link_degree_documents`` using doc-id stand-in
  hosts at gate scale).
- ``pagerank``: standard power iteration as a driver loop of K joins —
  each round is rank/out_degree propagated over the edge list (shuffle
  on dst) plus the damping term; dangling mass is redistributed
  uniformly so ranks sum to 1 every round (tested). K is fixed and
  small (crawl priors converge in ~10-20 rounds); each round's plan is
  checkpointed by truncating lineage via ``localCheckpoint`` every few
  rounds so the DAG stays bounded. At 10^12 edges this is exactly the
  Pregel-on-DataFrames shape GraphFrames uses; the deliberate
  DataFrame-only form keeps it inside Catalyst (AQE skew handling for
  hub hosts) with no extra dependency.

Determinism: float sums across partitionings are associativity-
sensitive; tests pin rank ORDER and totals to tolerances, and the
hand-computable 3-node case to exact closed form — the same contract
as the IVF/PQ family (approximate ops get property gates, not hash
gates).

Reference analogue: none — engine-added webtext capability.

Note on fixtures: the deterministic synthetic corpus (synth.py) fills
``html`` with random bytes — no anchors — so graph tests use
hand-built HTML; real edge lists come from crawl data (the WARC source
feeds the same ``extract_links`` chain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.html import extract_links
from ..functions.urls import registrable_domain, url_host


def link_edges(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    domain_grain: bool = False,
) -> DataFrame:
    """(src, dst) host-level edge list from anchor hrefs. Relative
    links (no scheme/host) resolve to the source host; self-loops are
    kept (intra-site links are real edges for degree stats) but
    deduplicated per (page, dst) so one page voting many times for one
    target counts once — the standard link-spam guard."""
    grain = (lambda c: registrable_domain(url_host(c))) if domain_grain else url_host
    src = grain(F.col(url_col))
    links = pages.select(
        src.alias("src"),
        F.explode(extract_links(F.col(html_col).cast("string"))).alias("href"),
    )
    dst_host = grain(F.col("href"))
    # protocol-relative //host/path carries its own host — resolve it via
    # url_host after prepending a scheme (ADVICE r3: checking '/' first
    # misread these as site-relative self-edges, skewing degree/PageRank)
    proto_rel_host = grain(F.concat(F.lit("https:"), F.col("href")))
    # absolute http(s) → target host; site-relative path → self edge;
    # other schemes (mailto:, javascript:, …) and fragments → dropped
    return (
        links.select(
            "src",
            F.when(F.col("href").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), dst_host)
            .when(F.col("href").startswith("//"), proto_rel_host)
            .when(F.col("href").startswith("/"), F.col("src"))
            .otherwise(F.lit(""))
            .alias("dst"),
        )
        .where(F.col("dst") != "")
        .distinct()
    )


def host_degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host (out_degree, in_degree) over the distinct edge list —
    full outer so pure sources and pure sinks both appear."""
    out_d = edges.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a (src, dst) edge list.

    Returns (host, rank) with Σrank = 1 (dangling mass redistributed
    uniformly each round). Each round: contrib = rank/out_degree over
    edges (one shuffle on dst), plus teleport + dangling terms computed
    from a 1-row aggregate (broadcast scalar, no driver collect of
    data). Lineage is truncated every ``checkpoint_every`` rounds."""
    edges = edges.cache()  # read n_iters+1 times (contribs + degrees)
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
    ).cache()
    n = nodes.count()  # scalar cardinality — bounded driver state
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    ranked = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(n_iters):
        with_deg = ranked.join(
            out_deg, ranked["host"] == out_deg["src"], "left"
        ).select("host", "rank", "out_degree")
        # dangling hosts (no outlinks) leak their whole rank: collect it
        # as a 1-row aggregate and spread uniformly
        dangling = with_deg.where(F.col("out_degree").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            with_deg.where(F.col("out_degree").isNotNull())
            .join(edges, with_deg["host"] == edges["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_degree")).alias("_in"))
        )
        ranked = (
            nodes.join(contribs, nodes["host"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            ranked = ranked.localCheckpoint(eager=True)
    return ranked


def anchor_text_index(
    docs: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """Anchor-text index: what the REST of the corpus calls each target
    url — the classic off-page relevance signal (anchor text describes
    the target better than the target describes itself), and the
    surrogate-document trick for ranking pages that were never fetched.

    Per distinct href target:

    - ``n_refs``         anchors pointing at it (corpus-wide),
    - ``n_terms``        distinct (cleaned) anchor texts,
    - ``top_term``       most frequent anchor text, ties broken toward
                         the lexicographically greatest term via a
                         struct max — deterministic at any parallelism,
    - ``top_term_refs``  its count.

    Plan: explode anchors (bounded per document), one (dst, term)
    hash agg with map-side combine, one dst agg whose top pick is a
    struct ``max`` — no window, no join, two bounded shuffles. At
    10^12 documents the index is |distinct hrefs| rows; hot targets
    (a site's home page) are single GROUPing keys whose partial
    aggregation collapses map-side, the same reason the rollup tiers
    tolerate hot urls.

    Reference analogue: none (the reference's graph is implicit in
    chain transactions); engine-added webtext tooling, same family as
    :func:`link_edges` / :func:`pagerank`.
    """
    from ..functions.html import extract_anchor_pairs

    h = F.col(html_col).cast("string")
    hrefs, texts = extract_anchor_pairs(h)
    pairs = (
        docs.select(
            F.explode(F.arrays_zip(hrefs.alias("h"), texts.alias("t"))).alias("a")
        )
        .select(F.col("a.h").alias("dst"), F.col("a.t").alias("term"))
        .where((F.col("dst") != "") & (F.col("term") != ""))
    )
    counts = pairs.groupBy("dst", "term").agg(
        F.count(F.lit(1)).alias("n_refs_term")
    )
    return (
        counts.groupBy("dst")
        .agg(
            F.sum("n_refs_term").cast("long").alias("n_refs"),
            F.count(F.lit(1)).alias("n_terms"),
            F.max(
                F.struct(
                    F.col("n_refs_term").alias("c"), F.col("term").alias("t")
                )
            ).alias("_top"),
        )
        .select(
            "dst",
            "n_refs",
            "n_terms",
            F.col("_top.t").alias("top_term"),
            F.col("_top.c").cast("long").alias("top_term_refs"),
        )
    )
