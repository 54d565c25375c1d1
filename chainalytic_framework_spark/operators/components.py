"""Connected components over near-duplicate pair graphs → dedup groups.

The dedup family (minhash → LSH bands → verified pairs, operators/
dedup.py) ends with PAIRS; a training-data pipeline needs GROUPS: every
cluster of mutually-near documents collapses to one representative.
Pairs → components is a connected-components problem on a graph whose
components are tiny (near-dup clusters) but whose node count is the
corpus (10^12 docs), so the algorithm must be shuffle-bounded and
converge in a logarithmic number of rounds — NOT label propagation
(O(diameter) rounds) and NOT anything driver-side.

This is the alternating large-star / small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014),
expressed as DataFrame ops:

- ``large_star``: every node connects its LARGER neighbors to its
  minimum neighbor (including itself).
- ``small_star``: every node connects its smaller-or-equal neighbors
  (and itself) to their minimum.

Each round is two shuffles (a groupBy(min) and a re-join on the node
key — same key, so with AQE the exchange is reused); the edge set
monotonically flattens into stars rooted at each component's minimum
id. Convergence is O(log n) rounds with high probability; a round's
"changed?" check is a bounded driver aggregate (count + order-free
hash-sum), never a data collect. Lineage is truncated with an eager
``localCheckpoint`` every round so 30-round plans don't accumulate
(on a cluster with a reliable checkpoint dir, swap for
``checkpoint``).

Reference analogue: none — the reference (yudus-labs/
chainalytic-framework) has no graph or dedup machinery; this extends
the north-rule training-data operator family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50  # safety backstop; the algorithm converges in O(log n)


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions of an undirected edge list (a, b)."""
    return edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _large_star(edges: DataFrame, persist: bool = True) -> tuple[DataFrame, DataFrame | None]:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}). Output edges oriented (child > parent).

    The symmetric neighbor list feeds BOTH the per-node min aggregate
    and the re-join, so the loop persists it; the (result, handle) pair
    lets the caller unpersist once the round is materialized. With
    ``persist=False`` (one-shot public API) nothing is cached and the
    handle is None."""
    nbrs = _sym(edges)
    if persist:
        nbrs = nbrs.persist()
    mins = nbrs.groupBy("a").agg(F.min(F.least("b", "a")).alias("m"))
    out = (
        nbrs.where(F.col("b") > F.col("a"))
        .join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return out, (nbrs if persist else None)


def _small_star(edges: DataFrame, persist: bool = True) -> tuple[DataFrame, DataFrame | None]:
    """For each node u: connect every smaller-or-equal neighbor and u
    itself to the minimum of those. Output oriented (child > parent).

    Only the ``b <= a`` half of the neighbor list is consumed twice, so
    that half (|E| rows, not 2|E|) is what gets persisted."""
    small = _sym(edges).where(F.col("b") <= F.col("a"))
    if persist:
        small = small.persist()
    j = small.join(
        small.groupBy("a").agg(F.min("b").alias("m")), "a"
    )
    out = j.select(F.col("b").alias("node"), "m").union(
        j.select(F.col("a").alias("node"), "m")
    )
    out = (
        out.where(F.col("node") != F.col("m"))
        .select(F.col("node").alias("a"), F.col("m").alias("b"))
        .distinct()
    )
    return out, (small if persist else None)


def large_star(edges: DataFrame) -> DataFrame:
    """One-shot form (no caching side effects); the iteration in
    ``connected_components`` uses the persisting internals."""
    return _large_star(edges, persist=False)[0]


def small_star(edges: DataFrame) -> DataFrame:
    """One-shot form (no caching side effects)."""
    return _small_star(edges, persist=False)[0]


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Order-free convergence fingerprint: (row count, XOR-fold of
    per-edge hashes — edges are distinct, so XOR is a set fingerprint;
    never overflows under ANSI mode). Bounded driver aggregate — never
    collects data."""
    r = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
    ).first()
    return int(r["n"]), int(r["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """Map every node appearing in ``pairs`` to its component id (the
    minimum node id in the component). Returns (node, component).

    At 10^12 docs: each round shuffles only the current edge set (which
    shrinks toward one edge per non-root node), partitioned by node id;
    components of near-dup graphs are small, so the edge set after the
    first large_star is already near-final and rounds are cheap.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = _sym(edges).select(F.col("a").alias("node")).distinct()

    prev = None
    for _ in range(max_rounds):
        ls, h1 = _large_star(edges)
        ss, h2 = _small_star(ls)
        # eager checkpoint materializes the round; the two neighbor-list
        # caches are then dead — release them (on error paths too) so
        # long runs and retried failures don't accumulate executor
        # storage
        try:
            edges = ss.localCheckpoint(eager=True)
        finally:
            h1.unpersist()
            h2.unpersist()
        fp = _fingerprint(edges)
        if fp == prev:
            break
        prev = fp

    # stars: (child, root); roots have no outgoing edge → map to self
    return nodes.join(
        edges.select(F.col("a").alias("node"), F.col("b").alias("root")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("root", "node").alias("component")
    )


def dedup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Every doc mapped to its dedup group: component root for docs in
    the pair graph, self for singletons. Adds ``is_representative``
    (keep exactly one doc per group — the minimum id, matching the
    component root)."""
    cc = connected_components(pairs)
    return (
        docs.select(F.col(id_col))
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("group_id"),
        )
        .withColumn("is_representative", F.col(id_col) == F.col("group_id"))
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The deduplicated corpus: one representative per near-dup group
    (minimum id), all singletons kept. This is the operator a training
    pipeline actually runs — everything upstream (minhash, LSH,
    verify, components) exists to produce this keep-set."""
    g = dedup_groups(docs, pairs, id_col)
    keep = g.where(F.col("is_representative")).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def dedup_survivors_by(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Quality-aware survivor selection: keep, per near-dup group, the
    member with the HIGHEST ``score_col`` (ties → smallest id), not the
    smallest id. Near-dup groups contain non-identical texts, so which
    member survives matters for corpus quality — longest-text-wins
    (score = n_chars) is the standard heuristic; any per-doc quality
    score (functions/text.py gates) plugs in unchanged.

    Plan: components (large-star/small-star) + one hash agg taking the
    per-group argmax via ``max_by`` over a (score, −id) struct — no
    window, no sort; then a left-semi join back. At 10^12 docs the agg
    input is one row per doc with two longs — the cheap side of the
    dedup pipeline.

    Reference analogue: the reference's snapshots keep the TOP-valued
    entries per key (``stake_top100.py:46-66``) — argmax-per-group is
    the same semantics applied to dedup groups; the selection policy is
    engine-added.
    """
    g = dedup_groups(docs, pairs, id_col)
    scored = docs.select(id_col, score_col).join(
        g.select(id_col, "group_id"), id_col
    )
    rank = F.struct(
        F.col(score_col).alias("s"), (-F.col(id_col)).alias("nid")
    )
    keep = scored.groupBy("group_id").agg(
        F.max_by(F.col(id_col), rank).alias(id_col)
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")


def cluster_size_histogram(groups: DataFrame,
                           group_col: str = "group_id") -> DataFrame:
    """Dedup-audit summary: the distribution of near-dup cluster sizes
    (how much of the corpus is 1-off unique vs collapsed into boiler-
    plate clusters) — the first chart every dedup run is judged by.
    Exact integers per distinct size:

        group_size → n_groups, n_docs (= group_size · n_groups)

    Scale: two map-side-combinable aggs (group → size, size → counts);
    output rows are bounded by the LARGEST cluster size, never corpus
    size. Reference analogue: the reference's per-key summary endpoints
    aggregate snapshot tables the same two-level way
    (/root/reference/docs/provider_api.adoc)."""
    sizes = groups.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return (
        sizes.groupBy("group_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            F.col("group_size").cast("long").alias("group_size"),
            F.col("n_groups").cast("long").alias("n_groups"),
            (F.col("group_size") * F.col("n_groups")).cast("long")
            .alias("n_docs"),
        )
    )
