"""Connected components (large-star/small-star) vs a pure-Python
union-find oracle, plus the dedup-group/survivor operators."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.components import (
    connected_components,
    dedup_groups,
    dedup_survivors,
)


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: component id = min member
    comp: dict[int, list[int]] = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for root, members in comp.items() for x in members}


def _run(spark, pairs: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_chain_graph(spark):
    # worst case for label propagation: one long path
    pairs = [(i, i + 1) for i in range(60)]
    assert _run(spark, pairs) == _union_find(pairs)


def test_star_and_disjoint_cliques(spark):
    pairs = [(0, i) for i in range(1, 8)]
    pairs += [(100 + i, 100 + j) for i in range(4) for j in range(i + 1, 4)]
    pairs += [(500, 501)]
    assert _run(spark, pairs) == _union_find(pairs)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 80
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(70)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _run(spark, pairs) == _union_find(pairs), f"trial {trial}"


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_dedup_groups_and_survivors(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(10)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (7, 8)], "id_a long, id_b long")
    g = {r["doc_id"]: (r["group_id"], r["is_representative"])
         for r in dedup_groups(docs, pairs).collect()}
    assert g[1] == (1, True) and g[2] == (1, False) and g[5] == (1, False)
    assert g[7] == (7, True) and g[8] == (7, False)
    # singletons keep themselves
    for s in (0, 3, 4, 6, 9):
        assert g[s] == (s, True)
    kept = {r["doc_id"] for r in dedup_survivors(docs, pairs).collect()}
    assert kept == {0, 1, 3, 4, 6, 7, 9}
