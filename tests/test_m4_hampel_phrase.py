"""Round-5 final operators: M4 pixel-bucket downsample, Hampel
rolling-median despike, positional-index exact-phrase search."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.index import (
    build_positional_index,
    phrase_search_indexed,
)
from chainalytic_framework_spark.operators.lttb import m4_downsample
from chainalytic_framework_spark.operators.rolling import hampel_despike


# ---------------------------------------------------------------- M4 ------


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, v long, id long")


def test_m4_keeps_first_last_min_max(spark):
    rows = [
        ("a", 100, 5, 1),
        ("a", 110, 50, 2),  # max
        ("a", 120, -7, 3),  # min
        ("a", 130, 9, 4),
    ]
    out = m4_downsample(_series(spark, rows), ["k"], "t", "v", 1000, "id")
    pts = sorted((r["t"], r["v"]) for r in out.collect())
    assert pts == [(100, 5), (110, 50), (120, -7), (130, 9)]
    assert out.select("n_in").distinct().collect()[0][0] == 4


def test_m4_collapses_duplicate_extremes(spark):
    # single point: first == last == min == max -> ONE output row
    out = m4_downsample(
        _series(spark, [("a", 100, 5, 1)]), ["k"], "t", "v", 1000, "id"
    ).collect()
    assert len(out) == 1 and (out[0]["t"], out[0]["v"]) == (100, 5)
    # monotone ramp: first==min, last==max -> 2 rows
    rows = [("a", 100 + i, i, i) for i in range(5)]
    out = m4_downsample(_series(spark, rows), ["k"], "t", "v", 1000, "id")
    assert out.count() == 2


def test_m4_buckets_and_keys_are_independent(spark):
    rows = [("a", b * 1000 + i, (b * 17 + i * 3) % 11, b * 10 + i)
            for b in range(3) for i in range(6)] + [("z", 50, 1, 999)]
    out = m4_downsample(_series(spark, rows), ["k"], "t", "v", 1000, "id")
    got = out.groupBy("k", "bucket_epoch").count().collect()
    assert {r["k"] for r in got} == {"a", "z"}
    assert all(1 <= r["count"] <= 4 for r in got)
    # every emitted point exists in the input
    inp = {(r[0], r[1], r[2]) for r in rows}
    for r in out.collect():
        assert (r["k"], r["t"], r["v"]) in inp


def test_m4_tie_break_deterministic_across_partitionings(spark):
    # identical (t, v) ties resolved by id; repartition must not change
    # the value-level output
    rows = [("a", 100, 7, i) for i in range(4)] + [("a", 101, 7, 9)]
    df1 = _series(spark, rows).repartition(1)
    df8 = _series(spark, rows).repartition(8)
    r1 = sorted(map(tuple, m4_downsample(df1, ["k"], "t", "v", 50, "id").collect()))
    r8 = sorted(map(tuple, m4_downsample(df8, ["k"], "t", "v", 50, "id").collect()))
    assert r1 == r8


# ------------------------------------------------------------ Hampel ------


def _hseries(spark, vals, key="s"):
    rows = [(key, i, i, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, t long, id long, v long")


def test_hampel_flags_and_replaces_local_spike(spark):
    vals = [10, 11, 10, 500, 11, 10, 11, 10, 9]
    out = (
        hampel_despike(_hseries(spark, vals), ["k"], "t", "id", "v",
                       half_width=3, k=4)
        .orderBy("t")
        .collect()
    )
    spikes = [r["t"] for r in out if r["is_spike"]]
    assert spikes == [3]
    r = out[3]
    # replaced by the window median (x2 scale); neighbors untouched
    assert r["clean_cents_x2"] == r["med_cents_x2"]
    assert all(out[i]["clean_cents_x2"] == 2 * vals[i] for i in range(len(vals))
               if i != 3)


def test_hampel_catches_spike_inside_trend_where_global_mad_would_not(spark):
    # steep ramp 0..90 with one local spike; global median/MAD of the ramp
    # is wide, the local window is tight
    vals = [i * 10 for i in range(10)]
    vals[5] = 5000
    out = hampel_despike(_hseries(spark, vals), ["k"], "t", "id", "v",
                         half_width=2, k=6).collect()
    assert [r["t"] for r in out if r["is_spike"]] == [5]


def test_hampel_constant_series_mad_zero_flags_only_deviants(spark):
    vals = [7] * 9
    vals[4] = 8  # any deviation from a constant window is a spike (mad=0)
    out = hampel_despike(_hseries(spark, vals), ["k"], "t", "id", "v").collect()
    assert [r["t"] for r in out if r["is_spike"]] == [4]
    assert all(r["clean_cents_x2"] == 14 for r in out)


def test_hampel_window_clamps_at_edges(spark):
    out = (
        hampel_despike(_hseries(spark, [1, 2, 3, 4, 5]), ["k"], "t", "id", "v",
                       half_width=3)
        .orderBy("t")
        .collect()
    )
    assert [r["n_win"] for r in out] == [4, 5, 5, 5, 4]


def test_hampel_keys_isolated_and_partition_invariant(spark):
    rows = [("a", i, i, 10) for i in range(6)] + [("b", i, 100 + i, 1000)
                                                  for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t long, id long, v long")
    out1 = sorted(map(tuple,
                      hampel_despike(df.repartition(1), ["k"], "t", "id", "v")
                      .collect()))
    out8 = sorted(map(tuple,
                      hampel_despike(df.repartition(8), ["k"], "t", "id", "v")
                      .collect()))
    assert out1 == out8
    assert not any(r[7] for r in out1)  # no cross-key contamination spikes


# ------------------------------------------------------------ Phrase ------


def _docs(spark):
    rows = [
        (1, "big table hash join wins"),
        (2, "the table hash table hash trick"),
        (3, "hash table inverted order"),          # reversed -> no match
        (4, "table  hash"),                         # double space, still adjacent tokens
        (5, "slow hash batch pipeline slow hash batch"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_search_bigram(spark):
    idx = build_positional_index(_docs(spark), n_shards=4)
    out = {r["doc_id"]: r for r in phrase_search_indexed(idx, "table hash").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_occurrences"] == 1 and out[1]["first_pos"] == 1
    assert out[2]["n_occurrences"] == 2 and out[2]["first_pos"] == 1


def test_phrase_search_double_space_not_adjacent(spark):
    idx = build_positional_index(_docs(spark), n_shards=4)
    out = {r["doc_id"] for r in phrase_search_indexed(idx, "table hash").collect()}
    # doc 4 has 'table<space><space>hash': original positions 0 and 2 ->
    # not consecutive, must NOT match
    assert 4 not in out


def test_phrase_search_trigram_and_multiple_occurrences(spark):
    idx = build_positional_index(_docs(spark), n_shards=4)
    out = phrase_search_indexed(idx, "slow hash batch").collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 5
    assert out[0]["n_occurrences"] == 2 and out[0]["first_pos"] == 0


def test_phrase_search_absent_term_returns_empty(spark):
    idx = build_positional_index(_docs(spark), n_shards=4)
    assert phrase_search_indexed(idx, "missing token").count() == 0


def test_phrase_search_repeated_term_phrase(spark):
    docs = spark.createDataFrame(
        [(1, "go go go stop"), (2, "go stop go")], "doc_id long, text string"
    )
    idx = build_positional_index(docs, n_shards=2)
    out = {r["doc_id"]: r for r in phrase_search_indexed(idx, "go go").collect()}
    assert set(out) == {1}
    assert out[1]["n_occurrences"] == 2 and out[1]["first_pos"] == 0


def test_positional_index_sharding_bounds_rows(spark):
    docs = spark.createDataFrame(
        [(i, "common word") for i in range(40)], "doc_id long, text string"
    )
    idx = build_positional_index(docs, n_shards=8)
    rows = idx.where(F.col("term") == "common").collect()
    assert len(rows) == 8  # stopword split across all shards
    assert all(r["doc_freq"] == 5 for r in rows)
    # postings sorted within shard
    for r in rows:
        ids = [p["doc_id"] for p in r["postings"]]
        assert ids == sorted(ids)


# ----------------------------------------------------- edit distance ------


def _ed(spark, docs_rows, pair_rows):
    from chainalytic_framework_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    pairs = spark.createDataFrame(pair_rows, "id_a long, id_b long")
    return {(r["id_a"], r["id_b"]): r
            for r in edit_distance_pairs(docs, pairs).collect()}


def test_edit_distance_known_values(spark):
    out = _ed(spark,
              [(1, "kitten"), (2, "sitting"), (3, "kitten")],
              [(1, 2), (1, 3)])
    assert out[(1, 2)]["edit_distance"] == 3
    assert out[(1, 2)]["len_a"] == 6 and out[(1, 2)]["len_b"] == 7
    assert out[(1, 2)]["sim_x1e4"] == ((7 - 3) * 10000) // 7
    assert out[(1, 3)]["edit_distance"] == 0
    assert out[(1, 3)]["sim_x1e4"] == 10000


def test_edit_distance_empty_texts_are_identical(spark):
    out = _ed(spark, [(1, ""), (2, ""), (3, "abc")], [(1, 2), (1, 3)])
    assert out[(1, 2)]["edit_distance"] == 0
    assert out[(1, 2)]["sim_x1e4"] == 10000
    assert out[(1, 3)]["edit_distance"] == 3 and out[(1, 3)]["sim_x1e4"] == 0


def test_edit_distance_candidate_bounded(spark):
    # only the supplied pairs are computed — no all-pairs blowup
    docs = [(i, f"doc number {i}") for i in range(10)]
    out = _ed(spark, docs, [(0, 1)])
    assert set(out) == {(0, 1)}


def test_m4_origin_aligns_bucket_grid(spark):
    # range [1000, 1300), width 100: origin=1000 -> exactly 3 buckets;
    # epoch alignment (origin=0) of the same points at offset start
    rows = [("a", 1000 + i * 30, i, i) for i in range(10)]  # t in [1000,1270]
    df = _series(spark, rows)
    out = m4_downsample(df, ["k"], "t", "v", 100, "id", origin=1000)
    buckets = {r["bucket_epoch"] for r in out.collect()}
    assert buckets == {1000, 1100, 1200}
    # origin=50 shifts the grid accordingly
    out2 = m4_downsample(df, ["k"], "t", "v", 100, "id", origin=50)
    assert {r["bucket_epoch"] for r in out2.collect()} == {950, 1050, 1150, 1250}
