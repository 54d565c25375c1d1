"""Incremental LSH dedup: probing a stored band table with a new batch
finds exactly the full-corpus pairs that involve a new doc."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.dedup import (
    band_table,
    incremental_lsh_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)


def _docs(spark):
    base = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i % 7} tail{i % 5} pad{i % 3}")
        for i in range(40)
    ]
    # exact-ish repeats so LSH actually buckets them together
    base += [(100 + i, base[i][1]) for i in range(10)]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_incremental_equals_full_restricted_to_new(spark):
    d = _docs(spark)
    old = d.where("doc_id < 100")
    new = d.where("doc_id >= 100")

    full_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(minhash_signatures(d)).collect()
    }
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    expected = {p for p in full_pairs if p[0] in new_ids or p[1] in new_ids}

    corpus_bands = band_table(minhash_signatures(old))
    # default include_new_new=True: new-vs-old AND new-vs-new in one call
    inc = incremental_lsh_pairs(minhash_signatures(new), corpus_bands)
    got = {(r["id_a"], r["id_b"]) for r in inc.collect()}
    assert got == expected
    assert len(expected) > 0  # the fixture actually collides


def test_probe_after_upsert_dedupes_new_new(spark):
    d = _docs(spark)
    new = d.where("doc_id >= 100")
    # corpus already contains the new batch (upsert-then-probe shape)
    corpus_bands = band_table(minhash_signatures(d))
    inc = incremental_lsh_pairs(minhash_signatures(new), corpus_bands)
    rows = inc.collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})  # no dupes
    # never an old-old pair
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert all(r["id_a"] in new_ids or r["id_b"] in new_ids for r in rows)


def test_incremental_span_counts_match_batch(spark, tmp_path):
    """Two committed batches + incremental stats on the second must
    equal the from-scratch stats over the union (restricted to batch-2
    docs); compaction preserves the merged counts."""
    from chainalytic_framework_spark.operators.dedup import (
        commit_span_counts,
        compact_span_counts,
        dup_span_stats,
        dup_span_stats_incremental,
        merged_span_counts,
    )
    from chainalytic_framework_spark.tables import TableStore

    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    b1 = spark.createDataFrame(
        [(1, boiler + " one unique tail here ok fine yes"),
         (2, "completely different words in this one document here")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "prefix tokens " + boiler),
         (4, "nothing shared with anything else at all here now")],
        "doc_id long, text string",
    )
    store = TableStore(spark, str(tmp_path / "wh"))
    commit_span_counts(b1, store, w=8)
    commit_span_counts(b2, store, w=8)

    inc = {r["doc_id"]: r for r in
           dup_span_stats_incremental(b2, store, w=8).collect()}
    full = {r["doc_id"]: r for r in
            dup_span_stats(b1.unionByName(b2), w=8).collect()}
    for d in (3, 4):
        assert (inc[d]["n_spans"], inc[d]["n_dup_spans"]) == (
            full[d]["n_spans"], full[d]["n_dup_spans"])
    assert inc[3]["n_dup_spans"] > 0 and inc[4]["n_dup_spans"] == 0

    before = {(r["h"], r["c"]) for r in merged_span_counts(store).collect()}
    compact_span_counts(store)
    after = {(r["h"], r["c"]) for r in merged_span_counts(store).collect()}
    assert before == after
    inc2 = {r["doc_id"]: r for r in
            dup_span_stats_incremental(b2, store, w=8).collect()}
    assert {d: (r["n_spans"], r["n_dup_spans"]) for d, r in inc.items()} == \
           {d: (r["n_spans"], r["n_dup_spans"]) for d, r in inc2.items()}
