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
