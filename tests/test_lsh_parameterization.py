"""MinHash/LSH at production-like widths: the sandbox defaults
(N_HASHES=8, N_BANDS=4) are constants, not assumptions — the operators
must hold at the widths a 10^12-doc deployment runs (more hashes,
wider bands → higher precision candidates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.dedup import (
    band_table,
    lsh_candidate_pairs,
    minhash_signatures,
)


def _docs(spark):
    twin = "the quick brown fox jumps over the lazy dog again and again today"
    near = twin.replace("today", "tomorrow")
    rows = [(1, twin), (2, twin), (3, near)]
    rows += [
        (10 + i, f"completely unrelated document number {i} with words w{i} x{i} y{i} z{i} q{i}")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_wide_signatures_shape_and_determinism(spark):
    d = _docs(spark)
    sigs = minhash_signatures(d, n_hashes=32)
    assert [f"minhash_{i}" for i in range(32)] == [c for c in sigs.columns if c.startswith("minhash_")]
    a = {tuple(r) for r in sigs.collect()}
    b = {tuple(r) for r in minhash_signatures(d.repartition(7), n_hashes=32).collect()}
    assert a == b  # content-hash based: partitioning never changes signatures


def test_wide_bands_find_exact_dups_and_raise_precision(spark):
    d = _docs(spark)
    # production-ish: 32 hashes, 8 bands of 4 rows
    sigs32 = minhash_signatures(d, n_hashes=32)
    pairs_wide = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs32, n_hashes=32, n_bands=8).collect()
    }
    # exact duplicates MUST pair at any width (identical signatures)
    assert (1, 2) in pairs_wide
    # near-duplicate should still collide on at least one 4-row band
    assert (1, 3) in pairs_wide or (2, 3) in pairs_wide
    # unrelated docs: wider bands (4 rows vs 2) can only shrink the
    # false-candidate set relative to the sandbox default
    sigs8 = minhash_signatures(d, n_hashes=8)
    pairs_default = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs8, n_hashes=8, n_bands=4).collect()
    }
    junk_wide = {p for p in pairs_wide if p[0] >= 10 and p[1] >= 10}
    junk_default = {p for p in pairs_default if p[0] >= 10 and p[1] >= 10}
    assert len(junk_wide) <= len(junk_default)


def test_band_table_width_matches(spark):
    d = _docs(spark)
    bt = band_table(minhash_signatures(d, n_hashes=32), n_hashes=32, n_bands=8)
    per_doc = bt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 8 for r in per_doc)
    assert bt.select("band").distinct().count() == 8
