"""End-to-end training-data pipeline: the full LLM-data story wired
through the engine's own operators — exact-substring dedup → near-dup
survivor selection → quality gate → BPE tokenization → sequence
packing — with global invariants asserted at the end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


SEQ_LEN = 128


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    boiler = " ".join(vocab[i] for i in (1, 2, 3, 4, 5, 6, 7, 8))
    rows = []
    for i in range(120):
        body = " ".join(rng.choice(vocab, size=int(rng.integers(20, 80))))
        if i % 10 == 0:
            body = boiler + " " + body  # shared boilerplate to strip
        rows.append((i, body))
    # exact near-dups: 115 duplicates 114's text
    rows[115] = (115, rows[114][1])
    # junk doc the quality gate must drop (hyper-repetitive)
    rows[116] = (116, "spam " * 60)
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_full_training_data_pipeline(spark, corpus):
    from chainalytic_framework_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
        word_frequencies,
    )
    from chainalytic_framework_spark.operators.components import dedup_survivors
    from chainalytic_framework_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        strip_dup_spans,
    )
    from chainalytic_framework_spark.operators.packing import pack_chunks
    from chainalytic_framework_spark.functions.text import token_repetition

    # 1. DOCUMENT-level near-dup survivors FIRST (order matters: span
    # stripping would hollow out exact duplicates symmetrically and
    # leave nothing for MinHash to pair — doc dedup, then substrings,
    # is the Lee-et-al. ordering)
    sigs = minhash_signatures(corpus)
    cand = lsh_candidate_pairs(sigs)
    pairs = (
        ngram_jaccard_pairs(corpus, cand, "text", "doc_id")
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b")
    )
    kept = dedup_survivors(corpus, pairs, "doc_id").cache()
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 114 in ids and 115 not in ids  # min-id representative survives

    # 2. exact-substring dedup: strip shared boilerplate spans
    stripped = strip_dup_spans(kept, w=8).select("doc_id", "text").cache()
    assert "w1 w2 w3 w4 w5 w6 w7 w8" not in " ".join(
        r["text"] for r in stripped.where(F.col("doc_id") % 10 == 0).collect()
    )
    kept = stripped

    # 3. quality gate: drop hyper-repetitive junk
    rep = token_repetition(kept)
    good_ids = rep.where(
        (F.col("n_tokens") >= 10) & (F.col("dup_token_frac_x1e4") <= 6000)
    ).select("doc_id")
    curated = kept.join(good_ids, "doc_id", "left_semi").cache()
    cids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert 116 not in cids and len(cids) > 80

    # 4. tokenizer training on the CURATED corpus + id encoding
    counts = word_frequencies(curated, max_words=5000)
    merges = bpe_train(curated, n_merges=64, max_words=5000)
    vocab = bpe_vocab(merges, counts)
    toks = bpe_encode_ids(curated, merges, vocab).cache()
    n_unk = toks.select(
        F.sum(F.size(F.filter(F.col("token_ids"), lambda x: x < 0))).alias("u")
    ).first()["u"]
    assert n_unk == 0  # trained on its own corpus: no unknown symbols

    # 5. sequence packing over the token stream
    lengths = toks.select("doc_id", F.size("token_ids").alias("n_tokens"))
    packed = pack_chunks(lengths, SEQ_LEN).cache()
    rows = packed.orderBy("doc_id").collect()
    assert {r["doc_id"] for r in rows} == cids
    run = 0
    for r in rows:  # offsets tile the stream exactly, in doc_id order
        assert r["start_off"] == run
        run += r["n_tokens"]
    total_tokens = run
    n_chunks = -(-total_tokens // SEQ_LEN)
    assert max(r["first_chunk"] + r["n_chunks"] for r in rows) == n_chunks

    # determinism: the whole pipeline reproduces byte-for-byte
    merges2 = bpe_train(curated.repartition(7), n_merges=64, max_words=5000)
    assert merges2 == merges
