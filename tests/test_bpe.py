"""BPE trainer/segmenter (operators/bpe.py): Sennrich hand case,
determinism, monotone compression, lossless round-trip."""

from __future__ import annotations

import pytest

from chainalytic_framework_spark.operators.bpe import (
    END,
    bpe_segment,
    bpe_token_counts,
    bpe_train,
    bpe_train_from_counts,
    word_frequencies,
)


def test_sennrich_hand_case():
    """The ACL'16 example: {low:5, lower:2, newest:6, widest:3}.
    First merges are driven by 'est</w>' mass: (e,s)=9, (s,t)=9,
    (t,</w>)=9 — tie broken lexicographically -> ('e','s') first, then
    ('es','t'), then ('est','</w>')."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_from_counts(counts, 5)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    # after est</w> fuses: (l,o) has 5+2=7 — the next heaviest
    assert merges[3] == ("l", "o")
    ranks = {p: i for i, p in enumerate(merges)}
    assert merges[4] == ("lo", "w")
    assert bpe_segment("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe_segment("lowest", ranks) == ["low", "est</w>"]


def test_segment_roundtrip_property():
    counts = [("hello", 3), ("help", 2), ("hold", 4), ("cold", 1)]
    merges = bpe_train_from_counts(counts, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("hello", "help", "hold", "cold", "heck", "unseen"):
        segs = bpe_segment(w, ranks)
        joined = "".join(segs)
        assert joined == w + END or joined == w  # END only if reached
        assert joined.replace(END, "") == w


def test_train_on_spark_corpus_deterministic(spark, pages):
    docs = pages.selectExpr("xxhash64(url) as doc_id", "text").limit(500).cache()
    m1 = bpe_train(docs, n_merges=40, max_words=2000)
    m2 = bpe_train(docs.repartition(7), n_merges=40, max_words=2000)
    assert m1 == m2 and len(m1) == 40


def test_more_merges_compress_monotonically(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 3)
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prev = None
    for n in (0, 8, 32, 128):
        merges = bpe_train(docs, n_merges=n, max_words=1000)
        total = (
            bpe_token_counts(docs, merges)
            .agg({"n_bpe_tokens": "sum"})
            .first()[0]
        )
        if prev is not None:
            assert total <= prev
        prev = total
    # with many merges every word fuses to ~1 token
    n_words = (
        bpe_token_counts(docs, bpe_train(docs, 128, max_words=1000))
        .agg({"n_words": "sum"}).first()[0]
    )
    assert prev <= n_words * 1.2


def test_word_frequencies_bounded_and_ordered(spark, pages):
    wf = word_frequencies(pages.select("text").limit(300), max_words=50)
    assert len(wf) == 50
    counts = [c for _, c in wf]
    assert counts == sorted(counts, reverse=True)


def test_vocab_and_encode_ids_roundtrip(spark):
    from chainalytic_framework_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train_from_counts,
        bpe_vocab,
    )

    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_from_counts(counts, 8)
    vocab = bpe_vocab(merges, counts)
    assert vocab[: len(set("lowernewstid"))] == sorted(set("lowernewstid"))
    assert END in vocab and len(vocab) == len(set(vocab))

    docs = spark.createDataFrame(
        [(1, "low lowest"), (2, "newest zebra"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: list(r["token_ids"])
           for r in bpe_encode_ids(docs, merges, vocab).collect()}
    # ids decode back to the exact lowercased words (END markers included)
    def decode(ids):
        return "".join(vocab[i] for i in ids if i >= 0).replace(END, " ").strip()

    assert decode(out[1]) == "low lowest"
    # 'z', 'b', 'a', 'r' are unseen base chars -> unk ids (-1)
    assert -1 in out[2]
    assert decode(out[2]).startswith("newest")
    assert out[3] == []
