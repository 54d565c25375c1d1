"""Byte-pair-encoding tokenizer: corpus training + segmentation.

The real token-counting layer of a pretraining pipeline needs a
TRAINED subword vocabulary, not just the whitespace/regex estimates in
``functions/text.py``. This module implements classic BPE (Sennrich et
al., *Neural Machine Translation of Rare Words with Subword Units*,
ACL'16) with the standard scale split:

- **corpus-scale work is ONE aggregation**: the word-frequency table
  (``groupBy`` lowercased whitespace tokens → counts). At 10^12 docs
  this is a single map-side-combined shuffle; the result is truncated
  to the top ``max_words`` types (Zipf: a few 10^5 types cover ~all
  token mass — the same bounded-sample protocol as PQ/IVF training).
- **the merge loop is driver-side** over that bounded dict — the
  textbook algorithm, deterministic (ties broken by lexicographic
  pair order), O(n_merges · |vocab| · avg_word_len).
- **segmentation broadcasts the merge ranks** back into an Arrow-batch
  pandas hop that encodes each UNIQUE word once per batch (memoized)
  and re-expands counts — no per-token Python in the common case,
  since batches of web text repeat words heavily.

Exactness contract: BPE output is deterministic but not
SQL-expressible (iterative greedy merges), so there is no DuckDB
oracle pairing; tests/test_bpe.py pins the hand-computable Sennrich
example, determinism across partitionings, monotone compression in
merge count, and lossless word round-trip.

Reference analogue: none — engine-added LLM-data capability (same
family as the dedup/quality/sampling operators the survey mandates).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_frequency_df(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 200_000,
) -> DataFrame:
    """Bounded word-frequency table as a plan: top ``max_words`` (by
    count, then word — a deterministic boundary, so the truncation is
    engine-independent) lowercased whitespace types with count >=
    ``min_freq``. The ONLY corpus-scale job in BPE training; oracle-
    paired as ``bpe_word_freq_documents``."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+", -1)).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_freq)
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
    )


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 200_000,
) -> list[tuple[str, int]]:
    """Collected form of :func:`word_frequency_df` (driver-side data is
    capped at ``max_words`` rows regardless of corpus size)."""
    return [
        (r["w"], int(r["c"]))
        for r in word_frequency_df(docs, text_col, min_freq, max_words).collect()
    ]


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(sym)
    ab = pair[0] + pair[1]
    while i < n:
        if i + 1 < n and sym[i] == pair[0] and sym[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train_from_counts(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over the bounded word/count dict —
    deterministic: highest pair count wins, ties by lexicographically
    smallest pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in counts:
        sym = tuple(w) + (END,)
        vocab[sym] = vocab.get(sym, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        # distinct words stay distinct under merging (the concatenation
        # of a word's symbols is always word+END), so a plain rebuild
        # cannot collide keys
        vocab = {_merge_word(sym, best): c for sym, c in vocab.items()}
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with trained merge ranks (lowest rank first) —
    the exact greedy order training used."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_train(
    docs: DataFrame,
    n_merges: int = 512,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """One corpus aggregation + driver merge loop → ordered merge list."""
    return bpe_train_from_counts(
        word_frequencies(docs, text_col, min_freq, max_words), n_merges
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens): trained-subword token counts per
    doc. Merge ranks ride the closure (KB–MB scale = broadcast state);
    each Arrow batch segments every UNIQUE word once (memoized dict)
    and sums counts vectorized."""
    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def n_toks(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(bpe_segment(word, ranks))
                cache[word] = n
            return n

        for pdf in batches:
            words = pdf[text_col].str.lower().str.split()
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_words": words.str.len().fillna(0).astype("int64"),
                    "n_bpe_tokens": [
                        sum(n_toks(w) for w in ws) if isinstance(ws, list) else 0
                        for ws in words
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, n_words long, n_bpe_tokens long"
    )


def bpe_vocab(merges: list[tuple[str, str]], counts: list[tuple[str, int]]) -> list[str]:
    """Deterministic id→symbol table: base symbols (all characters seen
    in the word list, sorted, plus ``</w>``) followed by one merged
    symbol per merge in learned order — the standard BPE vocab layout,
    so ids are stable across retrains that only APPEND merges."""
    base = sorted({ch for w, _ in counts for ch in w})
    vocab = base + [END]
    seen = set(vocab)
    for a, b in merges:
        sym = a + b
        if sym not in seen:
            vocab.append(sym)
            seen.add(sym)
    return vocab


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    unk_id: int = -1,
) -> DataFrame:
    """(id, token_ids array<int>): the materialized training-token
    stream — ``pack_chunks`` consumes its lengths, shard writers
    consume the arrays. Same broadcast-rank + per-unique-word
    memoization as :func:`bpe_token_counts`; symbols outside the vocab
    (unseen characters) map to ``unk_id``."""
    ranks = {p: i for i, p in enumerate(merges)}
    vid = {s: i for i, s in enumerate(vocab)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[int]] = {}

        def ids(word: str) -> list[int]:
            out = cache.get(word)
            if out is None:
                out = [vid.get(s, unk_id) for s in bpe_segment(word, ranks)]
                cache[word] = out
            return out

        for pdf in batches:
            words = pdf[text_col].str.lower().str.split()
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "token_ids": [
                        [i for w in ws for i in ids(w)] if isinstance(ws, list) else []
                        for ws in words
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, token_ids array<int>"
    )
