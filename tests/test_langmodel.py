"""Char-n-gram language classifier (operators/langmodel.py): holdout
accuracy on a synthetic multi-language corpus with distinct character
statistics, trigram extraction edges, determinism."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.langmodel import (
    char_trigram_counts,
    classify,
    train_profiles,
)

# three fake languages with disjoint-ish character inventories and
# different word shapes — what distinguishes real scripts/languages
ALPHABETS = {
    "aa": "etaoinshr",        # latin-ish
    "bb": "klmpuvwxy",        # different letter mass
    "cc": "0123456789",       # digit-heavy (code/table pages)
}


def _word(rng, lang):
    a = ALPHABETS[lang]
    return "".join(rng.choice(a) for _ in range(rng.randrange(3, 8)))


def _doc(rng, lang):
    return " ".join(_word(rng, lang) for _ in range(rng.randrange(20, 40)))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(13)
    rows = [
        (i, lang, _doc(rng, lang))
        for i, lang in enumerate(
            lang for lang in ALPHABETS for _ in range(60)
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string").cache()


def test_trigram_extraction_edges(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "ab"), (3, "AbC")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["gram"]): r["tf"] for r in char_trigram_counts(df).collect()}
    assert got == {(1, "abc"): 1, (1, "bcd"): 1, (3, "abc"): 1}  # doc 2 too short


def test_holdout_accuracy(corpus):
    train = corpus.where(F.col("doc_id") % 5 != 0)
    test = corpus.where(F.col("doc_id") % 5 == 0)
    profiles = train_profiles(train, k=200)
    pred = classify(test.drop("lang"), profiles)
    n = test.count()
    hits = (
        pred.join(test.select("doc_id", "lang"), "doc_id")
        .where(F.col("lang_pred") == F.col("lang"))
        .count()
    )
    assert hits / n > 0.95, (hits, n)


def test_profiles_bounded(corpus):
    profiles = train_profiles(corpus, k=50)
    sizes = {r["lang"]: r["c"] for r in
             profiles.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(sizes) == set(ALPHABETS)
    assert all(c <= 50 for c in sizes.values())


def test_classify_deterministic(corpus):
    profiles = train_profiles(corpus, k=100)
    a = classify(corpus.drop("lang"), profiles).select("doc_id", "lang_pred")
    b = classify(corpus.drop("lang").repartition(7), profiles).select(
        "doc_id", "lang_pred"
    )
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_no_shared_grams_gives_null(spark, corpus):
    profiles = train_profiles(corpus, k=100)
    alien = spark.createDataFrame([(999, "ZZZZQQ!!")], "doc_id long, text string")
    got = classify(alien, profiles).first()
    assert got["lang_pred"] is None
