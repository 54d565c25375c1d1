"""Cohort matrix (operators/cohorts.py) and unigram surprisal
(functions/text.py): hand-computed semantics."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chainalytic_framework_spark.functions.text import unigram_surprisal
from chainalytic_framework_spark.operators.cohorts import cohort_matrix


def test_cohort_matrix_hand_case(spark):
    # periods: u1 active 0,1,2; u2 active 0,2; u3 active 1; u4 active 1,2
    rows = [("u1", 0), ("u1", 1), ("u1", 2), ("u2", 0), ("u2", 2),
            ("u3", 1), ("u4", 1), ("u4", 2), ("u1", 2)]  # dup row collapses
    df = spark.createDataFrame(rows, "k string, p long")
    out = {
        (r["cohort"], r["age"]): (r["n_active"], r["n_cohort"], r["retained_x1e4"])
        for r in cohort_matrix(df, "k", F.col("p")).collect()
    }
    # cohort 0 = {u1,u2}; cohort 1 = {u3,u4}
    assert out[(0, 0)] == (2, 2, 10000)
    assert out[(0, 1)] == (1, 2, 5000)    # only u1 at age 1
    assert out[(0, 2)] == (2, 2, 10000)   # u1,u2 both back at age 2
    assert out[(1, 0)] == (2, 2, 10000)
    assert out[(1, 1)] == (1, 2, 5000)    # u4 only (u3 churned)
    assert len(out) == 5


def test_cohort_age0_full(spark):
    rows = [(f"u{i}", 3 + (i % 2)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, p long")
    for r in cohort_matrix(df, "k", F.col("p")).where(F.col("age") == 0).collect():
        assert r["n_active"] == r["n_cohort"] and r["retained_x1e4"] == 10000


def test_unigram_surprisal_hand_case(spark):
    # corpus: "a a a b" + "b c" -> N=6, cf: a=3,b=2,c=1
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_surprisal(docs).collect()}
    sa = round(math.log(6 / 3) * 10000)
    sb = round(math.log(6 / 2) * 10000)
    sc = round(math.log(6 / 1) * 10000)
    assert out[1]["n_tokens"] == 4
    assert out[1]["surprisal_x1e4"] == (3 * sa + 1 * sb) // 4
    assert out[2]["n_tokens"] == 2
    assert out[2]["surprisal_x1e4"] == (sb + sc) // 2
    # the rare-token doc must score strictly higher
    assert out[2]["surprisal_x1e4"] > out[1]["surprisal_x1e4"]


def test_cohort_matrix_from_fold_parity(spark, pages):
    """The fold-state-sourced cohort matrix (scale form, VERDICT r2
    item 9) must equal the raw-scan form over full-history activity:
    fold is_new rows ARE the min-period first-seen."""
    from chainalytic_framework_spark.operators.cohorts import cohort_matrix_from_fold
    from chainalytic_framework_spark.operators.fold import (
        fold_observations,
        prepare_observations,
    )

    day = (F.col("warc_ts").cast("timestamp").cast("long") / 86400).cast("long")
    fold = fold_observations(prepare_observations(pages)).cache()
    got = {
        (r["cohort"], r["age"]): (r["n_active"], r["n_cohort"], r["retained_x1e4"])
        for r in cohort_matrix_from_fold(
            pages, fold, "url", day, fold_key_col="url"
        ).collect()
    }
    exp = {
        (r["cohort"], r["age"]): (r["n_active"], r["n_cohort"], r["retained_x1e4"])
        for r in cohort_matrix(pages, "url", day).collect()
    }
    assert len(got) > 3
    assert got == exp


def test_cohort_matrix_from_fold_windowed_activity_keeps_true_cohort(spark):
    """With activity restricted to a window, the fold form keeps the TRUE
    (global) cohort assignment — the raw-scan form over the window would
    misclassify old keys as new."""
    from chainalytic_framework_spark.operators.cohorts import cohort_matrix_from_fold

    fold = spark.createDataFrame(
        [("u1", 0, True), ("u2", 5, True)], "url string, p long, is_new boolean"
    )
    act = spark.createDataFrame([("u1", 5), ("u2", 5)], "k string, p long")
    out = {
        (r["cohort"], r["age"]): r["n_active"]
        for r in cohort_matrix_from_fold(
            act, fold, "k", F.col("p"), fold_key_col="url",
            fold_first_period=F.col("p"),
        ).collect()
    }
    # u1's activity at p=5 lands in cohort 0 at age 5, not a new cohort
    assert out == {(0, 5): 1, (5, 0): 1}


def test_ngram_counts_hand_case(spark):
    """Multiset bigram counts, per-group top-k with total order."""
    from chainalytic_framework_spark.functions.text import ngram_counts

    docs = spark.createDataFrame(
        [("en", "a b a b c"), ("en", "a b x"), ("fr", "z z z"), ("fr", "q")],
        "lang string, text string",
    )
    got = {(r["lang"], r["ngram"]): r["c"]
           for r in ngram_counts(docs, n=2, group_cols=("lang",)).collect()}
    assert got == {("en", "a b"): 3, ("en", "b a"): 1, ("en", "b c"): 1,
                   ("en", "b x"): 1, ("fr", "z z"): 2}

    top = [(r["lang"], r["ngram"], r["c"])
           for r in ngram_counts(docs, n=2, group_cols=("lang",), top_k=2)
           .orderBy("lang", F.desc("c"), "ngram").collect()]
    # ties broken by gram text ascending -> deterministic
    assert top == [("en", "a b", 3), ("en", "b a", 1), ("fr", "z z", 2)]


def test_bigram_surprisal_hand_case(spark):
    """Interpolated bigram surprisal vs a direct python computation."""
    import math

    from chainalytic_framework_spark.functions.text import bigram_surprisal

    docs = [(1, "a b a b"), (2, "a b c"), (3, "x")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["bi_surprisal_x1e4"])
           for r in bigram_surprisal(df).collect()}

    from collections import Counter
    occ = []
    for d, t in docs:
        toks = t.split(" ")
        occ += [(d, " ".join(toks[i:i + 2])) for i in range(len(toks) - 1)]
    c_bi = Counter(bg for _, bg in occ)
    c_ctx = Counter()
    c_w2 = Counter()
    for bg, n in c_bi.items():
        w1, w2 = bg.split(" ")[0], bg.split(" ")[-1]
        c_ctx[w1] += n
        c_w2[w2] += n
    N = sum(c_bi.values())
    surp = {bg: round(-math.log(0.75 * n / c_ctx[bg.split(" ")[0]]
                                + 0.25 * c_w2[bg.split(" ")[-1]] / N) * 10000)
            for bg, n in c_bi.items()}
    exp = {}
    for d, _ in docs:
        mine = [surp[bg] for dd, bg in occ if dd == d]
        if mine:
            exp[d] = (len(mine), math.floor(sum(mine) / len(mine)))
    assert got == exp and 3 not in got


# --- new_vs_returning --------------------------------------------------------


def test_new_vs_returning_hand_case(spark):
    from chainalytic_framework_spark.operators.cohorts import new_vs_returning

    rows = [
        (0, "u1"), (0, "u2"),            # day 0: both new
        (86400, "u1"), (86400, "u3"),    # day 1: u1 returns, u3 new
        (172800, "u1"), (172800, "u1"),  # day 2: duplicate events, 1 active
    ]
    ev = spark.createDataFrame(rows, ["bucket_epoch", "user_id"])
    out = {r.bucket_epoch: r for r in
           new_vs_returning(ev, "user_id", "bucket_epoch").collect()}
    assert (out[0].n_active, out[0].n_new, out[0].n_returning,
            out[0].cum_unique) == (2, 2, 0, 2)
    assert (out[86400].n_active, out[86400].n_new,
            out[86400].n_returning, out[86400].cum_unique) == (2, 1, 1, 3)
    assert (out[172800].n_active, out[172800].n_new,
            out[172800].n_returning, out[172800].cum_unique) == (1, 0, 1, 3)


def test_new_vs_returning_invariants(spark):
    import numpy as np

    from chainalytic_framework_spark.operators.cohorts import new_vs_returning

    rng = np.random.default_rng(13)
    rows = [(int(d) * 3600, f"u{int(u)}")
            for d, u in zip(rng.integers(0, 20, 500),
                            rng.integers(0, 40, 500))]
    ev = spark.createDataFrame(rows, ["bucket_epoch", "user_id"])
    out = new_vs_returning(ev, "user_id", "bucket_epoch").orderBy(
        "bucket_epoch").collect()
    total_unique = len({u for _, u in rows})
    assert out[-1].cum_unique == total_unique
    assert sum(r.n_new for r in out) == total_unique
    cum = 0
    for r in out:
        assert r.n_active == r.n_new + r.n_returning
        cum += r.n_new
        assert r.cum_unique == cum


def test_new_vs_returning_ignores_null_entities(spark):
    from chainalytic_framework_spark.operators.cohorts import new_vs_returning

    rows = [(0, "u1"), (0, None), (86400, None), (86400, "u1")]
    df = spark.createDataFrame(rows, "bucket_epoch long, uid string")
    out = {r["bucket_epoch"]: r
           for r in new_vs_returning(df, "uid", "bucket_epoch").collect()}
    # NULL is not an entity: day0 has 1 new, day1 has 1 returning
    assert out[0]["n_active"] == 1 and out[0]["n_new"] == 1
    assert out[86400]["n_active"] == 1 and out[86400]["n_new"] == 0
    assert out[86400]["n_returning"] == 1 and out[86400]["cum_unique"] == 1
