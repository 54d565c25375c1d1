"""Dedup + similarity operator semantics (documents/embeddings testdata)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators import dedup as dd
from chainalytic_framework_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").cache()
    d.count()
    return d


@pytest.fixture(scope="module")
def emb(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    e.count()
    return e


def test_exact_dedup_identity(spark, docs):
    # duplicating the corpus doubles n_dupes but keeps keep_id stable
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    d1 = dd.exact_dedup(docs).orderBy("fingerprint").toPandas()
    d2 = dd.exact_dedup(doubled).orderBy("fingerprint").toPandas()
    assert (d2["n_dupes"] == 2 * d1["n_dupes"]).all()
    assert (d2["keep_id"] == d1["keep_id"]).all()


def test_minhash_identical_docs_identical_sigs(spark, docs):
    a = dd.minhash_signatures(docs)
    b = dd.minhash_signatures(docs.withColumn("doc_id", F.col("doc_id") + 100000))
    j = a.join(b.withColumn("doc_id", F.col("doc_id") - 100000), "doc_id", "inner")
    # join keeps suffixed cols; compare via exceptAll on renamed frames
    assert a.exceptAll(
        b.withColumn("doc_id", F.col("doc_id") - 100000)
    ).count() == 0


def test_minhash_estimates_track_true_jaccard(spark, docs):
    sigs = dd.minhash_signatures(docs)
    pairs = dd.lsh_candidate_pairs(sigs)
    if pairs.count() == 0:
        pytest.skip("no candidate pairs at this sf")
    est = dd.minhash_similarity(sigs, pairs)
    true = dd.ngram_jaccard_pairs(docs, pairs)
    j = est.join(true, ["id_a", "id_b"]).toPandas()
    # LSH candidates (band match = 2 equal minhashes) should skew similar
    assert (abs(j["est_jaccard"] - j["jaccard"]) <= 0.75).all()


def test_simhash_stability_and_range(spark, docs):
    sh = dd.simhash(docs).toPandas()
    assert sh["simhash"].between(0, 2**dd.SIMHASH_BITS - 1).all()
    # identical text ⇒ identical simhash
    sh2 = dd.simhash(docs.withColumn("doc_id", F.col("doc_id") + 7)).toPandas()
    assert set(sh["simhash"]) == set(sh2["simhash"])


def test_ann_subset_of_bucket_and_agrees_with_brute_force(spark, emb):
    planes = sim.projection_planes(64)
    qv = [float(v) for v in emb.where("vec_id = 0").first()["embedding"]]
    bf = sim.brute_force_topk(emb, qv, k=10).toPandas()
    ann = sim.ann_topk(emb, qv, planes, k=10).toPandas()
    # the query's own bucket contains the query itself → top hit matches
    assert ann.iloc[0]["vec_id"] == bf.iloc[0]["vec_id"] == 0
    # every ANN result is a real row with valid cosine
    assert ann["cos_sim"].between(-1.000001, 1.000001).all()


def test_lsh_bucket_determinism(spark, emb):
    planes = sim.projection_planes(64)
    b1 = sim.hyperplane_lsh_buckets(emb, planes).select("vec_id", "bucket")
    b2 = sim.hyperplane_lsh_buckets(emb.repartition(13), planes).select("vec_id", "bucket")
    assert b1.exceptAll(b2).count() == 0


def test_ivf_full_probe_equals_brute_force(spark):
    from chainalytic_framework_spark.operators.similarity import (
        brute_force_topk, ivf_topk, ivf_train,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = e.where("vec_id != 0").cache()
    qvec = [float(v) for v in e.where("vec_id = 0").first()["embedding"]]
    cents = ivf_train(base, n_centroids=8, n_iters=2)
    assert len(cents) == 8 and all(len(c) == len(qvec) for c in cents)
    a = [(r["vec_id"], round(r["cos_sim"], 9))
         for r in ivf_topk(base, qvec, cents, k=20, n_probe=8).collect()]
    b = [(r["vec_id"], round(r["cos_sim"], 9))
         for r in brute_force_topk(base, qvec, k=20).collect()]
    assert a == b


def test_ivf_partial_probe_recall(spark):
    from chainalytic_framework_spark.operators.similarity import (
        brute_force_topk, ivf_topk, ivf_train,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = e.where("vec_id != 0").cache()
    qvec = [float(v) for v in e.where("vec_id = 0").first()["embedding"]]
    cents = ivf_train(base, n_centroids=8, n_iters=2)
    brute = {r["vec_id"] for r in brute_force_topk(base, qvec, k=20).collect()}
    got = {r["vec_id"] for r in ivf_topk(base, qvec, cents, k=20, n_probe=4).collect()}
    recall = len(got & brute) / 20
    assert recall >= 0.5, recall  # measured 0.65 with half the clusters probed


def test_multi_probe_lsh_recall_monotone(spark):
    """Hamming-h multi-probe must monotonically raise recall over
    single-probe (measured 0.15 / 0.50 / 0.70 at h=0/1/2 with 4 planes;
    asserted with margin)."""
    from chainalytic_framework_spark.operators.similarity import (
        ann_topk, brute_force_topk, projection_planes,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = e.where("vec_id != 0").cache()
    qvec = [float(v) for v in e.where("vec_id = 0").first()["embedding"]]
    planes = projection_planes(64, n_planes=4)
    brute = {r["vec_id"] for r in brute_force_topk(base, qvec, k=20).collect()}
    recalls = []
    for h in (0, 1, 2):
        got = {r["vec_id"] for r in ann_topk(base, qvec, planes, k=20, hamming_probe=h).collect()}
        recalls.append(len(got & brute) / 20)
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[1] >= 0.4 and recalls[2] >= 0.6, recalls


def test_wide_plane_lsh_production_width(spark):
    """16-24 hyperplanes is the 10^12-vector deployment width (2^16-2^24
    buckets); the operators must hold there, not just at the sandbox's
    8 planes: bucket ids stay in range, assignment is deterministic
    across partitionings, and multi-probe at h=2 still recovers
    neighbors from the sharper buckets."""
    from chainalytic_framework_spark.operators.similarity import (
        ann_topk, brute_force_topk, hyperplane_lsh_buckets, projection_planes,
    )

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    base = e.where("vec_id != 0").cache()
    qvec = [float(v) for v in e.where("vec_id = 0").first()["embedding"]]
    planes = projection_planes(64, n_planes=24)
    b = hyperplane_lsh_buckets(base, planes)
    lo, hi = b.agg(F.min("bucket"), F.max("bucket")).first()
    assert 0 <= lo and hi < 2**24
    a1 = {(r["vec_id"], r["bucket"]) for r in b.collect()}
    a2 = {(r["vec_id"], r["bucket"])
          for r in hyperplane_lsh_buckets(base.repartition(9), planes).collect()}
    assert a1 == a2
    # this synthetic table has NO true near-dups (max cos ≈ 0.46 — the
    # brute top-20 sit ~60° away, ≈40% of the 24 sign bits flipped), so
    # the meaningful production-width property is: a PLANTED genuine
    # near-duplicate (tiny perturbation of the query, cos ≈ 1) lands
    # within the h=2 probe ring and is recovered
    twin = [v * 1.001 + 0.0005 for v in qvec]
    planted = spark.createDataFrame(
        [(999_999, twin, 0)], "vec_id long, embedding array<float>, label int"
    )
    aug = base.unionByName(planted)
    got = {r["vec_id"] for r in ann_topk(aug, qvec, planes, k=5, hamming_probe=2).collect()}
    assert 999_999 in got


def test_strip_dup_spans_hand_case(spark):
    """Tokens covered by any corpus-duplicated w-span are dropped;
    unique text and short docs pass through."""
    from chainalytic_framework_spark.operators.dedup import (
        dup_span_stats,
        strip_dup_spans,
    )

    boiler = "the quick brown fox jumps over the lazy dog now"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique tail one two three four five six seven"),
            (2, "prefix words here " + boiler),
            (3, "totally different text with no repeated spans at all ok"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_dup_spans(docs, w=10).collect()}
    # the 10-token boilerplate occurs in docs 1 and 2 -> dropped there
    assert "quick brown" not in out[1]["text"]
    assert "unique tail" in out[1]["text"]
    assert out[1]["n_tokens_dropped"] == 10
    assert "quick brown" not in out[2]["text"]
    assert out[2]["text"].startswith("prefix words here")
    assert out[3]["n_tokens_dropped"] == 0
    assert out[3]["text"].startswith("totally different")
    assert out[4]["text"] == "short doc" and out[4]["n_tokens_dropped"] == 0

    stats = {r["doc_id"]: r for r in dup_span_stats(docs, w=10).collect()}
    assert stats[1]["n_dup_spans"] == 1 and stats[2]["n_dup_spans"] == 1
    assert stats[3]["n_dup_spans"] == 0
    assert 4 not in stats  # shorter than w -> no spans


def test_strip_dup_spans_overlapping_coverage(spark):
    """Overlapping duplicated spans must not double-drop tokens."""
    from chainalytic_framework_spark.operators.dedup import strip_dup_spans

    rep = "a b c d e"  # w=4 -> two overlapping dup spans inside
    docs = spark.createDataFrame(
        [(1, rep + " x y z w1 w2"), (2, rep + " p q r s1 s2")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_dup_spans(docs, w=4).collect()}
    assert out[1]["n_tokens_dropped"] == 5  # the shared 5 tokens, once
    assert out[1]["text"] == "x y z w1 w2"
    assert out[2]["text"] == "p q r s1 s2"


def test_benchmark_contamination_hand_case(spark):
    from chainalytic_framework_spark.operators.dedup import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris obviously")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "leak here: what is the capital of france paris obviously end"),
            (2, "clean document about entirely unrelated topics and words ok"),
            (3, "short one"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           benchmark_contamination(docs, bench, w=8).collect()}
    assert out[1]["contaminated"] == 1 and out[1]["n_contaminated_spans"] >= 1
    assert out[2]["contaminated"] == 0 and out[2]["n_contaminated_spans"] == 0
    assert 3 not in out  # shorter than w


def test_dup_span_stats_property_vs_python(spark):
    """Randomized small-vocab corpora: hash-counted span stats must
    equal a brute-force python span counter."""
    import random
    from collections import Counter

    from chainalytic_framework_spark.operators.dedup import dup_span_stats

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        w = rng.choice([2, 3, 5])
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 14))))
                for i in range(25)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
               for r in dup_span_stats(df, w=w).collect()}
        corpus = Counter()
        spans_by_doc = {}
        for i, t in docs:
            toks = t.split(" ") if t else [""]
            sp = [" ".join(toks[j:j + w]) for j in range(len(toks) - w + 1)] \
                if len(toks) >= w else []
            spans_by_doc[i] = sp
            corpus.update(sp)
        exp = {}
        for i, sp in spans_by_doc.items():
            if sp:
                exp[i] = (len(sp), sum(1 for s in sp if corpus[s] > 1))
        assert got == exp, (w, trial)


def test_dup_span_skewed_hot_span_no_window(spark):
    """Scale guard (VERDICT r3 wrong-item #1): one boilerplate span
    repeated across 10^4 docs — results stay exact AND the physical
    plan contains no per-hash Window (whose one-task-per-hot-key shape
    cannot be split by AQE); multiplicity must come from a
    groupBy+join, which collapses the hot key map-side."""
    import re

    from chainalytic_framework_spark.operators.dedup import (
        dup_span_stats,
        strip_dup_spans,
    )

    boiler = "all rights reserved copyright terms of use privacy policy"
    rows = [(i, boiler + f" tail{i} a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i}")
            for i in range(10_000)]
    rows.append((10_000, "a unique document with no boilerplate at all present here ok"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    stats_df = dup_span_stats(docs, w=9)
    strip_df = strip_dup_spans(docs, w=9)
    for df in (stats_df, strip_df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"\bWindow\b", plan), plan

    stats = {r["doc_id"]: r for r in stats_df.collect()}
    # the 9-token boilerplate span occurs 10^4 times -> dup in every carrier
    assert stats[0]["n_dup_spans"] == 1 and stats[123]["n_dup_spans"] == 1
    assert stats[10_000]["n_dup_spans"] == 0
    out = {r["doc_id"]: r for r in strip_df.collect()}
    assert out[42]["n_tokens_dropped"] == 9
    assert out[42]["text"] == "tail42 a42 b42 c42 d42 e42 f42 g42 h42"
    assert out[10_000]["n_tokens_dropped"] == 0


def test_cosine_pairs_bucket_width_guard(spark):
    """Degenerate LSH bucket (identical vectors) must FAIL LOUDLY at the
    configured cap instead of silently going quadratic; under the cap
    results equal the unguarded form."""
    import pytest

    from chainalytic_framework_spark.operators.similarity import (
        cosine_pairs_over_threshold,
        projection_planes,
    )

    planes = projection_planes(dim=4, n_planes=4)
    # 50 identical vectors -> one bucket of width 50 (plus two normals)
    rows = [(i, [1.0, 0.5, -0.25, 0.125]) for i in range(50)]
    rows += [(100, [0.9, -1.0, 0.3, 0.0]), (101, [-0.4, 0.2, 1.0, -0.7])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    guarded = cosine_pairs_over_threshold(emb, planes, threshold=0.99,
                                          max_bucket_width=20)
    # pyspark wraps the JVM error as Py4JJavaError OR converts it to
    # SparkRuntimeException depending on the capture path — the contract
    # is the MESSAGE, not the wrapper class
    with pytest.raises(Exception, match="max_bucket_width"):
        guarded.collect()

    loose = cosine_pairs_over_threshold(emb, planes, threshold=0.99,
                                        max_bucket_width=64)
    open_ = cosine_pairs_over_threshold(emb, planes, threshold=0.99,
                                        max_bucket_width=None)
    got = sorted((r["id_a"], r["id_b"]) for r in loose.collect())
    exp = sorted((r["id_a"], r["id_b"]) for r in open_.collect())
    assert got == exp and len(got) == 50 * 49 // 2


def test_strip_dup_spans_segments_hand_case(spark):
    """Cut-the-substring semantics: surrounding runs survive as separate
    segments with byte-exact text and 1-based start positions."""
    from chainalytic_framework_spark.operators.dedup import strip_dup_spans_segments

    boiler = "the quick brown fox jumps over the lazy dog now"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + boiler + " closing remarks follow"),
            (2, boiler + " only a tail after"),
            (3, "no duplicated content in this document at all ok"),
        ],
        "doc_id long, text string",
    )
    segs = {}
    for r in strip_dup_spans_segments(docs, w=10).collect():
        segs.setdefault(r["doc_id"], []).append(
            (r["seg_idx"], r["seg_start"], r["seg_text"], r["n_tokens"]))
    for v in segs.values():
        v.sort()
    # doc 1: prefix run (3 tokens at pos 1) and suffix run (3 tokens at 14)
    assert segs[1] == [(1, 1, "intro words here", 3),
                      (2, 14, "closing remarks follow", 3)]
    # doc 2: boiler at the start -> single suffix segment at pos 11
    assert segs[2] == [(1, 11, "only a tail after", 4)]
    # doc 3: untouched -> one whole-doc segment
    assert segs[3] == [(1, 1, "no duplicated content in this document at all ok", 9)]


def test_contamination_spans_and_excision(spark):
    """Span positions locate the exact benchmark overlap; excision cuts
    those tokens and keeps the surrounding runs."""
    from chainalytic_framework_spark.operators.dedup import (
        contamination_span_positions,
        excise_contaminated_spans,
    )

    leak = "what is the capital of france paris obviously"  # 8 tokens
    bench = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            (1, "document opens here " + leak + " and then goes on"),
            (2, "clean text with no benchmark overlap of any kind here"),
        ],
        "doc_id long, text string",
    )
    pos = [(r["doc_id"], r["pos"])
           for r in contamination_span_positions(docs, bench, w=8).collect()]
    assert pos == [(1, 4)]

    segs = {}
    for r in excise_contaminated_spans(docs, bench, w=8).collect():
        segs.setdefault(r["doc_id"], []).append(
            (r["seg_idx"], r["seg_start"], r["seg_text"], r["n_tokens"]))
    for v in segs.values():
        v.sort()
    assert segs[1] == [(1, 1, "document opens here", 3),
                      (2, 12, "and then goes on", 4)]
    assert segs[2] == [(1, 1, "clean text with no benchmark overlap of any kind here", 10)]
