"""Product quantization (operators/pq.py): recall vs exact search,
code determinism, ADC score parity with numpy, codebook-size
monotonicity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.pq import (
    pq_encode,
    pq_search,
    pq_search_rerank,
    pq_train,
)

DIM = 32


def _clustered(n_clusters=8, per=60, seed=3):
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_clusters, DIM).astype(np.float32) * 3
    rows = []
    for ci in range(n_clusters):
        pts = cents[ci] + rng.randn(per, DIM).astype(np.float32) * 0.4
        rows += [(ci * per + j, pts[j].tolist()) for j in range(per)]
    return rows


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _clustered(), "vec_id long, embedding array<float>"
    ).cache()


@pytest.fixture(scope="module")
def trained(emb):
    cb = pq_train(emb, m=8, k=64, sample=480, iters=8)
    return cb, pq_encode(emb, cb).cache()


def _exact_topk(rows, q, k):
    x = np.array([v for _, v in rows], dtype=np.float32)
    ids = np.array([i for i, _ in rows])
    d = ((x - q[None, :]) ** 2).sum(axis=1)
    return set(ids[np.argsort(d, kind="stable")[:k]])


def test_recall_at_10(emb, trained):
    cb, codes = trained
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    rng = np.random.RandomState(7)
    recalls = []
    for _ in range(5):
        q = np.array(rows[rng.randint(len(rows))][1], dtype=np.float32) + 0.05
        exact = _exact_topk(rows, q, 10)
        got = {r["vec_id"] for r in pq_search(codes, cb, q, topk=10).collect()}
        recalls.append(len(got & exact) / 10)
    assert np.mean(recalls) >= 0.5, recalls  # 32x compression, no re-rank


def test_codes_deterministic_across_partitionings(emb, trained):
    cb, _ = trained
    a = pq_encode(emb, cb)
    b = pq_encode(emb.repartition(7), cb)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_adc_matches_numpy_reference(emb, trained):
    cb, codes = trained
    m, k, ds = cb.shape
    q = np.zeros(DIM, dtype=np.float32)
    table = np.stack(
        [((cb[i] - q[i * ds : (i + 1) * ds][None, :]) ** 2).sum(axis=1)
         for i in range(m)]
    ).astype(np.float64)
    got = {r["vec_id"]: r["adc_x1e6"] for r in pq_search(codes, cb, q, topk=5).collect()}
    local = {r["vec_id"]: np.array(r["codes"]) for r in codes.collect()}
    for vid, score in got.items():
        want = table[np.arange(m), local[vid]].sum()
        assert abs(score - round(want * 1e6)) <= 1, (vid, score, want)


def test_bigger_codebooks_reconstruct_better(emb):
    # mean quantization error must drop as k grows
    def err(k):
        cb = pq_train(emb, m=8, k=k, sample=480, iters=8)
        codes = pq_encode(emb, cb).collect()
        rows = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
        m, _, ds = cb.shape
        total = 0.0
        for r in codes:
            x = np.array(rows[r["vec_id"]], dtype=np.float32)
            rec = np.concatenate([cb[i][r["codes"][i]] for i in range(m)])
            total += float(((x - rec) ** 2).sum())
        return total / len(codes)

    assert err(32) < err(4)


def test_dim_must_divide(emb):
    with pytest.raises(ValueError):
        pq_train(emb, m=5, k=8, sample=100, iters=2)


def test_rerank_recovers_recall(emb, trained):
    cb, codes = trained
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    rng = np.random.RandomState(7)
    recalls = []
    for _ in range(5):
        q = np.array(rows[rng.randint(len(rows))][1], dtype=np.float32) + 0.05
        exact = _exact_topk(rows, q, 10)
        got = {r["vec_id"] for r in
               pq_search_rerank(codes, emb, cb, q, topk=10).collect()}
        recalls.append(len(got & exact) / 10)
    assert np.mean(recalls) >= 0.85, recalls


def test_ivf_pq_pipeline(emb, trained):
    """IVF probe + PQ shortlist + exact re-rank: good recall touching a
    fraction of the corpus; full probe equals the no-IVF re-rank path."""
    from chainalytic_framework_spark.operators.pq import ivf_pq_search
    from chainalytic_framework_spark.operators.similarity import ivf_train

    cb, codes = trained
    cents = ivf_train(emb, n_centroids=8, n_iters=3)
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    rng = np.random.RandomState(11)
    recalls = []
    for _ in range(3):
        q = np.array(rows[rng.randint(len(rows))][1], dtype=np.float32) + 0.05
        exact = _exact_topk(rows, q, 10)
        got = {r["vec_id"] for r in
               ivf_pq_search(emb, codes, cents, cb, q, topk=10, n_probe=3).collect()}
        recalls.append(len(got & exact) / 10)
    assert np.mean(recalls) >= 0.7, recalls

    # degenerate full probe == plain PQ re-rank path
    q = np.array(rows[5][1], dtype=np.float32)
    a = [(r["vec_id"], r["dist_x1e6"]) for r in
         ivf_pq_search(emb, codes, cents, cb, q, topk=10, n_probe=8).collect()]
    b = [(r["vec_id"], r["dist_x1e6"]) for r in
         pq_search_rerank(codes, emb, cb, q, topk=10).collect()]
    assert a == b


def test_ann_index_materialized_probe_prunes_and_matches(spark, emb, trained, tmp_path_factory):
    """VERDICT r2 item 5 acceptance: the stored (vec_id, codes, cluster)
    layout must (a) physically prune — a probe touches files from only
    the n_probe cluster partitions — and (b) return exactly what the
    in-plan composition returns."""
    from chainalytic_framework_spark.operators.pq import (
        build_ann_index,
        ivf_pq_search,
        ivf_pq_search_stored,
        probe_clusters,
    )
    from chainalytic_framework_spark.operators.similarity import ivf_train
    from chainalytic_framework_spark.tables import TableStore

    cb, codes = trained
    store = TableStore(spark, str(tmp_path_factory.mktemp("ann_wh")))
    cents = ivf_train(emb, n_centroids=8, n_iters=4)
    build_ann_index(emb, store, cents, cb, name="ann_codes")

    q = np.array(_clustered()[5][1], dtype=np.float32) + 0.03
    n_probe = 3
    probes = set(probe_clusters(cents, q, n_probe))

    # (a) physical pruning: every file the probe scan reads lives under
    # a probed cluster=... partition dir (zone-map-style check)
    probe_df = store.read("ann_codes").where(
        F.col("cluster").isin([int(p) for p in probes])
    )
    files = {
        r["f"]
        for r in probe_df.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files, "probe read no files"
    for f in files:
        assert any(f"cluster={p}/" in f for p in probes), f
    # and it is a strict subset of the table's partitions (an empty
    # coarse cell may drop a partition dir, so >= is the invariant)
    all_parts = set(store.partition_file_stats("ann_codes"))
    assert len(all_parts) > n_probe
    touched = {f.split("cluster=")[1].split("/")[0] for f in files}
    assert len(touched) <= n_probe

    # (b) result parity with the in-plan form
    got = [
        (r["vec_id"], r["dist_x1e6"])
        for r in ivf_pq_search_stored(
            store, emb, cents, cb, q, name="ann_codes",
            topk=10, n_probe=n_probe,
        ).collect()
    ]
    exp = [
        (r["vec_id"], r["dist_x1e6"])
        for r in ivf_pq_search(
            emb, codes, cents, cb, q, topk=10, n_probe=n_probe,
        ).collect()
    ]
    assert got == exp and len(got) == 10


def test_append_ann_index_equals_single_build(spark, emb, trained, tmp_path_factory):
    """Two incremental appends must serve identical probe results to a
    one-shot build over the union (frozen centroids/codebooks)."""
    from chainalytic_framework_spark.operators.pq import (
        append_ann_index,
        build_ann_index,
        ivf_pq_search_stored,
    )
    from chainalytic_framework_spark.operators.similarity import ivf_train
    from chainalytic_framework_spark.tables import TableStore

    cb, _ = trained
    cents = ivf_train(emb, n_centroids=8, n_iters=4)
    half_a = emb.where(F.col("vec_id") % 2 == 0)
    half_b = emb.where(F.col("vec_id") % 2 == 1)

    s_inc = TableStore(spark, str(tmp_path_factory.mktemp("ann_inc")))
    append_ann_index(half_a, s_inc, cents, cb)   # creates
    append_ann_index(half_b, s_inc, cents, cb)   # appends
    s_full = TableStore(spark, str(tmp_path_factory.mktemp("ann_full")))
    build_ann_index(emb, s_full, cents, cb)

    q = np.array(_clustered()[42][1], dtype=np.float32) + 0.02
    got = ivf_pq_search_stored(s_inc, emb, cents, cb, q, topk=10, n_probe=3).collect()
    exp = ivf_pq_search_stored(s_full, emb, cents, cb, q, topk=10, n_probe=3).collect()
    assert [(r["vec_id"], r["dist_x1e6"]) for r in got] == \
           [(r["vec_id"], r["dist_x1e6"]) for r in exp]
