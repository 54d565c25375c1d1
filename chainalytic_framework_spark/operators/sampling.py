"""Deterministic sampling for training-data curation.

A 100 TB corpus pipeline needs samples that are (a) reproducible across
reruns, cluster sizes, and partition layouts, (b) computable in a
single scan with no shuffle, and (c) consistent between the engine and
any external verifier. ``df.sample()`` gives none of these (its
Bernoulli draw depends on partition iteration order). Every operator
here instead derives the keep/drop decision from a CONTENT hash of the
row's key — a pure projection/filter that pushes down, parallelizes
embarrassingly, and yields byte-identical samples on 1 or 1000
executors.

Hash: md5-prefix (cross-engine stable — DuckDB/Trino/Spark all agree on
md5 of the same bytes), 60 bits → uniform in [0, 1) with ~2^-60
granularity. The seed is mixed into the hashed string, so different
seeds give independent samples and a holdout split never leaks into a
training sample drawn with another seed.

Reference analogue: none (the reference processes every block) — this
is north-rule training-data tooling, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex digits = 60 bits, exact in int64 and in DOUBLE-free integer math
_HASH_MOD = 1_000_000  # ppm resolution for rates


def key_hash(col, seed: int = 0) -> F.Column:
    """Deterministic 60-bit hash of a key column (+ seed), cross-engine
    reproducible (md5 prefix — same value in DuckDB via
    ``CAST(('0x' || substr(md5(x || ':' || seed), 1, 15)) AS BIGINT)``)."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat_ws(":", c.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def _ppm(col, seed: int) -> F.Column:
    return F.pmod(key_hash(col, seed), F.lit(_HASH_MOD))


def hash_sample(df: DataFrame, rate: float, key: str, seed: int = 0) -> DataFrame:
    """Keep rows whose key hashes below ``rate``: a deterministic
    Bernoulli(rate) sample, stable across partitioning. One scan, no
    shuffle; the predicate is a plain filter Catalyst keeps next to the
    scan."""
    return df.where(_ppm(key, seed) < int(round(rate * _HASH_MOD)))


def split_train_holdout(
    df: DataFrame, holdout_frac: float, key: str, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, holdout) split on the SAME hash —
    every row lands in exactly one side, forever, regardless of when it
    arrives (new data joins the same split it would always have)."""
    thr = int(round(holdout_frac * _HASH_MOD))
    h = _ppm(key, seed)
    return df.where(h >= thr), df.where(h < thr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key: str,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample boilerplate
    languages, keep all of rare ones). The rate table is a CASE
    expression — a broadcast-free, shuffle-free filter."""
    thr = F.lit(int(round(default_rate * _HASH_MOD)))
    expr = None
    for value, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == value
        t = F.lit(int(round(rate * _HASH_MOD)))
        expr = F.when(cond, t) if expr is None else expr.when(cond, t)
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.where(_ppm(key, seed) < thr)


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key: str,
    seed: int = 0,
) -> DataFrame:
    """Uniform-without-replacement k rows per group: rank rows by their
    key hash inside each group and keep the k smallest. Equivalent to a
    per-group reservoir sample but deterministic and order-free; one
    shuffle on the group key (the same shuffle any per-group operator
    pays). Ties broken by the key itself, so the result is total-order
    stable even under hash collisions."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(key_hash(key, seed).asc(), F.col(key).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def split_assign(df: DataFrame, splits: dict[str, float], key: str,
                 seed: int = 0, split_col: str = "split") -> DataFrame:
    """N-way deterministic split LABEL (train/val/test): cumulative
    thresholds over the same content-hash ppm, so every row carries one
    stable assignment forever — new data joining later lands in the
    split it would always have had, and the label is reproducible in
    any engine that can md5 (oracle-paired). Fractions must sum to 1.

    Splits are assigned in sorted-name order for determinism; the last
    band absorbs rounding residue so the cover is exhaustive."""
    names = sorted(splits)
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, need 1.0")
    h = _ppm(key, seed)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        thr = F.lit(int(round(acc * _HASH_MOD)))
        expr = (F.when(h < thr, F.lit(name)) if expr is None
                else expr.when(h < thr, F.lit(name)))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(split_col, label)


def temperature_resample(
    df: DataFrame,
    group_col: str,
    key: str,
    coeff_ppm: int,
    a: int = 1,
    b: int = 2,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based mixture resampling, EXACT in integers: keep
    each row of group g with probability

        p_g = min(1, (coeff_ppm / 1e6) · n_g^((a-b)/b))      alpha = a/b

    i.e. p_g ∝ n_g^(alpha − 1): the multinomial temperature rule
    (mBERT/XLM-R/mT5 style) that downsamples dominant groups and keeps
    rare ones, so the SAMPLED mixture follows n_g^alpha. alpha is a
    RATIONAL a/b so the keep test needs no float pow (whose last-ulp
    differences across engines could flip a threshold row):

        keep  ⇔  ppm^b · n_g^(b-a)  <  coeff_ppm^b

    evaluated in decimal(38,0) — byte-identical sample membership on
    any engine and any partitioning. Spark's ANSI decimal overflow
    THROWS rather than wraps; the width contract is
    ``6·b + (b−a)·log10(max n_g) ≤ 38`` (b=2: fine to n_g = 10^26;
    b=4, a=3: fine to 10^14 — choose small b for huge corpora).

    ``coeff_ppm`` is the budget knob (may exceed 10^6 — small groups
    then saturate at p=1): expected kept rows = Σ_g n_g · p_g.  One
    small-group count agg broadcast back onto the fact; the keep test
    is a scan-side filter — the fact table never shuffles.

    Reference analogue: none (north-rule training-data tooling; the
    reference aggregates every block). Same determinism contract as
    :func:`hash_sample`.
    """
    if not (0 < a <= b):
        raise ValueError(f"alpha must be rational in (0,1]: a={a}, b={b}")
    dec = "decimal(38,0)"
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    joined = df.join(F.broadcast(counts), group_col)
    ppm = _ppm(key, seed).cast(dec)
    lhs = ppm
    for _ in range(b - 1):
        lhs = (lhs * ppm).cast(dec)
    nfac = F.col("_n").cast(dec)
    for _ in range(b - a):
        lhs = (lhs * nfac).cast(dec)
    rhs = F.lit(str(int(coeff_ppm) ** b)).cast(dec)
    return joined.where(lhs < rhs).drop("_n")


def leakage_safe_split(
    df: DataFrame,
    splits: dict[str, float],
    group_col,
    key: str,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Cluster-aware train/val/test assignment: the whole duplicate
    CLUSTER gets one split, never the document. A per-doc hash split
    (:func:`split_assign`) leaks whenever two near-copies of the same
    page hash into different bands — the eval set then contains
    training data verbatim, the classic contamination path web corpora
    are audited for. Here the split band is drawn from the hash of the
    cluster REPRESENTATIVE (min ``key`` per ``group_col``), so every
    member of a cluster — including ones ingested later, since min() of
    a growing cluster only changes if an earlier doc arrives, which
    re-pins the whole cluster consistently on recompute — lands in the
    same band.

    ``group_col`` is any cluster id Column/name: md5(text) for exact
    dups, :func:`~..operators.components.dedup_groups` output for
    LSH/connected-component near-dups. Fractions follow
    :func:`split_assign`'s band math exactly (same seed ⇒ a singleton
    cluster keyed by its own id gets the same label either way).

    Scale shape: one groupBy(group) min-agg (map-side combinable) + one
    shuffled join back on the group key — both keyed on the cluster id;
    the label table is #clusters rows, joined without ever collecting.
    Giant clusters (the empty-page cluster) are a single key on BOTH
    sides of an equi-join, the AQE skew-split case, never a window.
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    grouped = df.withColumn("_grp", g)
    rep = grouped.groupBy("_grp").agg(F.min(key).alias("_rep"))
    labeled = split_assign(rep, splits, key="_rep", seed=seed,
                           split_col=split_col)
    return grouped.join(labeled.select("_grp", split_col), "_grp").drop("_grp")
