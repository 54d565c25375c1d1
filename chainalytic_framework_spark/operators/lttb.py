"""Largest-Triangle-Three-Buckets downsampling per series.

A dashboard serving 10^12-point tiers cannot ship raw buckets to a
chart; LTTB (Steinarsson 2013, public thesis) picks the n points that
preserve a series' visual shape. Selection is inherently sequential
per series (each pick depends on the previous pick), so this is a
pandas-UDF ``applyInPandas`` operator — the documented "Spark lacks the
primitive" escape hatch — with the sequential part vectorized per
bucket inside NumPy. Series are key-partitioned; one shuffle, each
series decimated independently (the same cogroup shape as the fold).

Output is a deterministic function of the series content: no RNG, ties
broken by first index, so the result is identical across partitionings
and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lttb_indices(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    n = len(t)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    # bucket boundaries over the interior points (first/last always kept)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    idx = np.empty(n_out, dtype=np.int64)
    idx[0] = 0
    a = 0  # previously selected point
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = hi, min(n, edges[i + 1 + 1] if i + 2 < n_out - 1 else n)
        # average of the NEXT bucket (the third triangle corner)
        if nhi > nlo:
            avg_t, avg_v = t[nlo:nhi].mean(), v[nlo:nhi].mean()
        else:
            avg_t, avg_v = t[-1], v[-1]
        # triangle areas for every candidate in this bucket, vectorized
        tt, vv = t[lo:hi], v[lo:hi]
        area = np.abs(
            (t[a] - avg_t) * (vv - v[a]) - (t[a] - tt) * (avg_v - v[a])
        )
        a = lo + int(area.argmax())
        idx[i + 1] = a
    idx[-1] = n - 1
    return idx


def lttb_downsample(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    n_out: int,
) -> DataFrame:
    """Decimate each key's (t, v) series to ``n_out`` shape-preserving
    points. Series shorter than ``n_out`` pass through unchanged."""
    keys = list(key_cols)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in series.select(*keys, t_col, v_col).schema.fields
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, kind="mergesort").reset_index(drop=True)
        t = pdf[t_col].to_numpy(dtype="float64")
        v = pdf[v_col].to_numpy(dtype="float64")
        keep = _lttb_indices(t, v, n_out)
        return pdf.loc[keep, [*keys, t_col, v_col]]

    return series.select(*keys, t_col, v_col).groupBy(*keys).applyInPandas(_one, schema=schema)


# ---------------------------------------------------------------------------
# Exact-integer variant (cross-engine oracle parity)
# ---------------------------------------------------------------------------

def _lttb_indices_exact(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """LTTB selection over INT64 (t, v) with pure integer triangle
    areas — bit-identical across engines and accumulation orders, so a
    SQL engine can replay the selection (the DuckDB recursive-CTE
    oracle in contract.py does exactly that).

    Differences from the float path, all exactness-motivated:

    - the series is rebased (``t - t[0]``, ``v - v.min()``) — LTTB is
      translation-invariant (areas use only differences), and rebasing
      bounds every intermediate product well inside int64 for epoch
      seconds × cent-scale values (|Δt|·cnt·|Δv| ≲ 1e7·1e4·1e6 per
      term only for pathological series; typical tier series are ≪);
    - the next-bucket "average" is replaced by its (sum, count) pair
      and the area is multiplied through by ``cnt`` (positive, so the
      argmax is unchanged) — no division, no float;
    - bucket edges use the same ``floor(i*step + 1)`` float64 formula
      as ``np.linspace`` (multiply-then-add, IEEE-identical to the SQL
      ``CAST(floor(i*step + 1.0) AS BIGINT)``), last edge pinned to
      ``n-1`` exactly as linspace pins its endpoint.

    Ties in area break to the lowest index, matching the float path.
    """
    n = len(t)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    t = t - t[0]
    v = v - v.min()
    step = (n - 2) / (n_out - 2)
    edges = np.floor(np.arange(n_out - 1) * step + 1.0).astype(np.int64)
    edges[-1] = n - 1
    idx = np.empty(n_out, dtype=np.int64)
    idx[0] = 0
    a = 0
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        if i + 2 < n_out - 1:
            nlo, nhi = hi, edges[i + 2]
        else:
            nlo, nhi = hi, n
        cnt = int(nhi - nlo)
        sum_t = int(t[nlo:nhi].sum())
        sum_v = int(v[nlo:nhi].sum())
        ta, va = int(t[a]), int(v[a])
        tt, vv = t[lo:hi], v[lo:hi]
        # |cnt·area|: (ta·cnt − Σt)(v−va) − (ta−t)(Σv − va·cnt)
        area = np.abs(
            (ta * cnt - sum_t) * (vv - va) - (ta - tt) * (sum_v - va * cnt)
        )
        a = lo + int(area.argmax())
        idx[i + 1] = a
    idx[-1] = n - 1
    return idx


def lttb_downsample_exact(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    n_out: int,
) -> DataFrame:
    """Integer-exact LTTB: same plan shape as :func:`lttb_downsample`
    (one shuffle on the series key, whole-series pandas group), but
    ``t_col``/``v_col`` must be int64 and ``t_col`` unique per key
    (pre-aggregate ties upstream) — selection is then a deterministic
    pure-integer function replayable by the SQL oracle."""
    keys = list(key_cols)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in series.select(*keys, t_col, v_col).schema.fields
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, kind="mergesort").reset_index(drop=True)
        t = pdf[t_col].to_numpy(dtype="int64")
        v = pdf[v_col].to_numpy(dtype="int64")
        keep = _lttb_indices_exact(t, v, n_out)
        return pdf.loc[keep, [*keys, t_col, v_col]]

    return series.select(*keys, t_col, v_col).groupBy(*keys).applyInPandas(_one, schema=schema)


def m4_downsample(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
    bucket_secs: int,
    id_col: str,
    origin: int = 0,
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014 — public): per
    (key, pixel bucket) keep the four extreme points — first, last,
    min-value, max-value — the lossless-for-line-rendering reduction a
    chart of width w needs exactly 4·w points for. Complements LTTB:
    M4 is a pure aggregation (error-free min/max envelope, one shuffle,
    whole-stage codegen, no Python), LTTB is sequential shape-picking.

    Unlike LTTB the plan is a single partial-aggregated ``groupBy`` —
    at 10^12 rows the map-side combine collapses each bucket to four
    candidate structs per task before the shuffle, so this is the
    downsample that runs directly against RAW tiers, not just stored
    ones.

    Determinism: ``t_col``/``v_col`` must be int64; ties are broken by
    struct ordering ``(t, id)`` for first/last and ``(v, t, id)`` for
    min/max with ``id_col`` unique, so the emitted point set is
    bit-identical across engines and partitionings. Duplicate extremes
    (e.g. the bucket's first point is also its min) collapse via
    ``array_distinct``, matching the M4 paper's ≤4-points-per-bucket
    contract.

    Reference analogue: none — the reference serves raw range scans
    only (provider W4 shapes); resolution-aware serving is engine-added
    (SURVEY §2.11 family).

    Output: key cols, ``bucket_epoch``, ``t``, ``v``, ``n_in`` (bucket
    input count, repeated on each emitted point). ``origin`` shifts the
    bucket grid (e.g. a chart pane's t0) so a [t0, t1) range of length
    L covers exactly ceil(L / bucket_secs) buckets instead of the
    epoch-aligned ceil+1 straddle.
    """
    keys = list(key_cols)
    t, v, i = F.col(t_col), F.col(v_col), F.col(id_col)
    point = F.struct(t.alias("t"), v.alias("v"))
    ord_t = F.struct(t, i)
    ord_v = F.struct(v, t, i)
    g = (
        series.withColumn(
            "bucket_epoch",
            (F.floor((t - F.lit(origin)) / F.lit(bucket_secs)) * bucket_secs
             + F.lit(origin)).cast("long"),
        )
        .groupBy(*keys, "bucket_epoch")
        .agg(
            F.min_by(point, ord_t).alias("_pf"),
            F.max_by(point, ord_t).alias("_pl"),
            F.min_by(point, ord_v).alias("_pmin"),
            F.max_by(point, ord_v).alias("_pmax"),
            F.count(F.lit(1)).alias("n_in"),
        )
    )
    pts = F.array_distinct(F.array("_pf", "_pmin", "_pmax", "_pl"))
    return (
        g.select(*keys, "bucket_epoch", "n_in", F.explode(pts).alias("_p"))
        .select(
            *keys,
            "bucket_epoch",
            F.col("_p.t").alias("t"),
            F.col("_p.v").alias("v"),
            "n_in",
        )
    )
