"""Banded dynamic-time-warping similarity between entity time series.

DTW is the classic elastic series-distance (Sakoe & Chiba 1978, public):
two crawl-activity curves that follow the same shape a few buckets out
of phase score near zero, where Euclidean distance would explode. The
engine uses it to cluster entities (domains, event types, languages) by
the SHAPE of their rolled-up series — the "which pages behave alike"
face of the tier store.

Scale design — vectorize across PAIRS, not within a pair:

- The DP grid is a CONSTANT per pair (n·m cells, n = series length,
  already bounded by the tier the series was read from: a 30-day daily
  window is 30 points; band r caps it further at ~n·(2r+1)). The
  unbounded axis at 10^12 docs is the NUMBER of candidate pairs.
- So the NumPy kernel (:func:`_dtw_band_many`) runs the O(n·m) cell
  loop ONCE per Arrow batch with every array op spanning the whole
  batch's pairs — the same batch-transposed pattern as the Gorilla
  codec (operators/codec.py): per-cell Python overhead is amortized
  over thousands of pairs, the inner work is SIMD-width numpy.
- Candidate pairs come from the caller (all-pairs over a small grouped
  axis like event_type, or SAX-word / LSH-bucket candidates for large
  axes — operators/lttb.py, dedup.py); DTW is the bounded verify
  stage of that funnel, never an all-pairs scan.
- Integer values in, integer cost out (sum of |Δ| along the warp
  path), so results are bit-equal across engines and parallelism —
  the DuckDB oracle replays the identical DP as a recursive CTE.

Reference analogue: none — series-shape similarity extends the
reference's key-exact reads the way the dedup/ANN funnels do;
engine-added capability for the rollup store.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Large-but-safe sentinel: real DTW costs (cents × buckets) stay far
# below it, and capping additions at it prevents int64 overflow when a
# banded cell's only neighbors are themselves sentinel.
_SENT = np.int64(10**15)


def _dtw_band_many(A: np.ndarray, B: np.ndarray, r: int) -> np.ndarray:
    """Banded DTW over a BATCH of pairs: A (P, n) and B (P, m) int64 →
    (P,) int64 costs. The (i, j) loops are the constant grid; every
    array op inside is vectorized over the P pairs."""
    P, n = A.shape
    m = B.shape[1]
    if r < 1:
        raise ValueError("band radius must be >= 1")
    prev = np.full((P, m + 1), _SENT, dtype=np.int64)
    prev[:, 0] = 0
    for i in range(1, n + 1):
        cur = np.full((P, m + 1), _SENT, dtype=np.int64)
        for j in range(max(1, i - r), min(m, i + r) + 1):
            c = np.abs(A[:, i - 1] - B[:, j - 1])
            best = np.minimum(np.minimum(prev[:, j], prev[:, j - 1]), cur[:, j - 1])
            cur[:, j] = np.minimum(c + best, _SENT)
        prev = cur
    return prev[:, m]


def series_arrays(
    series: DataFrame, key_col: str, t_col: str, v_col: str
) -> DataFrame:
    """Per-key ordered value array: ``(key, n, vals)``. One keyed
    shuffle; deterministic because the collect is array_sort'ed on the
    (t, v) struct. The input grid must already be aligned per key
    (gap-fill / zero-fill first — operators/gapfill.py)."""
    s = series.groupBy(F.col(key_col).alias("key")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(t_col).alias("t"), F.col(v_col).alias("v")))
        ).alias("_s")
    )
    return s.select(
        "key",
        F.size("_s").cast("long").alias("n"),
        F.col("_s.v").alias("vals"),
    )


def dtw_pairs(
    series: DataFrame,
    key_col: str,
    t_col: str,
    v_col: str,
    band: int = 7,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """DTW cost for candidate key pairs over an aligned integer-valued
    grid. ``pairs`` (columns ``key_a < key_b``) bounds the work; when
    omitted, all ordered pairs of the key axis are formed (only sane
    for a small grouped axis — pass SAX/LSH candidates otherwise).

    Output: ``(key_a, key_b, n_a, n_b, dtw_cost)`` — exact integers.
    """
    arrs = series_arrays(series, key_col, t_col, v_col)
    a = arrs.select(
        F.col("key").alias("key_a"), F.col("n").alias("n_a"), F.col("vals").alias("va")
    )
    b = arrs.select(
        F.col("key").alias("key_b"), F.col("n").alias("n_b"), F.col("vals").alias("vb")
    )
    if pairs is not None:
        j = pairs.join(a, "key_a").join(b, "key_b")
    else:
        # all-pairs is only sane for a small grouped axis (see above),
        # so SAY so to the planner: broadcast the right side — a
        # BroadcastNestedLoopJoin bounded by |keys|², never a shuffled
        # CartesianProduct of two unknown-size sides
        j = a.join(F.broadcast(b), F.col("key_a") < F.col("key_b"))

    out_schema = (
        "key_a string, key_b string, n_a long, n_b long, dtw_cost long"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            # group by (n_a, n_b) so each stack is rectangular; the
            # aligned-grid contract makes this one group in practice
            for (na, nb), g in pdf.groupby(["n_a", "n_b"]):
                A = np.stack(g["va"].to_numpy()).astype(np.int64)
                B = np.stack(g["vb"].to_numpy()).astype(np.int64)
                cost = _dtw_band_many(A, B, band)
                yield pd.DataFrame(
                    {
                        "key_a": g["key_a"].to_numpy(),
                        "key_b": g["key_b"].to_numpy(),
                        "n_a": np.int64(na),
                        "n_b": np.int64(nb),
                        "dtw_cost": cost,
                    }
                )

    return j.select("key_a", "key_b", "n_a", "n_b", "va", "vb").mapInPandas(
        _batches, out_schema
    )
