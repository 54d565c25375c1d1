"""Custom stateful streaming operator: per-url streaming fold via
``applyInPandasWithState``.

The streaming twin of operators/fold.py — the reference's
Transform.execute loop (strictly-ordered per-key fold with private
state, ``/root/reference/src/chainalytic/aggregator/transform.py:29-59``)
expressed as Structured Streaming keyed state:

- group: url (state key), state: (last_ts_us, last_text_hash,
  content_rev, cum_points, cum_bytes) — the same tuple the batch fold
  carries in its state table;
- each micro-batch folds its rows in event-time order on top of the
  carried GroupState and emits one change-event row per observation
  (is_new / text_changed / content_rev / gap_seconds);
- ``GroupStateTimeout.NoTimeout`` here; the expiry analogue (reference
  W5 unlock timer) is the ``expired`` flag computed from gap length —
  eviction-by-timeout would use EventTimeTimeout with a watermark.

Caveat vs batch fold (documented): state updates are per-micro-batch;
rows of the same url split across micro-batches fold correctly (state
carries), but exactly-once output requires the sink to be idempotent on
(url, warc_ts) — same contract as the batch pipeline's partition
overwrite.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "url string, warc_ts timestamp, is_new boolean, text_changed boolean, "
    "content_rev long, gap_seconds long, expired boolean, cum_points long"
)
STATE_SCHEMA = "last_ts_us long, last_text_hash long, content_rev long, cum_points long"

TTL_SECONDS = 3 * 86400


def _fold_url(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (url,) = key
    if state.exists:
        last_ts_us, last_hash, rev, pts = state.get
    else:
        last_ts_us, last_hash, rev, pts = None, None, 0, 0

    outs = []
    for pdf in pdfs:
        # Vectorized per-micro-batch fold: shift + cumsum, the same shape
        # the batch fold proves out (operators/fold.py:_fold_frames) —
        # no per-row Python. State splices in as the virtual row -1.
        # nullable Int64 end-to-end keeps 64-bit hash compares EXACT
        # (shift would otherwise upcast int64→float64 and corrupt low bits).
        pdf = pdf.sort_values("warc_ts", kind="mergesort")
        n = len(pdf)
        if n == 0:
            continue
        ts_us = (pdf["warc_ts"].astype("int64") // 1000).astype("Int64").reset_index(drop=True)
        hashes = pdf["text_hash"].astype("Int64").reset_index(drop=True)
        prev_ts = ts_us.shift(1)
        prev_hash = hashes.shift(1)
        if last_ts_us is not None:
            prev_ts.iloc[0] = last_ts_us
            prev_hash.iloc[0] = last_hash

        is_new = prev_ts.isna()
        # round (not floor) half-to-even — must match the batch fold's
        # total_seconds().round() semantics exactly
        gaps = ((ts_us - prev_ts) / 1_000_000).round().astype("Int64")
        expired = (gaps > TTL_SECONDS).fillna(False)
        changed = (hashes != prev_hash).fillna(False) & prev_hash.notna()
        revs = rev + changed.cumsum().astype("int64")
        cps = pts + pd.RangeIndex(1, n + 1).to_numpy()

        rev = int(revs.iloc[-1])
        pts = int(cps[-1])
        last_ts_us = int(ts_us.iloc[-1])
        last_hash = int(hashes.iloc[-1])
        outs.append(
            pd.DataFrame(
                {
                    "url": url,
                    "warc_ts": pdf["warc_ts"].values,
                    "is_new": is_new.to_numpy(dtype="bool"),
                    "text_changed": changed.to_numpy(dtype="bool"),
                    "content_rev": revs.to_numpy(dtype="int64"),
                    "gap_seconds": gaps,
                    "expired": expired.to_numpy(dtype="bool"),
                    "cum_points": pd.Series(cps, dtype="int64"),
                }
            )
        )
    state.update((last_ts_us, last_hash, int(rev), int(pts)))
    yield from outs


def streaming_fold(pages_stream: DataFrame) -> DataFrame:
    """Keyed streaming fold over a pages stream (schema: url, warc_ts,
    text, ...). Narrows JVM-side (hash, lengths) before the state op."""
    obs = pages_stream.select(
        "url", "warc_ts", F.xxhash64("text").alias("text_hash")
    )
    return obs.groupBy("url").applyInPandasWithState(
        _fold_url,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# TTL-timer variant: true W5 expiry EVENTS via EventTimeTimeout
# ---------------------------------------------------------------------------

EXPIRY_OUTPUT_SCHEMA = OUTPUT_SCHEMA + ", expiry_event boolean"


def _fold_url_ttl(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """The fold plus a REAL timer: when the event-time watermark passes
    last_ts + TTL without a new crawl, the state times out and one
    explicit expiry EVENT row is emitted (reference W5: the unlock
    timer fires a state transition by itself, ``stake_history.py:85-100``
    — not merely a flag on the next observation), then the key's state
    is dropped (bounded state under url churn)."""
    (url,) = key
    if state.hasTimedOut:
        last_ts_us, last_hash, rev, pts = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "url": [url],
                "warc_ts": pd.to_datetime([(last_ts_us + TTL_SECONDS * 1_000_000)], unit="us"),
                "is_new": pd.Series([False], dtype="bool"),
                "text_changed": pd.Series([False], dtype="bool"),
                "content_rev": pd.Series([rev], dtype="int64"),
                "gap_seconds": pd.Series([None], dtype="Int64"),
                "expired": pd.Series([True], dtype="bool"),
                "cum_points": pd.Series([pts], dtype="int64"),
                "expiry_event": pd.Series([True], dtype="bool"),
            }
        )
        return
    last_ts_us = None
    for out in _fold_url(key, pdfs, state):
        out["expiry_event"] = False
        last_ts_us = int(out["warc_ts"].astype("int64").iloc[-1] // 1000)
        yield out
    if last_ts_us is not None:
        # timer: fire when the watermark passes last event + TTL (millis)
        state.setTimeoutTimestamp(last_ts_us // 1000 + TTL_SECONDS * 1000)


def streaming_fold_with_expiry(pages_stream: DataFrame, watermark: str = "1 minute") -> DataFrame:
    """streaming_fold + TTL expiry events. EventTimeTimeout requires a
    watermark on the stream (late data beyond it is dropped, T3)."""
    obs = pages_stream.select(
        "url", "warc_ts", F.xxhash64("text").alias("text_hash")
    ).withWatermark("warc_ts", watermark)
    return obs.groupBy("url").applyInPandasWithState(
        _fold_url_ttl,
        outputStructType=EXPIRY_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# streaming CUSUM: sequential change detection at the edge
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = "series_key string, ts timestamp, value double, cusum double, alarm boolean"
CUSUM_STATE_SCHEMA = "s double"


def _cusum_key(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (k_series,) = key
    s = state.get[0] if state.exists else 0.0
    outs = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values("ts", kind="mergesort")
        d = (pdf["value"].to_numpy(dtype="float64") - pdf["k_ref"].to_numpy(dtype="float64"))
        h = float(pdf["threshold"].iloc[0])
        # within-batch vectorization via the reflection identity with the
        # carried S as a prior prefix: S_t = D_t − min(0, min_{j≤t} D_j),
        # D_t = S_prev + Σ d. Alarm resets re-run the identity from the
        # crossing point — a loop over ALARMS (rare), not rows.
        n = len(d)
        S = np.empty(n, dtype=np.float64)
        alarm = np.zeros(n, dtype=bool)
        start, s_run = 0, s
        while start < n:
            D = s_run + np.cumsum(d[start:])
            floor = np.minimum(np.minimum.accumulate(D), 0.0)
            seg = D - floor
            cross = np.flatnonzero(seg >= h)
            if len(cross) == 0:
                S[start:] = seg
                s_run = seg[-1] if len(seg) else s_run
                break
            c = int(cross[0])
            S[start : start + c + 1] = seg[: c + 1]
            alarm[start + c] = True
            s_run = 0.0  # restart after alarm (standard Page procedure)
            start = start + c + 1
        s = float(s_run)
        outs.append(
            pd.DataFrame(
                {
                    "series_key": k_series,
                    "ts": pdf["ts"].values,
                    "value": pdf["value"].to_numpy(dtype="float64"),
                    "cusum": S,
                    "alarm": alarm,
                }
            )
        )
    state.update((s,))
    yield from outs


def streaming_cusum(
    events_stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    k_ref: float,
    threshold: float,
) -> DataFrame:
    """Per-key sequential change detection (Page's one-sided CUSUM with
    a FIXED in-control reference — at the edge the reference comes from
    history, e.g. the batch tier mean, while the BATCH cusum_drift op
    estimates it in-sample). Keyed state is one double (the running
    statistic); each micro-batch updates it with the reflection-identity
    vectorization and restarts at zero after an alarm. Emits every
    observation with its running statistic and alarm flag — the
    streaming twin of operators/rolling.py::cusum_drift
    (parity: tests/test_streaming_stateful.py pins the drain against a
    scalar reference replay)."""
    obs = events_stream.select(
        F.col(key_col).cast("string").alias("series_key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.lit(float(k_ref)).alias("k_ref"),
        F.lit(float(threshold)).alias("threshold"),
    )
    return obs.groupBy("series_key").applyInPandasWithState(
        _cusum_key,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
