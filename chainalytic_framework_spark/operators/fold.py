"""Stateful per-url fold: the engine's Transform analogue.

Reference semantics being re-expressed (SURVEY.md §2.10, §2.9):
- ``Transform.execute(height, input) -> state'`` — a per-key stateful
  fold over a strictly-ordered stream, with private fold state
  (``/root/reference/src/chainalytic/aggregator/transform.py:29-59``,
  concrete fold ``zones/.../transform_registry/stake_history.py:62-133``);
- state lookup join (J1): each event's previous state fetched, combined,
  written back (``stake_history.py:110-125``) — here a cogroup of the
  observation stream with the carried state table;
- change detection (T6), transition counting (A2), cumulative carry (A1).

Spark realization:
- Heavy columns never enter Python: ``prepare_observations`` reduces
  pages to (url, warc_ts, text_hash, text_len, html_len, lang) JVM-side
  (xxhash64/length/octet_length) before the Arrow hop.
- Groups are ``url_bucket`` (bounded count, bounded size), NOT raw url —
  at 10^12 docs a group is one fold task; within a group the fold is
  vectorized pandas (groupby.shift/cumsum — no per-row Python).
- Cross-run incrementality: ``fold_with_state`` cogroups observations
  with the prior state table; ``extract_state`` derives the next state
  table from fold output. fold(full) == fold(part2, state(part1)) —
  the T1 resumability invariant, tested in tests/test_fold.py.

Emitted per observation:
  is_new        first time this url is ever seen
  text_changed  text hash differs from previous crawl of the same url
  content_rev   running count of content changes (carried across runs)
  gap_seconds   seconds since previous crawl (NULL on first)
  expired       previous crawl was more than ``ttl_seconds`` ago —
                the reference's W5 unlock-expiry analogue
  cum_points / cum_bytes   running per-url totals (carried)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bucketing import N_URL_BUCKETS, url_bucket, url_hash

FOLD_SCHEMA = (
    "url string, warc_ts timestamp, url_hash long, lang string, "
    "is_new boolean, text_changed boolean, content_rev long, "
    "gap_seconds long, expired boolean, cum_points long, cum_bytes long, "
    "text_hash long, text_len long, html_len long"
)

STATE_SCHEMA = (
    "url string, url_hash long, lang string, last_ts timestamp, "
    "last_text_hash long, content_rev long, cum_points long, cum_bytes long"
)

DEFAULT_TTL_SECONDS = 3 * 86400  # reference W2 TIMESPAN ≈ 3 days (recent_stake_wallets.py:18)


def prepare_observations(pages: DataFrame, n_buckets: int = N_URL_BUCKETS) -> DataFrame:
    """JVM-side narrowing: hash text, take lengths, drop blobs."""
    return pages.select(
        url_bucket("url", n_buckets).alias("url_bucket"),
        "url",
        "warc_ts",
        url_hash("url").alias("url_hash"),
        "lang",
        F.xxhash64("text").alias("text_hash"),
        F.length("text").cast("long").alias("text_len"),
        F.octet_length("html").cast("long").alias("html_len"),
    )


def _fold_frames(obs: pd.DataFrame, state: pd.DataFrame, ttl_seconds: int) -> pd.DataFrame:
    """Vectorized fold of one url_bucket group. ``state`` may be empty."""
    if len(obs) == 0:
        # typed empty frame (Arrow needs concrete dtypes, not object)
        return pd.DataFrame(
            {
                "url": pd.Series(dtype="object"),
                "warc_ts": pd.Series(dtype="datetime64[us]"),
                "url_hash": pd.Series(dtype="int64"),
                "lang": pd.Series(dtype="object"),
                "is_new": pd.Series(dtype="bool"),
                "text_changed": pd.Series(dtype="bool"),
                "content_rev": pd.Series(dtype="int64"),
                "gap_seconds": pd.Series(dtype="Int64"),
                "expired": pd.Series(dtype="bool"),
                "cum_points": pd.Series(dtype="int64"),
                "cum_bytes": pd.Series(dtype="int64"),
                "text_hash": pd.Series(dtype="int64"),
                "text_len": pd.Series(dtype="int64"),
                "html_len": pd.Series(dtype="int64"),
            }
        )
    obs = obs.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
    # nullable Int64 keeps hash comparisons EXACT through shift/splice —
    # int64→float64 coercion would equate hashes agreeing in the top
    # ~53 bits and silently miss content changes
    obs["text_hash"] = obs["text_hash"].astype("Int64")
    g = obs.groupby("url", sort=False)

    prev_hash = g["text_hash"].shift(1)
    prev_ts = g["warc_ts"].shift(1)
    seq_in_run = g.cumcount()

    # splice in carried state as the virtual "row 0" of each url
    if state is not None and len(state):
        # one state row per url regardless of input shape (defensive:
        # a duplicate key would silently misalign the merge)
        st = state.sort_values("last_ts").groupby("url", sort=False).tail(1)
        # dtype-preserving merge — Series.map would upcast the carried
        # int64 hash through float64 on any missing url, corrupting the
        # low bits and manufacturing phantom text_changed events
        st = st[["url", "last_text_hash", "last_ts", "content_rev", "cum_points", "cum_bytes"]]
        st["last_text_hash"] = st["last_text_hash"].astype("Int64")
        joined = obs[["url"]].merge(st, on="url", how="left")
        first = (seq_in_run == 0).to_numpy()
        prev_hash = prev_hash.copy()
        prev_hash[first] = joined.loc[first, "last_text_hash"].values
        prev_ts = prev_ts.copy()
        prev_ts[first] = joined.loc[first, "last_ts"].values
        base_rev = joined["content_rev"].fillna(0).astype("int64")
        base_pts = joined["cum_points"].fillna(0).astype("int64")
        base_bytes = joined["cum_bytes"].fillna(0).astype("int64")
    else:
        base_rev = pd.Series(0, index=obs.index, dtype="int64")
        base_pts = pd.Series(0, index=obs.index, dtype="int64")
        base_bytes = pd.Series(0, index=obs.index, dtype="int64")

    is_new = prev_hash.isna() & (seq_in_run == 0) & (base_pts == 0)
    text_changed = (prev_hash != obs["text_hash"]).fillna(False) & prev_hash.notna()
    gap = (obs["warc_ts"] - prev_ts).dt.total_seconds()
    expired = gap.notna() & (gap > ttl_seconds)

    out = pd.DataFrame(
        {
            "url": obs["url"],
            "warc_ts": obs["warc_ts"],
            "url_hash": obs["url_hash"],
            "lang": obs["lang"],
            "is_new": is_new,
            "text_changed": text_changed,
            "content_rev": base_rev + text_changed.groupby(obs["url"], sort=False).cumsum(),
            "gap_seconds": gap.round().astype("Int64"),
            "expired": expired,
            "cum_points": base_pts + seq_in_run + 1,
            "cum_bytes": base_bytes + g["html_len"].cumsum(),
            "text_hash": obs["text_hash"],
            "text_len": obs["text_len"],
            "html_len": obs["html_len"],
        }
    )
    return out


def _fold_windows(obs_st: DataFrame, ttl_seconds: int) -> DataFrame:
    """JVM window-function fold shared by both entry points.

    ``obs_st`` = observations left-joined with the (possibly empty)
    carried state as ``_st_hash/_st_ts/_st_rev/_st_pts/_st_bytes``.
    Every emitted quantity is a running per-url aggregate, so the whole
    fold stays in whole-stage codegen: lag() splices the carried state
    in as each url's virtual row 0, running sums carry content_rev /
    cum_bytes. No Arrow hop, no Python workers — the pandas
    ``_fold_frames`` is retained only as the differential-test
    reference (tests/test_fold.py::test_jvm_fold_matches_pandas_reference).

    ``bround`` (half-even) on gap_seconds matches numpy's rounding in
    the reference implementation bit-for-bit; ``expired`` compares the
    UNROUNDED microsecond gap, as the pandas form compared unrounded
    float seconds."""
    from pyspark.sql import Window

    wl = Window.partitionBy("url").orderBy("warc_ts")
    wrun = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = F.row_number().over(wl)
    prev_hash = F.coalesce(F.lag("text_hash").over(wl), F.col("_st_hash"))
    prev_us = F.coalesce(
        F.unix_micros(F.lag("warc_ts").over(wl)), F.unix_micros(F.col("_st_ts"))
    )
    base_rev = F.coalesce(F.col("_st_rev"), F.lit(0))
    base_pts = F.coalesce(F.col("_st_pts"), F.lit(0))
    base_bytes = F.coalesce(F.col("_st_bytes"), F.lit(0))
    text_changed = prev_hash.isNotNull() & (prev_hash != F.col("text_hash"))
    gap_us = F.unix_micros(F.col("warc_ts")) - prev_us
    return obs_st.select(
        "url",
        "warc_ts",
        "url_hash",
        "lang",
        (prev_hash.isNull() & (seq == 1) & (base_pts == F.lit(0))).alias("is_new"),
        text_changed.alias("text_changed"),
        (base_rev + F.sum(text_changed.cast("long")).over(wrun)).alias("content_rev"),
        F.bround(gap_us / 1_000_000.0, 0).cast("long").alias("gap_seconds"),
        (gap_us.isNotNull() & (gap_us > ttl_seconds * 1_000_000)).alias("expired"),
        (base_pts + seq).cast("long").alias("cum_points"),
        (base_bytes + F.sum("html_len").over(wrun)).alias("cum_bytes"),
        "text_hash",
        "text_len",
        "html_len",
    )


def _no_state_cols():
    # lazy: Column construction needs an active session (module import
    # must not)
    return [
        F.lit(None).cast("long").alias("_st_hash"),
        F.lit(None).cast("timestamp").alias("_st_ts"),
        F.lit(None).cast("long").alias("_st_rev"),
        F.lit(None).cast("long").alias("_st_pts"),
        F.lit(None).cast("long").alias("_st_bytes"),
    ]


def fold_observations(
    obs: DataFrame, ttl_seconds: int = DEFAULT_TTL_SECONDS
) -> DataFrame:
    """Cold-start fold (no prior state) — one url-keyed window shuffle,
    all codegen."""
    return _fold_windows(obs.select("*", *_no_state_cols()), ttl_seconds)


def fold_with_state(
    obs: DataFrame, state: DataFrame, ttl_seconds: int = DEFAULT_TTL_SECONDS
) -> DataFrame:
    """Incremental fold: the carried state joins on url (reference J1
    state-lookup join) and rides into each url's window as the virtual
    row 0. The join's hash partitioning on url satisfies the window's
    required distribution, so state splice + fold is ONE shuffle
    family."""
    # defensive last-wins per url (a duplicate state key would silently
    # misalign the splice — same guard the pandas reference had)
    st = state.groupBy("url").agg(
        F.max_by("last_text_hash", "last_ts").alias("_st_hash"),
        F.max("last_ts").alias("_st_ts"),
        F.max_by("content_rev", "last_ts").alias("_st_rev"),
        F.max_by("cum_points", "last_ts").alias("_st_pts"),
        F.max_by("cum_bytes", "last_ts").alias("_st_bytes"),
    )
    return _fold_windows(obs.join(st, "url", "left"), ttl_seconds)


def extract_state(fold_out: DataFrame) -> DataFrame:
    """Next-run state table: the last fold row per url. One groupBy with
    max_by — no window, no second shuffle beyond the agg.

    Keyed by url ONLY (one state row per url): ``lang`` is a per-row
    input attribute that can flap between crawls (langid noise); keying
    state on it would duplicate a url's state and break the fold's
    unique-index state splice."""
    return fold_out.groupBy("url", "url_hash").agg(
        F.max_by("lang", "warc_ts").alias("lang"),
        F.max("warc_ts").alias("last_ts"),
        F.max_by("text_hash", "warc_ts").alias("last_text_hash"),
        F.max("content_rev").alias("content_rev"),
        F.max("cum_points").alias("cum_points"),
        F.max("cum_bytes").alias("cum_bytes"),
    ).select("url", "url_hash", "lang", "last_ts", "last_text_hash",
             "content_rev", "cum_points", "cum_bytes")


def merge_state(old_state: DataFrame, new_state: DataFrame) -> DataFrame:
    """Next full state table = new state, plus old rows for urls the run
    did not touch (left_anti). The parquet analogue of Iceberg
    ``MERGE INTO state USING new ON url`` (reference S7 batched ledger
    upsert, storage.py:307-318)."""
    untouched = old_state.join(new_state, "url", "left_anti")
    return new_state.unionByName(untouched)
