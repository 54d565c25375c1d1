"""Stateful fold: golden single-process oracle + cross-run resumability.

The golden oracle is a direct per-row Python fold — the shape of the
reference's Transform loop (stake_history.py:62-133) re-keyed to url —
run on the collected pages. Spark's vectorized fold must match exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.fold import (
    extract_state,
    fold_observations,
    fold_with_state,
    merge_state,
    prepare_observations,
)

TTL = 3 * 86400


def _golden_fold(obs_pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-row reference-style fold (intentionally naive)."""
    state: dict = {}
    rows = []
    for r in obs_pdf.sort_values(["url", "warc_ts"]).itertuples():
        st = state.get(r.url)
        if st is None:
            is_new, changed, gap, expired = True, False, None, False
            rev, pts, byts = 0, 1, r.html_len
        else:
            is_new = False
            changed = st["hash"] != r.text_hash
            gap = (r.warc_ts - st["ts"]).total_seconds()
            expired = gap > TTL
            rev = st["rev"] + (1 if changed else 0)
            pts = st["pts"] + 1
            byts = st["bytes"] + r.html_len
        state[r.url] = {"hash": r.text_hash, "ts": r.warc_ts, "rev": rev, "pts": pts, "bytes": byts}
        rows.append(
            dict(url=r.url, warc_ts=r.warc_ts, is_new=is_new, text_changed=changed,
                 content_rev=rev, gap_seconds=None if gap is None else round(gap),
                 expired=expired, cum_points=pts, cum_bytes=byts)
        )
    return pd.DataFrame(rows).sort_values(["url", "warc_ts"], ignore_index=True)


@pytest.fixture(scope="module")
def obs(spark, pages):
    o = prepare_observations(pages, n_buckets=16).cache()
    o.count()
    return o


def test_fold_matches_golden(spark, pages, obs):
    got = (
        fold_observations(obs, ttl_seconds=TTL)
        .select("url", "warc_ts", "is_new", "text_changed", "content_rev",
                "gap_seconds", "expired", "cum_points", "cum_bytes")
        .toPandas()
        .sort_values(["url", "warc_ts"], ignore_index=True)
    )
    exp = _golden_fold(obs.toPandas())
    got["gap_seconds"] = got["gap_seconds"].astype("float64")
    exp["gap_seconds"] = exp["gap_seconds"].astype("float64")
    got["warc_ts"] = got["warc_ts"].astype("datetime64[us]")
    exp["warc_ts"] = exp["warc_ts"].astype("datetime64[us]")
    for c in ("content_rev", "cum_points", "cum_bytes"):
        got[c] = got[c].astype("int64")
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_split_run_equals_full_run(spark, obs):
    """fold(all) == fold(part2 | state(fold(part1))) — T1 resumability."""
    mid = obs.agg(F.percentile_approx("warc_ts", 0.5, 10000)).first()[0]
    part1 = obs.where(F.col("warc_ts") <= F.lit(mid))
    part2 = obs.where(F.col("warc_ts") > F.lit(mid))

    full = fold_observations(obs, ttl_seconds=TTL)
    state1 = extract_state(fold_observations(part1, ttl_seconds=TTL))
    run2 = fold_with_state(part2, state1, ttl_seconds=TTL)

    full_p2 = full.join(part2.select("url", "warc_ts").distinct(), ["url", "warc_ts"], "left_semi")
    cols = ["url", "warc_ts", "is_new", "text_changed", "content_rev",
            "gap_seconds", "expired", "cum_points", "cum_bytes"]
    a, b = run2.select(*cols), full_p2.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_merge_state_upsert(spark, obs):
    full_state = extract_state(fold_observations(obs))
    mid = obs.agg(F.percentile_approx("warc_ts", 0.5, 10000)).first()[0]
    part1 = obs.where(F.col("warc_ts") <= F.lit(mid))
    part2 = obs.where(F.col("warc_ts") > F.lit(mid))
    s1 = extract_state(fold_observations(part1))
    s2 = extract_state(fold_with_state(part2, s1))
    merged = merge_state(s1, s2)
    assert merged.exceptAll(full_state).count() == 0
    assert full_state.exceptAll(merged).count() == 0


def test_no_state_urls_are_new(spark, obs):
    out = fold_observations(obs)
    firsts = out.groupBy("url").agg(F.min("warc_ts").alias("t0"))
    j = out.join(firsts, "url").where(F.col("warc_ts") == F.col("t0"))
    assert j.where(~F.col("is_new")).count() == 0
    assert out.where(F.col("is_new") & F.col("gap_seconds").isNotNull()).count() == 0


def test_split_run_equals_full_run_any_split(spark, obs):
    """T1 resumability holds for ANY split point, not just the median —
    including a 3-way split chain (state threaded twice)."""
    for q1, q2 in ((0.2, 0.7), (0.05, 0.95), (0.5, 0.8)):
        t1 = obs.agg(F.percentile_approx("warc_ts", q1, 10000)).first()[0]
        t2 = obs.agg(F.percentile_approx("warc_ts", q2, 10000)).first()[0]
        p1 = obs.where(F.col("warc_ts") <= F.lit(t1))
        p2 = obs.where((F.col("warc_ts") > F.lit(t1)) & (F.col("warc_ts") <= F.lit(t2)))
        p3 = obs.where(F.col("warc_ts") > F.lit(t2))

        full = fold_observations(obs, ttl_seconds=TTL)
        s1 = extract_state(fold_observations(p1, ttl_seconds=TTL))
        r2 = fold_with_state(p2, s1, ttl_seconds=TTL)
        s2 = merge_state(s1, extract_state(r2))
        r3 = fold_with_state(p3, s2, ttl_seconds=TTL)

        full_p3 = full.join(p3.select("url", "warc_ts").distinct(), ["url", "warc_ts"], "left_semi")
        cols = ["url", "warc_ts", "is_new", "text_changed", "content_rev",
                "gap_seconds", "expired", "cum_points", "cum_bytes"]
        a, b = r3.select(*cols), full_p3.select(*cols)
        assert a.exceptAll(b).count() == 0, (q1, q2)
        assert b.exceptAll(a).count() == 0, (q1, q2)


def test_jvm_fold_matches_pandas_reference(spark):
    """The codegen window fold must match the retained pandas reference
    (_fold_frames) exactly — randomized urls/timestamps/hashes, both
    cold-start and state-spliced."""
    import random

    from chainalytic_framework_spark.operators.fold import _fold_frames

    rng = random.Random(7)
    rows = []
    for i in range(400):
        u = f"http://s{rng.randint(0, 20)}.test/p{rng.randint(0, 5)}"
        ts = 1_700_000_000 + rng.randint(0, 10 * 86400)
        rows.append((u, ts, hash(u) & ((1 << 62) - 1), "en",
                     rng.randint(-5, 5), rng.randint(10, 500),
                     rng.randint(100, 9000)))
    # dedupe (url, ts): duplicate timestamps make row order ambiguous in
    # BOTH implementations — not a semantics difference
    seen, uniq = set(), []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1])); uniq.append(r)
    pdf = pd.DataFrame(uniq, columns=["url", "_ts", "url_hash", "lang",
                                      "text_hash", "text_len", "html_len"])
    pdf["warc_ts"] = pd.to_datetime(pdf["_ts"], unit="s")
    pdf = pdf.drop(columns=["_ts"])

    sdf = spark.createDataFrame(
        pdf, "url string, url_hash long, lang string, text_hash long, "
             "text_len long, html_len long, warc_ts timestamp")
    cut = pd.Timestamp(1_700_000_000 + 5 * 86400, unit="s")
    p1, p2 = sdf.where(F.col("warc_ts") < F.lit(cut)), sdf.where(F.col("warc_ts") >= F.lit(cut))

    cols = ["url", "warc_ts", "is_new", "text_changed", "content_rev",
            "gap_seconds", "expired", "cum_points", "cum_bytes"]

    def canon(df):
        return [tuple(r) for r in
                df.select(cols).orderBy("url", "warc_ts").collect()]

    # cold start
    exp_cold = _fold_frames(pdf.copy(), None, TTL)
    got_cold = canon(fold_observations(sdf, ttl_seconds=TTL))
    exp_rows = [tuple(r) for _, r in
                exp_cold.sort_values(["url", "warc_ts"])[cols].iterrows()]
    assert len(got_cold) == len(exp_rows)
    for g, e in zip(got_cold, exp_rows):
        for gv, ev in zip(g, e):
            assert (pd.isna(ev) and gv is None) or gv == ev, (g, e)

    # state-spliced second run equals the pandas reference fed the same state
    st = extract_state(fold_observations(p1, ttl_seconds=TTL))
    got_inc = canon(fold_with_state(p2, st, ttl_seconds=TTL))
    exp_inc = _fold_frames(p2.toPandas(), st.toPandas(), TTL)
    exp_rows2 = [tuple(r) for _, r in
                 exp_inc.sort_values(["url", "warc_ts"])[cols].iterrows()]
    assert len(got_inc) == len(exp_rows2) and len(got_inc) > 0
    for g, e in zip(got_inc, exp_rows2):
        for gv, ev in zip(g, e):
            assert (pd.isna(ev) and gv is None) or gv == ev, (g, e)
