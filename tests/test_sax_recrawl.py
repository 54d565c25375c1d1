"""SAX symbolic index, lead-lag xcorr, recrawl scheduling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.recrawl import recrawl_schedule
from chainalytic_framework_spark.operators.rolling import lead_lag_xcorr
from chainalytic_framework_spark.operators.sax import (
    paa_segments,
    sax_motifs,
    sax_words,
)


def _series(spark, rows):
    return spark.createDataFrame(rows, "k string, t long, v long")


# ---------------------------------------------------------------- SAX


def test_paa_exact_means(spark):
    # 8 points, 4 segments -> 2 points each; means exact in x1e4.
    rows = [("a", i, v) for i, v in enumerate([0, 10, 20, 30, 40, 50, 60, 71])]
    out = paa_segments(_series(spark, rows), ["k"], "t", "v", n_segments=4)
    got = {r["seg"]: (r["n_pts"], r["paa_x1e4"]) for r in out.collect()}
    assert got == {
        0: (2, 50000),
        1: (2, 250000),
        2: (2, 450000),
        3: (2, 655000),  # (60+71)/2 = 65.5
    }


def test_paa_short_series_short_word(spark):
    # 3 points into 8 segments: segs {0, 2, 5}; word length 3.
    rows = [("a", 0, 1), ("a", 1, 2), ("a", 2, 3)]
    paa = paa_segments(_series(spark, rows), ["k"], "t", "v", n_segments=8)
    assert {r["seg"] for r in paa.collect()} == {0, 2, 5}
    w = sax_words(paa, ["k"]).collect()[0]
    assert w["n_segs"] == 3 and len(w["word"]) == 3


def test_sax_word_encodes_shape_not_level(spark):
    # Same shape at different levels/scales -> same word.
    base = [0, 0, 100, 100, 0, 0, 100, 100]
    rows = [("cheap", i, v) for i, v in enumerate(base)]
    rows += [("dear", i, 5000 + 10 * v) for i, v in enumerate(base)]
    paa = paa_segments(_series(spark, rows), ["k"], "t", "v", n_segments=8)
    words = {r["k"]: r["word"] for r in sax_words(paa, ["k"], alphabet=4).collect()}
    assert words["cheap"] == words["dear"]
    assert set(words["cheap"]) == {"a", "d"}


def test_sax_flat_series_all_a(spark):
    rows = [("f", i, 7) for i in range(8)]
    paa = paa_segments(_series(spark, rows), ["k"], "t", "v", n_segments=4)
    w = sax_words(paa, ["k"], alphabet=4).collect()[0]
    assert w["word"] == "aaaa"  # mx==mn -> sym 0, no div-by-zero


def test_sax_symbol_range_bounds(spark):
    # Max paa must land on the LAST letter, never out of range.
    rows = [("a", i, v) for i, v in enumerate([0, 1, 2, 3])]
    paa = paa_segments(_series(spark, rows), ["k"], "t", "v", n_segments=4)
    w = sax_words(paa, ["k"], alphabet=4).collect()[0]
    assert w["word"][0] == "a" and w["word"][-1] == "d"


def test_sax_motifs_groups(spark):
    base = [0, 0, 100, 100]
    rows = []
    for k in ("a", "b", "c"):
        rows += [(k, i, v) for i, v in enumerate(base)]
    rows += [("solo", i, v) for i, v in enumerate([100, 0, 0, 100])]
    paa = paa_segments(_series(spark, rows), ["k"], "t", "v", n_segments=4)
    words = sax_words(paa, ["k"], alphabet=2)
    motifs = sax_motifs(words, min_keys=2).collect()
    assert len(motifs) == 1
    assert motifs[0]["n_keys"] == 3  # solo's reversed shape is excluded


def test_sax_parallelism_invariance(spark):
    rng = np.random.RandomState(7)
    rows = [
        (f"k{k}", int(t), int(rng.randint(0, 1000)))
        for k in range(20)
        for t in range(50)
    ]
    df = _series(spark, rows)
    paa1 = paa_segments(df.repartition(1), ["k"], "t", "v")
    paa8 = paa_segments(df.repartition(8), ["k"], "t", "v")
    w1 = {r["k"]: r["word"] for r in sax_words(paa1, ["k"]).collect()}
    w8 = {r["k"]: r["word"] for r in sax_words(paa8, ["k"]).collect()}
    assert w1 == w8


# ---------------------------------------------------------- lead-lag


def test_lead_lag_xcorr_detects_direction(spark):
    # y is x shifted one bucket later: corr(x_t, y_{t+1}) == 1 exactly.
    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [("x", t, v) for t, v in enumerate(xs)]
    rows += [("y", t + 1, v) for t, v in enumerate(xs)]
    out = lead_lag_xcorr(_series(spark, rows), "k", "t", "v", lag_units=1)
    got = {(r["ka"], r["kb"]): r for r in out.collect()}
    fwd = got[("x", "y")]
    assert fwd["num"] ** 2 == fwd["den1"] * fwd["den2"]  # r^2 == 1
    assert fwd["r_sign"] == 1
    rev = got[("y", "x")]
    assert rev["num"] ** 2 < rev["den1"] * rev["den2"]  # shifted wrong way


def test_lead_lag_matches_numpy(spark):
    rng = np.random.RandomState(11)
    xs = rng.randint(0, 500, 40)
    ys = rng.randint(0, 500, 40)
    rows = [("x", t, int(v)) for t, v in enumerate(xs)]
    rows += [("y", t, int(v)) for t, v in enumerate(ys)]
    out = lead_lag_xcorr(_series(spark, rows), "k", "t", "v", lag_units=3)
    r = [x for x in out.collect() if x["ka"] == "x"][0]
    # aligned: x_t vs y_{t+3} for t in 0..36
    expect = np.corrcoef(xs[:-3], ys[3:])[0, 1]
    assert r["n"] == 37
    got = r["r_sign"] * np.sqrt(r["r2"])
    assert got == pytest.approx(expect, abs=1e-12)


# ----------------------------------------------------------- recrawl


def _obs(spark, rows):
    return spark.createDataFrame(rows, "url string, t long, fp long")


def test_recrawl_ratio_estimator(spark):
    # 5 visits over 4000s, 2 changes -> interval = 4000 // 2 = 2000.
    rows = [
        ("u", 0, 1),
        ("u", 1000, 1),
        ("u", 2000, 2),  # change
        ("u", 3000, 2),
        ("u", 4000, 3),  # change
    ]
    r = recrawl_schedule(
        _obs(spark, rows), ["url"], "t", "fp", min_interval=100, max_interval=10**9
    ).collect()[0]
    assert (r["n_obs"], r["n_changes"], r["span_seconds"]) == (5, 2, 4000)
    assert r["interval_seconds"] == 2000
    assert r["next_due_epoch"] == 6000


def test_recrawl_never_changed_gets_max(spark):
    rows = [("u", 0, 7), ("u", 5000, 7), ("u", 9000, 7)]
    r = recrawl_schedule(
        _obs(spark, rows), ["url"], "t", "fp", min_interval=60, max_interval=86400
    ).collect()[0]
    assert r["n_changes"] == 0
    assert r["interval_seconds"] == 86400
    assert r["next_due_epoch"] == 9000 + 86400


def test_recrawl_clamps(spark):
    # Changes every visit over a short span -> clamped up to min.
    rows = [("hot", t, t) for t in range(0, 50, 10)]
    # single visit -> span 0, no changes -> max.
    rows += [("once", 123, 9)]
    out = {
        r["url"]: r
        for r in recrawl_schedule(
            _obs(spark, rows), ["url"], "t", "fp", min_interval=3600,
            max_interval=86400,
        ).collect()
    }
    assert out["hot"]["interval_seconds"] == 3600  # 40//4=10 -> clamp 3600
    assert out["once"]["n_obs"] == 1
    assert out["once"]["interval_seconds"] == 86400


def test_recrawl_first_visit_not_a_change(spark):
    rows = [("u", 0, 1), ("u", 100, 2)]
    r = recrawl_schedule(
        _obs(spark, rows), ["url"], "t", "fp", min_interval=1, max_interval=10**6
    ).collect()[0]
    assert r["n_changes"] == 1  # not 2


def test_motif_verify_pairs_end_to_end(spark):
    from chainalytic_framework_spark.operators.sax import motif_verify_pairs

    base = [0, 0, 100, 100, 0, 0, 100, 100]
    rows = [("a", i, v) for i, v in enumerate(base)]
    rows += [("b", i, 10 * v + 5) for i, v in enumerate(base)]  # same shape
    rows += [("c", i, v) for i, v in enumerate(reversed(base))]  # different
    df = _series(spark, rows)
    paa = paa_segments(df, ["k"], "t", "v", n_segments=4)
    words = sax_words(paa, ["k"], alphabet=2)
    out = motif_verify_pairs(words, df, ["k"], "t", "v").collect()
    got = {(r["ka"], r["kb"]): r for r in out}
    # a/b share a word (same shape); c's reversed word differs, so the
    # (a,c)/(b,c) pairs are never even CANDIDATES — banding pruned them.
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["n"] == 8
    assert r["num"] ** 2 == r["den1"] * r["den2"]  # exact r^2 == 1


def test_politeness_schedule_matches_greedy_reference(spark):
    from chainalytic_framework_spark.operators.recrawl import politeness_schedule

    import numpy as np

    rng = np.random.RandomState(19)
    rows = []
    for h in range(4):
        for u in range(25):
            rows.append((f"u{h}_{u}", h, int(rng.randint(0, 5000))))
    df = spark.createDataFrame(rows, "url string, host int, due long")
    out = politeness_schedule(df, "host", "due", ["url"], gap_seconds=300)
    got = {(r["host"], r["url"]): r["fetch_epoch"] for r in out.collect()}
    # brute-force greedy per host: fetch_i = max(due_i, fetch_{i-1}+gap)
    byhost: dict[int, list] = {}
    for url, h, due in rows:
        byhost.setdefault(h, []).append((due, url))
    for h, lst in byhost.items():
        prev = None
        for due, url in sorted(lst):
            f = due if prev is None else max(due, prev + 300)
            assert got[(h, url)] == f, (h, url, got[(h, url)], f)
            prev = f


def test_politeness_gap_and_due_invariants(spark):
    from chainalytic_framework_spark.operators.recrawl import politeness_schedule

    rows = [(f"u{i}", 1, 1000) for i in range(10)]  # all due at once
    df = spark.createDataFrame(rows, "url string, host int, due long")
    out = politeness_schedule(df, "host", "due", ["url"], gap_seconds=60)
    rs = sorted(out.collect(), key=lambda r: r["fetch_epoch"])
    assert [r["fetch_epoch"] for r in rs] == [1000 + 60 * i for i in range(10)]
    assert all(r["fetch_epoch"] >= r["due_epoch"] for r in rs)
    assert rs[-1]["delay_seconds"] == 540
    # ties broken by url: rank order is deterministic
    assert [r["url"] for r in rs] == sorted(f"u{i}" for i in range(10))


def test_politeness_idle_host_no_delay(spark):
    from chainalytic_framework_spark.operators.recrawl import politeness_schedule

    rows = [("a", 1, 0), ("b", 1, 10_000), ("c", 1, 20_000)]
    df = spark.createDataFrame(rows, "url string, host int, due long")
    out = {r["url"]: r for r in politeness_schedule(
        df, "host", "due", ["url"], gap_seconds=300).collect()}
    assert all(out[u]["delay_seconds"] == 0 for u in "abc")


# ------------------------------------------------------------- robots


def _robots(spark, host_txt):
    return spark.createDataFrame(list(host_txt.items()), "host string, txt string")


def test_parse_robots_agent_groups(spark):
    from chainalytic_framework_spark.operators.robots import parse_robots

    txt = (
        "User-agent: googlebot\n"
        "User-agent: *\n"          # consecutive UA lines share ONE group
        "Disallow: /a\n"
        "\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
    )
    rules = parse_robots(_robots(spark, {"h": txt}), "host", "txt").collect()
    assert {(r["rule"], r["prefix"]) for r in rules} == {("disallow", "/a")}
    # the badbot group's rule must not leak into agent '*'


def test_parse_robots_rule_after_second_group(spark):
    from chainalytic_framework_spark.operators.robots import parse_robots

    txt = (
        "User-agent: bot\nDisallow: /x\n"
        "User-agent: *\nAllow: /ok\nDisallow: /no\n"
    )
    rules = parse_robots(_robots(spark, {"h": txt}), "host", "txt").collect()
    assert {(r["rule"], r["prefix"]) for r in rules} == {
        ("allow", "/ok"), ("disallow", "/no"),
    }


def test_parse_robots_comments_case_whitespace(spark):
    from chainalytic_framework_spark.operators.robots import parse_robots

    txt = (
        "# top comment\n"
        "USER-AGENT: *   \n"
        "  DisAllow :  /weird   # inline comment\n"
        "Allow: /w  \n"
    )
    # lenient grammar like the major crawlers: leading whitespace,
    # whitespace before the colon, inline comments, any case
    rules = parse_robots(_robots(spark, {"h": txt}), "host", "txt").collect()
    assert {(r["rule"], r["prefix"]) for r in rules} == {
        ("disallow", "/weird"), ("allow", "/w"),
    }


def test_robots_allowed_longest_match_and_tie(spark):
    from chainalytic_framework_spark.operators.robots import (
        parse_robots,
        robots_allowed,
    )

    txt = (
        "User-agent: *\n"
        "Disallow: /p\n"
        "Allow: /p/ok\n"
        "Allow: /q\n"     # same length as the disallow below: allow wins
        "Disallow: /q\n"
    )
    rules = parse_robots(_robots(spark, {"h": txt}), "host", "txt")
    frontier = spark.createDataFrame(
        [("u1", "h", "/p/x"), ("u2", "h", "/p/ok/y"), ("u3", "h", "/q/z"),
         ("u4", "h", "/free"), ("u5", "other", "/p/x")],
        "url string, host string, path string",
    )
    out = {r["url"]: r for r in
           robots_allowed(frontier, rules, "host", "path").collect()}
    assert out["u1"]["allowed"] is False
    assert out["u2"]["allowed"] is True and out["u2"]["matched_prefix"] == "/p/ok"
    assert out["u3"]["allowed"] is True  # length tie -> allow wins
    assert out["u4"]["allowed"] is True and out["u4"]["matched_rule"] is None
    assert out["u5"]["allowed"] is True  # no rules for that host


# ------------------------------------------------------------ sitemap


def test_parse_sitemap_forms(spark):
    from chainalytic_framework_spark.operators.sitemap import parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc>https://h/a</loc><lastmod>2024-02-01</lastmod></url>"
        "<url><loc> https://h/b </loc>"
        "<lastmod>2024-02-01T12:30:05+02:00</lastmod></url>"
        "<url><loc>https://h/c</loc></url>"              # no lastmod
        "<url><lastmod>2024-01-01</lastmod></url>"        # no loc: dropped
        "<url><loc>https://h/d</loc><lastmod>soon</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([("h", xml)], "host string, xml string")
    out = {r["loc"]: r["lastmod_epoch"]
           for r in parse_sitemap(df, "host", "xml").collect()}
    assert set(out) == {"https://h/a", "https://h/b", "https://h/c",
                        "https://h/d"}
    assert out["https://h/a"] == 1706745600            # midnight UTC
    # +02:00 designator subtracted: normalized to true UTC
    assert out["https://h/b"] == 1706745600 + 12 * 3600 + 30 * 60 + 5 - 7200
    assert out["https://h/c"] is None
    assert out["https://h/d"] is None                   # unparseable


def test_seed_frontier_classification(spark):
    from chainalytic_framework_spark.operators.sitemap import seed_frontier

    entries = spark.createDataFrame(
        [("h", "u1", 100), ("h", "u2", 300), ("h", "u3", None),
         ("h", "u4", 50)],
        "host string, loc string, lastmod_epoch long",
    )
    known = spark.createDataFrame(
        [("u2", 200), ("u3", 200), ("u4", 200)],
        "loc string, last_fetch_epoch long",
    )
    out = {r["loc"]: r["reason"] for r in
           seed_frontier(entries, known).collect()}
    assert out == {"u1": "new", "u2": "stale", "u3": "fresh", "u4": "fresh"}


def test_robots_wildcard_disallow_fail_closed_and_dups_preserved(spark):
    from chainalytic_framework_spark.operators.robots import (
        parse_robots,
        robots_allowed,
    )

    txt = (
        "User-agent: *\n"
        "Disallow: /private*\n"      # wildcard: matches by stem, blocks
        "Allow: /pub*\n"             # wildcard allow: ignored (no widen)
        "Disallow: /pub\n"
    )
    rules = parse_robots(_robots(spark, {"h": txt}), "host", "txt")
    got = {(r["rule"], r["prefix"], r["is_wildcard"]) for r in rules.collect()}
    assert got == {("disallow", "/private*", True),
                   ("allow", "/pub*", True),
                   ("disallow", "/pub", False)}
    frontier = spark.createDataFrame(
        [("u1", "h", "/private/x"), ("u2", "h", "/pub/y"),
         ("u2", "h", "/pub/y"), ("u3", "h", "/free")],  # u2 duplicated
        "url string, host string, path string",
    )
    out = robots_allowed(frontier, rules, "host", "path").collect()
    assert len(out) == 4  # duplicate frontier rows are preserved
    by = {}
    for r in out:
        by.setdefault(r["url"], []).append(r)
    assert all(not r["allowed"] for r in by["u1"])  # stem '/private' blocks
    assert all(not r["allowed"] for r in by["u2"])  # wildcard allow ignored
    assert len(by["u2"]) == 2
    assert by["u3"][0]["allowed"] is True
