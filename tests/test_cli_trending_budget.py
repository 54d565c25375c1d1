"""CLI integration: serve-trending (routed decay top-k) and
crawl-plan --budget (rationed fetch slots)."""

from __future__ import annotations

import io
import json
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.__main__ import main

T0 = 1704067200  # 2024-01-01, the synth window start
T1 = 1704672000  # 2024-01-08


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli_tb")
    pages_out = str(base / "pages")
    wh = str(base / "wh")
    main(["synth", "--rows", "3000", "--out", pages_out])
    main(["run", "--input", pages_out, "--warehouse", wh,
          "--snapshot-id", "s1"])
    return wh


def _run_cli(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(argv)
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_serve_trending_matches_tier_math(spark, warehouse):
    out = _run_cli(["serve-trending", "--warehouse", warehouse,
                    "--t0", str(T0), "--t1", str(T1), "--grain", "1h",
                    "--keys", "lang", "--half-life", "86400", "--k", "5"])
    rows = out["rows"]
    assert rows and len(rows) <= 5
    # independent replay from the stored 1h tier in local python
    from chainalytic_framework_spark.tables import TableStore

    tier = TableStore(spark, warehouse).read("tier_1h").select(
        "lang",
        F.col("bucket_start").cast("timestamp").cast("long").alias("te"),
        "point_count",
    ).collect()
    # tier rows are url-grain; the router aggregates to (lang, bucket)
    # before the decay, so collapse buckets first (the decay term is
    # linear, n_raw counts SERIES rows)
    per_bucket: dict[tuple[str, int], int] = {}
    for r in tier:
        if not (T0 <= r["te"] < T1):
            continue
        kb = (r["lang"], r["te"])
        per_bucket[kb] = per_bucket.get(kb, 0) + r["point_count"]
    scores: dict[str, float] = {}
    counts: dict[str, int] = {}
    for (lang, te), cnt in per_bucket.items():
        scores[lang] = scores.get(lang, 0.0) + cnt * 2.0 ** ((te - T1) / 86400.0)
        counts[lang] = counts.get(lang, 0) + 1
    expect = sorted(
        ((int(round(s * 10000)), k) for k, s in scores.items()),
        key=lambda t: (-t[0], t[1]),
    )[:5]
    got = [(r["score_x1e4"], r["lang"]) for r in rows]
    assert got == expect
    for r in rows:
        assert r["n_raw"] == counts[r["lang"]]
    # scores strictly ordered by the deterministic (score desc, key) rule
    assert got == sorted(got, key=lambda t: (-t[0], t[1]))


def test_crawl_plan_budget_rations_and_defers(spark, warehouse):
    full = _run_cli(["crawl-plan", "--warehouse", warehouse,
                     "--gap", "60", "--limit", "1"])
    n_total = full["n_urls"]
    assert n_total > 10
    budget = max(1, n_total // 3)
    out = _run_cli(["crawl-plan", "--warehouse", warehouse, "--gap", "60",
                    "--budget", str(budget), "--limit", "100000"])
    assert out["budget"] == budget
    # exactly budget slots scheduled (quotas sum to the budget, and every
    # host here has >= its quota of due urls at this cut), rest deferred
    assert out["n_urls"] + out["n_deferred"] == n_total
    assert out["n_urls"] <= budget
    # per-host politeness ranks within a host's kept set stay the first
    # consecutive ranks 1..quota — the earliest fetches survive the cut
    by_host: dict[str, list[int]] = {}
    for r in out["rows"]:
        by_host.setdefault(r["host"], []).append(r["fetch_rank"])
    for ranks in by_host.values():
        ranks.sort()
        assert ranks == list(range(1, len(ranks) + 1))
