"""Round-5 closing operators: trimmed mean, tier coverage, shingle
containment, dedup cluster-size histogram."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.components import (
    cluster_size_histogram,
)
from chainalytic_framework_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from chainalytic_framework_spark.operators.robust import trimmed_mean
from chainalytic_framework_spark.operators.states import tier_coverage


def test_trimmed_mean_known_values(spark):
    # group g: cents 1..10, k = floor(10*10/100) = 1 → keep ranks 2..9
    rows = [("g", v, v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, cents long, tie long")
    out = trimmed_mean(df, ["grp"], "cents", "tie", trim_pct=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["n_kept"], r["kept_sum"]) == (10, 8, sum(range(2, 10)))
    assert r["trimmed_mean_x100"] == (44 * 100) // 8  # 550


def test_trimmed_mean_ignores_outlier_and_zero_trim_keeps_all(spark):
    rows = [("g", v, v) for v in range(1, 10)] + [("g", 10**9, 99)]
    df = spark.createDataFrame(rows, "grp string, cents long, tie long")
    r = trimmed_mean(df, ["grp"], "cents", "tie", trim_pct=10).collect()[0]
    # the 10^9 outlier is the trimmed top rank; rank 1 (value 1) trimmed low
    assert r["kept_sum"] == sum(range(2, 10))
    full = trimmed_mean(df, ["grp"], "cents", "tie", trim_pct=0).collect()[0]
    assert full["n_kept"] == 10 and full["kept_sum"] == sum(range(1, 10)) + 10**9


def test_trimmed_mean_ties_break_on_tie_col_and_small_groups(spark):
    # all-equal values: trim must still drop exactly k per side (by tie)
    rows = [("g", 5, t) for t in range(10)] + [("h", 7, 0)]
    df = spark.createDataFrame(rows, "grp string, cents long, tie long")
    out = {r["grp"]: r for r in trimmed_mean(df, ["grp"], "cents", "tie").collect()}
    assert out["g"]["n_kept"] == 8 and out["g"]["kept_sum"] == 40
    # singleton group: k=0, survives
    assert out["h"]["n_kept"] == 1 and out["h"]["trimmed_mean_x100"] == 700
    with pytest.raises(ValueError):
        trimmed_mean(df, ["grp"], "cents", "tie", trim_pct=50)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)) for t, m in rows],
        "event_type string, ts timestamp",
    )


def test_tier_coverage_sparse_day_edges(spark):
    # type A present at minutes 0 and 5 only
    out = tier_coverage(_ev(spark, [("A", 0), ("A", 5), ("A", 5)]),
                        ["event_type"], "ts").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_present"] == 2 and r["expected"] == 1440
    assert r["coverage_x1e4"] == (2 * 10000) // 1440
    # internal gap before minute 5 is 4; trailing run is 1439-5 = 1434
    assert r["longest_missing_buckets"] == 1434


def test_tier_coverage_full_day_and_leading_gap(spark):
    full = [("F", m) for m in range(1440)]
    late = [("L", m) for m in range(720, 1440)]  # first half missing
    out = {r["event_type"]: r
           for r in tier_coverage(_ev(spark, full + late),
                                  ["event_type"], "ts").collect()}
    assert out["F"]["coverage_x1e4"] == 10000
    assert out["F"]["longest_missing_buckets"] == 0
    assert out["L"]["n_present"] == 720
    assert out["L"]["longest_missing_buckets"] == 720  # leading run


def test_tier_coverage_multi_day_split(spark):
    rows = [("A", 0), ("A", 1440)]  # one event each on two days
    out = tier_coverage(_ev(spark, rows), ["event_type"], "ts").collect()
    assert len(out) == 2  # days never merge
    assert all(r["n_present"] == 1 for r in out)


def _docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    return spark.createDataFrame(
        [
            (1, base),                              # contained in 2
            (2, base + " iota kappa lambda mu nu xi omicron pi rho sigma"),
            (3, "tau upsilon phi chi psi omega one two"),
        ],
        "doc_id long, text string",
    )


def test_containment_subset_doc_scores_10000(spark):
    out = {(r["id_a"], r["id_b"]): r
           for r in containment_pairs(_docs(spark)).collect()}
    r = out[(1, 2)]
    # every shingle of doc 1 appears in doc 2
    assert r["cont_a_in_b_x1e4"] == 10000
    assert r["cont_b_in_a_x1e4"] < 10000
    assert (1, 3) not in out and (2, 3) not in out  # below min_inter


def test_containment_dominates_jaccard(spark):
    docs = _docs(spark)
    cont = containment_pairs(docs)
    pairs = cont.select("id_a", "id_b")
    jac = ngram_jaccard_pairs(docs, pairs)
    joined = cont.join(jac, ["id_a", "id_b"]).select(
        "cont_a_in_b_x1e4", "cont_b_in_a_x1e4",
        F.round(F.col("jaccard") * 10000).cast("long").alias("j"),
    )
    for r in joined.collect():
        # containment normalizes by one set, Jaccard by the union ⊇ it
        assert max(r["cont_a_in_b_x1e4"], r["cont_b_in_a_x1e4"]) >= r["j"] - 1


def test_cluster_size_histogram_partitions_corpus(spark):
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4), (5, 4), (6, 4)],
        "doc_id long, group_id long",
    )
    out = {r["group_size"]: r for r in cluster_size_histogram(groups).collect()}
    assert out[2]["n_groups"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_groups"] == 1
    assert out[3]["n_groups"] == 1 and out[3]["n_docs"] == 3
    assert sum(r["n_docs"] for r in out.values()) == 6


def test_containment_candidate_path_matches_raw(spark):
    docs = _docs(spark)
    raw = containment_pairs(docs, min_inter=1)
    cands = raw.select("id_a", "id_b")
    fed = containment_pairs(docs, min_inter=1, pairs=cands)
    a = {tuple(r) for r in raw.collect()}
    b = {tuple(r) for r in fed.collect()}
    assert a == b
    # restricting candidates restricts output to exactly those pairs
    one = containment_pairs(
        docs, min_inter=1,
        pairs=spark.createDataFrame([(1, 2)], "id_a long, id_b long"),
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in one] == [(1, 2)]


def test_cli_serve_coverage(spark, tmp_path):
    """serve-coverage: per-(lang, day) grid completeness over the stored
    1m tier; coverage and missing-run fields are internally consistent."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from chainalytic_framework_spark.__main__ import main
    from chainalytic_framework_spark.tables import TableStore

    pages_out = str(tmp_path / "pages")
    wh = str(tmp_path / "wh")
    main(["synth", "--rows", "2000", "--out", pages_out])
    main(["run", "--input", pages_out, "--warehouse", wh,
          "--snapshot-id", "s1"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        # explicit large limit: the present-sum identity below needs the
        # FULL table, not the default worst-100 cut
        main(["serve-coverage", "--warehouse", wh, "--grain", "1m",
              "--keys", "lang", "--limit", "100000"])
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["rows"], "coverage table must not be empty"
    store = TableStore(spark, wh)
    n_tier_rows = store.read("tier_1m").select("lang", "bucket_start") \
        .distinct().count()
    assert sum(r["n_present"] for r in out["rows"]) == n_tier_rows
    for r in out["rows"]:
        assert 0 < r["n_present"] <= r["expected"] == 1440
        assert r["coverage_x1e4"] == r["n_present"] * 10000 // 1440
        # the worst missing run can never exceed the missing total
        assert r["longest_missing_buckets"] <= 1440 - r["n_present"]
        if r["n_present"] == 1440:
            assert r["longest_missing_buckets"] == 0


def test_tier_coverage_rejects_coarse_or_nondividing_tier(spark):
    ev = _ev(spark, [("A", 0)])
    with pytest.raises(ValueError):
        tier_coverage(ev, ["event_type"], "ts", tier_secs=2592000)
    with pytest.raises(ValueError):
        tier_coverage(ev, ["event_type"], "ts", tier_secs=7000)  # !| 86400
    # coarse tier with a matching period is fine: presence per window
    out = tier_coverage(ev, ["event_type"], "ts",
                        tier_secs=2592000, day_secs=2592000).collect()
    assert out[0]["expected"] == 1 and out[0]["coverage_x1e4"] == 10000


def test_cli_serve_coverage_snaps_range_to_whole_days(spark, tmp_path):
    """A mid-day --t0 must not fabricate missing runs at the window edge:
    the filter snaps OUT to whole periods, so a fully-covered day reports
    identically with and without the range."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from chainalytic_framework_spark.__main__ import main
    from chainalytic_framework_spark.tables import TableStore

    pages_out = str(tmp_path / "pages")
    wh = str(tmp_path / "wh")
    main(["synth", "--rows", "2000", "--out", pages_out])
    main(["run", "--input", pages_out, "--warehouse", wh,
          "--snapshot-id", "s1"])
    from pyspark.sql import functions as F
    store = TableStore(spark, wh)
    days = [r[0] for r in store.read("tier_1m")
            .select((F.floor(F.col("bucket_start").cast("timestamp")
                             .cast("long") / 86400) * 86400)
                    .cast("long").alias("d")).distinct().collect()]
    day = sorted(days)[len(days) // 2]

    def run_cov(argv):
        buf = io.StringIO()
        with redirect_stdout(buf):
            main(argv)
        return _json.loads(buf.getvalue().strip().splitlines()[-1])

    base = ["serve-coverage", "--warehouse", wh, "--grain", "1m",
            "--keys", "lang", "--limit", "100000"]
    full = {(r["lang"], r["day_epoch"]): r for r in run_cov(base)["rows"]}
    # t0 at noon of `day`, t1 at 18:00: must snap out to the whole day
    cut = run_cov(base + ["--t0", str(day + 43200),
                          "--t1", str(day + 64800)])["rows"]
    assert cut, "snapped window must still cover the full day"
    for r in cut:
        assert r["day_epoch"] == day
        assert r == {k: v for k, v in
                     full[(r["lang"], day)].items()}  # identical rows
