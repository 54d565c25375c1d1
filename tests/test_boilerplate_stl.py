"""Unit tests for the round-5 closing additions: host-level boilerplate
removal (operators/boilerplate.py) and STL-lite seasonal decomposition
(operators/trend.py::stl_decompose). Both are also DuckDB-oracle-paired
in the contract (boilerplate_strip_documents / stl_daily_events); these
tests pin the closed-form semantics the oracle can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.boilerplate import boilerplate_strip
from chainalytic_framework_spark.operators.trend import stl_decompose


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


FOOTER = "copyright acme corp all rights reserved"  # 6-token template


def test_boilerplate_footer_cut_byte_exact(spark):
    """A 6-token footer on 8/10 docs of one host is cut; surrounding
    text reassembles byte-exactly; the 2 footer-free docs and the other
    host pass through unchanged."""
    rows = []
    for i in range(10):
        # body ends in doc-unique tokens so spans STRADDLING the
        # body/footer boundary stay df=1 (a shared body suffix would
        # legitimately make straddling spans frequent too)
        body = f"unique body number {i} alpha{i} beta{i} gamma{i}"
        text = f"{body} {FOOTER}" if i < 8 else body
        rows.append((i, text, "hostA"))
    # hostB: same footer but only 2/6 docs -> below ceil(6/2)=3 threshold
    for i in range(6):
        body = f"other host body {i} entirely different content here"
        text = f"{body} {FOOTER}" if i < 2 else body
        rows.append((100 + i, text, "hostB"))
    out = boilerplate_strip(
        _docs(spark, rows), w=6, frac_num=1, frac_den=2, min_docs=5
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 16  # every doc emits exactly one row
    for i in range(8):
        assert got[i]["text"] == f"unique body number {i} alpha{i} beta{i} gamma{i}"
        assert got[i]["n_tokens_dropped"] == 6
    for i in (8, 9):
        assert got[i]["n_tokens_dropped"] == 0
    for i in range(6):
        r = got[100 + i]
        assert r["n_tokens_dropped"] == 0  # hostB below frequency threshold
        assert r["text"].startswith("other host body")


def test_boilerplate_min_docs_gate(spark):
    """A host with < min_docs docs never strips, even at 100% df."""
    rows = [(i, f"{FOOTER} tail {i}", "tiny") for i in range(4)]
    out = boilerplate_strip(
        _docs(spark, rows), w=6, frac_num=1, frac_den=2, min_docs=5
    )
    assert all(r["n_tokens_dropped"] == 0 for r in out.collect())


def test_boilerplate_threshold_is_integer_ceil(spark):
    """ceil(frac·nd) edge: nd=5, frac=2/5 -> thr=2 exactly (integer
    arithmetic, not IEEE ceil). df=2 strips, df=1 does not."""
    rows = []
    for i in range(5):
        parts = [f"solo{i} filler words here"]
        if i < 2:
            parts.append("shared pair")
        if i < 1:
            parts.append("lonely gram")
        rows.append((i, " ".join(parts), "h"))
    out = boilerplate_strip(
        _docs(spark, rows), w=2, frac_num=2, frac_den=5, min_docs=5
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # "shared pair" (df=2 >= 2) cut from docs 0,1; "lonely gram" (df=1) kept
    assert "shared pair" not in got[0]["text"]
    assert "shared pair" not in got[1]["text"]
    assert "lonely gram" in got[0]["text"]


def test_boilerplate_fully_covered_doc_empties(spark):
    rows = [(i, FOOTER, "h") for i in range(6)]
    out = boilerplate_strip(
        _docs(spark, rows), w=6, frac_num=1, frac_den=2, min_docs=5
    )
    for r in out.collect():
        assert r["text"] == ""
        assert r["n_tokens_kept"] == 0
        assert r["n_tokens_dropped"] == 6


def test_boilerplate_short_docs_pass_through(spark):
    """Docs shorter than w emit no spans and pass through unchanged."""
    rows = [(i, "a b", "h") for i in range(6)]
    out = boilerplate_strip(
        _docs(spark, rows), w=6, frac_num=1, frac_den=2, min_docs=5
    )
    for r in out.collect():
        assert r["text"] == "a b"
        assert r["n_tokens_dropped"] == 0


def _daily(spark, rows):
    return spark.createDataFrame(rows, "k string, b long, v long")


DAY = 86400


def test_stl_constant_plus_seasonal_recovered(spark):
    """v = 1000 + phase_effect (zero-mean over the week): trend
    recovers the constant, seasonal the phase effect, remainder 0."""
    eff = [300, -300, 100, -100, 200, -200, 0]  # sums to 0
    rows = [("k", d * DAY, 1000 + eff[d % 7]) for d in range(28)]
    out = stl_decompose(_daily(spark, rows), ["k"], "b", "v").collect()
    # interior rows: days 3..24 inclusive -> 22 rows
    assert len(out) == 22
    for r in sorted(out, key=lambda r: r["bucket_epoch"]):
        d = r["bucket_epoch"] // DAY
        assert r["trend_x1e4"] == 1000 * 10000, d
        assert r["seasonal_x1e4"] == eff[d % 7] * 10000
        assert r["remainder_x1e4"] == 0


def test_stl_gap_removes_neighborhood(spark):
    """A missing day voids the trend (hence the row) for every bucket
    whose 7-row window would span the gap."""
    days = [d for d in range(21) if d != 10]
    rows = [("k", d * DAY, 100) for d in days]
    out = stl_decompose(_daily(spark, rows), ["k"], "b", "v")
    got_days = sorted(r["bucket_epoch"] // DAY for r in out.collect())
    # windows containing the gap (centers 7..13) are void; edges too
    assert got_days == [3, 4, 5, 6, 14, 15, 16, 17]


def test_stl_linear_trend_exact_and_additive(spark):
    """v = 70·d: centered MA of a linear series equals the center value;
    the decomposition is exactly additive at x1e4 grain (all numerators
    divide exactly by construction: slope 70 ≡ 0 mod 7)."""
    rows = [("k", d * DAY, 70 * d) for d in range(21)]
    out = stl_decompose(_daily(spark, rows), ["k"], "b", "v").collect()
    for r in out:
        d = r["bucket_epoch"] // DAY
        assert r["trend_x1e4"] == 70 * d * 10000
        assert (
            r["trend_x1e4"] + r["seasonal_x1e4"] + r["remainder_x1e4"]
            == r["v"] * 10000
        )


def test_stl_even_period_rejected(spark):
    with pytest.raises(ValueError):
        stl_decompose(_daily(spark, [("k", 0, 1)]), ["k"], "b", "v", period=6)


def test_stl_multi_key_isolation(spark):
    """Keys decompose independently — a second key's values never leak
    into the first key's windows or phase means."""
    rows = [("a", d * DAY, 100) for d in range(14)]
    rows += [("z", d * DAY, 9000 + (1000 if d % 7 == 0 else 0)) for d in range(14)]
    out = stl_decompose(_daily(spark, rows), ["k"], "b", "v")
    a = out.where(F.col("k") == "a").collect()
    assert all(r["trend_x1e4"] == 100 * 10000 for r in a)
    assert all(r["seasonal_x1e4"] == 0 for r in a)
    assert all(r["remainder_x1e4"] == 0 for r in a)


def test_stl_anomaly_seasonal_dip_not_flagged_spike_is(spark):
    """The composition that motivates STL: a recurring weekly dip is
    SEASONAL — the STL remainder is exactly 0 everywhere, so the MAD
    gate flags nothing — while a raw-value MAD gate flags every dip.
    And when a one-off spike IS present, the spike row carries the
    largest |remainder| (the gate fires; nearby rows absorb only the
    spike/7 trend perturbation)."""
    from chainalytic_framework_spark.operators.rolling import mad_anomaly

    dips = [("k", d * DAY, 1000 - (800 if d % 7 == 0 else 0))
            for d in range(42)]
    stl = stl_decompose(_daily(spark, dips), ["k"], "b", "v")
    out = mad_anomaly(stl, ["k"], "remainder_x1e4", k=3).collect()
    assert len(out) == 1
    assert out[0]["n_anomalies"] == 0  # pure seasonality: zero flags
    raw = mad_anomaly(
        _daily(spark, dips).select("k", F.col("v").alias("remainder_x1e4")),
        ["k"], "remainder_x1e4", k=3,
    ).collect()
    assert raw[0]["n_anomalies"] == 6  # raw gate flags every dip

    spiked = [(k, b, v + (800 if b == 20 * DAY else 0)) for k, b, v in dips]
    stl2 = stl_decompose(_daily(spark, spiked), ["k"], "b", "v").collect()
    top = max(stl2, key=lambda r: abs(r["remainder_x1e4"]))
    assert top["bucket_epoch"] == 20 * DAY  # spike dominates remainders
    out2 = mad_anomaly(
        stl_decompose(_daily(spark, spiked), ["k"], "b", "v"),
        ["k"], "remainder_x1e4", k=3,
    ).collect()
    assert out2[0]["n_anomalies"] >= 1  # the gate fires on the spike


def test_stl_duplicate_bucket_voids_neighborhood(spark):
    """tc/span alone can be fooled by a duplicate bucket compensating a
    gap (buckets [0,0,1,2,3,4,6]: 7 rows spanning 6 days); the
    distinct-bucket guard must void every window containing the dup."""
    days = [0, 0, 1, 2, 3, 4, 6] + list(range(7, 21))
    rows = [("k", d * DAY, 100) for d in days]
    out = stl_decompose(_daily(spark, rows), ["k"], "b", "v")
    got_days = sorted(r["bucket_epoch"] // DAY for r in out.collect())
    # valid interiors start once no window touches the dup (day 0 twice)
    # or the gap (day 5 missing): windows centered 9..17 hold rows 6..20
    assert 0 not in got_days and 1 not in got_days and 2 not in got_days
    assert got_days == list(range(9, 18))


def test_stl_misaligned_bucket_voids_neighborhood(spark):
    """A bucket off the step grid voids its windows (alignment guard)."""
    rows = [("k", d * DAY, 100) for d in range(14)]
    rows[6] = ("k", 6 * DAY + 3600, 100)  # day 6 shifted by an hour
    out = stl_decompose(_daily(spark, rows), ["k"], "b", "v")
    got_days = sorted(r["bucket_epoch"] // DAY for r in out.collect())
    assert got_days == [10]  # only the window 7..13 avoids the bad row
