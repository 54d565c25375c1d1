"""WARC source (sources/warc.py): round-trip, length-driven parsing
(payloads containing 'WARC/1.0'), gzip members, pipeline hand-off."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chainalytic_framework_spark.sources.warc import build_warc_bytes, read_warc

RECS = [
    ("https://a.example.com/x", "2024-01-01T00:00:07Z", b"<html>alpha page</html>"),
    # body that CONTAINS a fake record header — must not split here
    ("https://b.example.com/y", "2024-01-01T00:01:30Z",
     b"<html>about WARC/1.0\r\n\r\nfiles</html>"),
    ("https://a.example.com/x", "2024-01-02T09:30:00Z", b"<html>alpha v2</html>"),
]


def _write(tmp_path, name, data):
    p = tmp_path / name
    p.write_bytes(data)
    return str(tmp_path)


def test_warc_roundtrip_plain(spark, tmp_path):
    path = _write(tmp_path, "seg-0.warc", build_warc_bytes(RECS))
    got = read_warc(spark, path).orderBy("warc_ts").collect()
    assert len(got) == 3
    assert [r["url"] for r in got] == [u for u, _, _ in RECS]
    assert bytes(got[1]["html"]) == RECS[1][2]  # embedded header intact
    assert got[0]["warc_ts"] == dt.datetime(2024, 1, 1, 0, 0, 7)
    assert got[0]["record_id"] == "<urn:uuid:rec-0>"


def test_warc_gzip_members(spark, tmp_path):
    path = _write(tmp_path, "seg-0.warc.gz", build_warc_bytes(RECS, per_record_gzip=True))
    got = read_warc(spark, path).orderBy("warc_ts").collect()
    assert [(r["url"], bytes(r["html"])) for r in got] == [
        (u, b) for u, _, b in RECS
    ]


def test_warc_skips_non_response_and_malformed(spark, tmp_path):
    extra = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
        + build_warc_bytes(RECS[:1])
        + b"garbage trailing bytes that are not a record"
    )
    path = _write(tmp_path, "seg-0.warc", extra)
    got = read_warc(spark, path).collect()
    assert len(got) == 1 and got[0]["url"] == RECS[0][0]


def test_warc_feeds_pipeline(spark, tmp_path):
    # parsed records flow straight into the fold/rollup prepare stage
    from chainalytic_framework_spark.operators.fold import prepare_observations

    path = _write(tmp_path, "seg-0.warc", build_warc_bytes(RECS))
    pages = read_warc(spark, path).select(
        "url", "warc_ts", "html",
        F.decode("html", "utf-8").alias("text"),
        F.lit("en").alias("lang"),
    )
    obs = prepare_observations(pages, n_buckets=4)
    assert obs.count() == 3
    assert {c for c in ("url_hash", "url_bucket") if c in obs.columns}
