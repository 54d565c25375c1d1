"""WARC source: parse Common-Crawl-style WARC files into the engine's
``pages`` schema (url, warc_ts, html) — the ingestion edge the
north-star input ("Common-Crawl-style web pages") actually arrives in.

Distribution model: WARC is a concatenation of length-prefixed records
(ISO 28500); records cannot be split at arbitrary byte offsets, so the
unit of parallelism is the FILE, exactly how Common Crawl ships data
(~1 GB .warc.gz segments, tens of thousands per crawl — far more files
than executors, so file-grain parallelism saturates a cluster without
any intra-file splitting). The reader is ``binaryFile`` scan →
``mapInPandas`` record parser: Arrow-batched, one Python pass per
file, emitting only (url, warc_ts, html, record_id) — header/payload
slicing, never a per-row Spark UDF.

Parsing is length-driven, not delimiter-driven: each record's payload
is taken from its ``Content-Length`` header, so payloads containing
the bytes ``WARC/1.0`` (pages ABOUT warc files) parse correctly — the
classic naive-split bug, covered by a test. Per-record gzip members
(how CC actually compresses: ``gzip.decompress`` handles concatenated
members) are supported via the ``.gz`` suffix.

Only ``WARC-Type: response`` records become rows; the HTTP response
headers inside the payload are stripped to the body. Malformed records
degrade to skipped, counted in no row — ingestion must never poison
the pipeline on one bad segment.

Reference analogue: S2's upstream fetcher (``data_feeder.py``) — the
block-feed edge replaced by the crawl-archive edge.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_ts timestamp, html binary, record_id string"


def _parse_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record; length-driven walk."""
    i, n = 0, len(buf)
    while i < n:
        j = buf.find(b"\r\n\r\n", i)
        if j < 0:
            return
        head = buf[i:j].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            return
        payload = buf[j + 4 : j + 4 + clen]
        yield headers, payload
        i = j + 4 + clen
        while buf[i : i + 2] == b"\r\n":
            i += 2


def _http_body(payload: bytes) -> bytes:
    """Strip HTTP response headers if present."""
    if payload.startswith(b"HTTP/"):
        k = payload.find(b"\r\n\r\n")
        if k >= 0:
            return payload[k + 4 :]
    return payload


def _parse_ts(s: str):
    try:
        return (
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` -> DataFrame(url, warc_ts, html,
    record_id). ``*.gz`` files are per-record-gzip decompressed."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"url": [], "warc_ts": [], "html": [], "record_id": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                buf = bytes(content)
                if str(p).endswith(".gz"):
                    try:
                        buf = gzip.decompress(buf)
                    except OSError:
                        continue
                for headers, payload in _parse_records(buf):
                    if headers.get("warc-type") != "response":
                        continue
                    url = headers.get("warc-target-uri")
                    ts = _parse_ts(headers.get("warc-date", ""))
                    if not url or ts is None:
                        continue
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(_http_body(payload))
                    out["record_id"].append(headers.get("warc-record-id", ""))
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(parse, schema=WARC_SCHEMA)


def build_warc_bytes(
    records: list[tuple[str, str, bytes]], per_record_gzip: bool = False
) -> bytes:
    """Synthesize a conformant WARC byte stream from
    (url, iso_ts, body) triples — test/doc utility (and the writer half
    of a WARC round-trip). HTTP response headers are included the way
    crawlers store them."""
    out = []
    for idx, (url, ts, body) in enumerate(records):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{idx}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        rec = head + b"\r\n" + http + b"\r\n\r\n"
        out.append(gzip.compress(rec) if per_record_gzip else rec)
    return b"".join(out)
