"""Rollup correctness: golden pandas oracle + salted-plan equivalence.

The pandas oracle is the single-process re-implementation of the fold
semantics (SURVEY.md §5 test strategy item 1) — what the reference's
per-height loop would produce, re-keyed to (url, bucket).
"""

from __future__ import annotations

import pandas as pd

from chainalytic_framework_spark.operators.rollup import rollup_pages, rollup_pages_salted


def _pandas_oracle_url_grain(pdf: pd.DataFrame, secs: int) -> pd.DataFrame:
    df = pdf.copy()
    df["bucket_start"] = pd.to_datetime(
        (df["warc_ts"].astype("int64") // 1_000_000_000 // secs) * secs, unit="s"
    )
    df["text_len"] = df["text"].str.len()
    df["html_len"] = df["html"].map(len)
    g = df.groupby(["bucket_start", "url", "lang"], as_index=False).agg(
        point_count=("url", "size"),
        byte_size=("html_len", "sum"),
        text_len_sum=("text_len", "sum"),
        text_len_min=("text_len", "min"),
        text_len_max=("text_len", "max"),
    )
    return g.sort_values(["bucket_start", "url"], ignore_index=True)


def test_rollup_1h_matches_pandas_oracle(spark, pages):
    got = (
        rollup_pages(pages, "1h", grain="url")
        .select(
            "bucket_start", "url", "lang", "point_count", "byte_size",
            "text_len_sum", "text_len_min", "text_len_max",
        )
        .toPandas()
        .sort_values(["bucket_start", "url"], ignore_index=True)
    )
    exp = _pandas_oracle_url_grain(pages.toPandas(), 3600)
    got["bucket_start"] = got["bucket_start"].astype("datetime64[ns]")
    exp = exp[got.columns]
    for c in ("point_count", "byte_size", "text_len_sum", "text_len_min", "text_len_max"):
        got[c] = got[c].astype("int64")
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_salted_equals_unsalted(spark, pages):
    a = rollup_pages(pages, "1h", grain="lang").drop("tier", "gap_filled")
    b = rollup_pages_salted(pages, "1h", n_salts=8).drop("tier", "gap_filled")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_measures_are_integer_types(spark, pages):
    df = rollup_pages(pages, "1m", grain="url")
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for c in ("point_count", "byte_size", "text_len_sum", "text_len_min", "text_len_max"):
        assert kinds[c] in ("bigint", "int"), (c, kinds[c])
