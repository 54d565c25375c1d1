"""Regression tests for code-review findings (round 1 review)."""

from __future__ import annotations

import datetime as dt
import decimal

from pyspark.sql import functions as F

from chainalytic_framework_spark.functions.decode import (
    hex_to_decimal_udf,
    hex_to_scaled_double,
    hex_to_scaled_double_udf,
)
from chainalytic_framework_spark.operators.fold import (
    extract_state,
    fold_observations,
    fold_with_state,
)


def _obs(spark, rows):
    # rows: (url, t_seconds, lang, text_hash)
    df = spark.createDataFrame(rows, "url string, t long, lang string, text_hash long")
    return df.selectExpr(
        "pmod(xxhash64(url), 16) as url_bucket",
        "url",
        "timestamp_seconds(t) as warc_ts",
        "xxhash64(url) as url_hash",
        "lang",
        "text_hash",
        "100 as text_len",
        "200 as html_len",
    ).selectExpr("url_bucket", "url", "warc_ts", "url_hash", "lang",
                 "text_hash", "cast(text_len as long) text_len", "cast(html_len as long) html_len")


def test_fold_state_with_lang_flapping_url(spark):
    """A url crawled under two langs must not crash the incremental fold
    (state was keyed per-(url,lang) → duplicate index in Series.map)."""
    run1 = _obs(spark, [("u1", 100, "en", 7), ("u1", 200, "de", 7), ("u2", 150, "fr", 9)])
    state = extract_state(fold_observations(run1))
    assert state.where("url = 'u1'").count() == 1  # one state row per url
    run2 = _obs(spark, [("u1", 300, "en", 8)])
    out = fold_with_state(run2, state).collect()
    r = [x for x in out if x["url"] == "u1"][0]
    assert r["text_changed"] is True and r["cum_points"] == 3 and r["content_rev"] == 1


def test_fold_hash_comparison_is_exact(spark):
    """Adjacent 64-bit hashes differing only below float53 precision must
    still register as changed (int64→float64 coercion bug)."""
    h1, h2 = 2**62 + 1, 2**62 + 2
    run = _obs(spark, [("u1", 100, "en", h1), ("u1", 200, "en", h2)])
    out = {r["warc_ts"]: r for r in fold_observations(run).collect()}
    changed = [r["text_changed"] for r in out.values()]
    assert sorted(changed) == [False, True]
    # and across the state splice too
    s = extract_state(fold_observations(_obs(spark, [("u1", 100, "en", h1)])))
    out2 = fold_with_state(_obs(spark, [("u1", 200, "en", h2)]), s).first()
    assert out2["text_changed"] is True


def test_hex_fast_path_16_digits_and_0X(spark):
    df = spark.createDataFrame(
        [("0de0b6b3a7640000",), ("0000000000000001",), ("0Xde0b6b3a7640000",)], "h string"
    )
    got = [r["v"] for r in df.select(hex_to_scaled_double("h").alias("v")).collect()]
    assert got[0] == 1.0
    assert got[1] == 1e-18
    assert got[2] == 1.0


def test_decimal_udf_no_silent_rounding(spark):
    v = 10**30 + 1  # needs 31 significant digits
    hx = format(v, "x")
    df = spark.createDataFrame([(hx,)], "h string")
    got = df.select(hex_to_decimal_udf()("h").alias("v")).first()["v"]
    with decimal.localcontext() as ctx:  # expectation needs full precision too
        ctx.prec = 60
        expected = decimal.Decimal(v) / decimal.Decimal(10**18)
    assert got == expected == decimal.Decimal("1000000000000.000000000000000001")
    # > 10^38 unscaled → NULL, not a downstream overflow
    big = format(15 * 10**37, "x")
    df2 = spark.createDataFrame([(big,)], "h string")
    assert df2.select(hex_to_decimal_udf()("h").alias("v")).first()["v"] is None


def test_recently_active_on_empty_tier(spark):
    from chainalytic_framework_spark.queries import recently_active_urls

    empty = spark.createDataFrame(
        [], "bucket_start timestamp, url string, point_count long"
    )
    assert recently_active_urls(empty).count() == 0


def test_multimodal_null_payload(spark):
    from chainalytic_framework_spark.functions.multimodal import (
        attach_media_metadata,
        extract_image_features,
    )

    media = spark.createDataFrame(
        [(1, "image", b"\xff\xd8\xff" + b"x" * 100, "image/jpeg", 103),
         (2, "image", None, "image/jpeg", 0)],
        "media_id long, kind string, payload binary, declared_mime string, n_bytes long",
    )
    feats = {r["media_id"]: r for r in
             extract_image_features(attach_media_metadata(media)).collect()}
    assert feats[1]["decode_ok"] is True
    assert feats[2]["decode_ok"] is False and feats[2]["n_bytes"] == 0


def test_snapshot_change_reprocesses_day(spark, tmp_path):
    from chainalytic_framework_spark.plans.pipeline import run_pipeline
    from chainalytic_framework_spark.synth import generate_pages
    from chainalytic_framework_spark.tables import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    pages_v1 = generate_pages(spark, 800)
    r1 = run_pipeline(spark, pages_v1, store, with_fold=False, input_snapshot_id="snap1")
    assert r1["pending_days"] > 0
    # same snapshot → no-op
    r2 = run_pipeline(spark, pages_v1, store, with_fold=False, input_snapshot_id="snap1")
    assert r2["pending_days"] == 0
    # new snapshot with more rows for the same days → reprocessed
    pages_v2 = generate_pages(spark, 1600)
    r3 = run_pipeline(spark, pages_v2, store, with_fold=False, input_snapshot_id="snap2")
    assert r3["pending_days"] > 0
    total = store.read("tier_1d").agg(F.sum("point_count")).first()[0]
    assert total == 1600
