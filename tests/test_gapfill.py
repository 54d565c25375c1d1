"""LOCF gap-fill semantics: carry, no-fabrication, boundary carry-in."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.operators.gapfill import gapfill_locf, last_observation_state
from chainalytic_framework_spark.operators.rollup import rollup_pages


def _tier(spark, pages):
    return rollup_pages(pages, "1h", grain="url")


def test_no_gaps_remain_inside_span(spark, pages):
    t = _tier(spark, pages)
    gf = gapfill_locf(t, "1h")
    spans = gf.groupBy("url").agg(
        F.min("bucket_start").alias("b0"),
        F.max("bucket_start").alias("b1"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = spans.where(
        F.col("n") != (F.col("b1").cast("long") - F.col("b0").cast("long")) / 3600 + 1
    )
    assert bad.count() == 0


def test_filled_rows_carry_last_observation(spark, pages):
    t = _tier(spark, pages)
    gf = gapfill_locf(t, "1h").cache()
    # every gap-filled row: point_count==0 and measures non-null
    filled = gf.where("gap_filled")
    assert filled.count() > 0
    assert filled.where("point_count != 0").count() == 0
    assert filled.where("byte_size IS NULL OR text_len_sum IS NULL").count() == 0
    # observed rows unchanged vs input tier
    obs = gf.where(~F.col("gap_filled")).select(
        "bucket_start", "url_hash", "url", "lang", "point_count",
        "byte_size", "text_len_sum", "text_len_min", "text_len_max",
    )
    orig = t.select(
        "bucket_start", "url_hash", "url", "lang", "point_count",
        "byte_size", "text_len_sum", "text_len_min", "text_len_max",
    )
    assert obs.exceptAll(orig).count() == 0
    assert orig.exceptAll(obs).count() == 0


def test_no_fabrication_before_first_observation(spark, pages):
    t = _tier(spark, pages)
    gf = gapfill_locf(t, "1h")
    firsts = t.groupBy("url").agg(F.min("bucket_start").alias("first_obs"))
    early = gf.join(firsts, "url").where(F.col("bucket_start") < F.col("first_obs"))
    assert early.count() == 0


def test_boundary_carry_in_across_runs(spark, pages):
    """Split the time range in two 'runs'; run 2 with boundary state from
    run 1 must equal the single-run gap-fill on the full range."""
    t = _tier(spark, pages).cache()
    mid = t.agg(F.min("bucket_start")).first()[0]
    import datetime

    split = mid + datetime.timedelta(days=3)
    t1 = t.where(F.col("bucket_start") < F.lit(split))
    t2 = t.where(F.col("bucket_start") >= F.lit(split))
    state = last_observation_state(t1)
    run2 = gapfill_locf(t2, "1h", boundary_state=state, range_start=split)
    full = gapfill_locf(t, "1h").where(F.col("bucket_start") >= F.lit(split))
    # compare only urls present in run 2's output (urls that ended before
    # the split have no buckets after it in either computation)
    cols = ["bucket_start", "url", "lang", "point_count", "byte_size",
            "text_len_sum", "text_len_max", "gap_filled"]
    a = run2.select(*cols)
    b = full.select(*cols)
    # run2 only covers urls with activity/state; full covers spans within
    # [first,last] — restrict both to urls observed in t2 or carried state
    keys = t2.select("url").union(state.select("url")).distinct()
    b = b.join(keys, "url", "left_semi").select(*cols)
    a = a.join(keys, "url", "left_semi").select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_pandas_variant_equals_jvm_plan(spark, pages):
    from chainalytic_framework_spark.operators.gapfill import gapfill_locf_pandas

    t = _tier(spark, pages)
    cols = ["bucket_start", "url_hash", "url", "lang", "point_count",
            "byte_size", "text_len_sum", "text_len_min", "text_len_max", "gap_filled"]
    a = gapfill_locf(t, "1h").select(*cols)
    b = gapfill_locf_pandas(t, "1h").select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
