"""HTML extraction (functions/html.py): tag/script/entity semantics,
determinism (the byte-identical-text invariant), pipeline hand-off."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainalytic_framework_spark.functions.html import (
    extract_links,
    extract_text,
    extract_title,
    html_to_text_columns,
)


def _one(spark, html, fn):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(fn(F.col("h")).alias("o")).first()["o"]


def test_script_style_comments_removed(spark):
    h = ('<body>keep<script>var a="<b>no</b>";</script>'
         "<style>b{}</style><!-- gone -->also</body>")
    assert _one(spark, h, extract_text) == "keep also"


def test_block_tags_separate_words(spark):
    h = "<p>one</p><p>two</p><div>three</div>four<br>five"
    assert _one(spark, h, extract_text) == "one two three four five"


def test_entities_decoded_once(spark):
    # '&amp;lt;' must decode to '&lt;' (literal), NOT to '<'
    h = "<p>a &amp; b &lt;tag&gt; &amp;lt;still&amp;gt; &#39;q&#39;</p>"
    assert _one(spark, h, extract_text) == "a & b <tag> &lt;still&gt; 'q'"


def test_title_and_links(spark):
    h = ('<head><title> T &amp; U </title></head>'
         '<a href="/a">x</a><A HREF=\'/b\'>y</A><a name="no-href">z</a>')
    assert _one(spark, h, extract_title) == "T & U"
    assert list(_one(spark, h, extract_links)) == ["/a", "/b"]


def test_no_title_empty(spark):
    assert _one(spark, "<p>x</p>", extract_title) == ""


def test_extraction_deterministic_binary_roundtrip(spark):
    # the invariant: same html bytes -> same text bytes, across
    # partitionings and through the binary column type
    rows = [(i, f"<p>doc {i} &amp; co</p><script>x={i}</script>".encode())
            for i in range(100)]
    df = spark.createDataFrame(rows, "url long, html binary")
    a = html_to_text_columns(df).select("url", "text", "title", "n_links")
    b = html_to_text_columns(df.repartition(7)).select("url", "text", "title", "n_links")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    row = a.where(F.col("url") == 3).first()
    assert row["text"] == "doc 3 & co" and row["n_links"] == 0


def test_feeds_pipeline_prepare(spark):
    from chainalytic_framework_spark.operators.fold import prepare_observations

    rows = [(f"https://e.com/{i}", f"2024-01-0{1 + i % 5} 00:00:0{i % 10}",
             f"<p>body {i}</p>".encode()) for i in range(20)]
    df = spark.createDataFrame(rows, "url string, ts string, html binary").select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "html"
    )
    pages = html_to_text_columns(df).withColumn("lang", F.lit("en"))
    obs = prepare_observations(pages, n_buckets=4)
    assert obs.count() == 20
