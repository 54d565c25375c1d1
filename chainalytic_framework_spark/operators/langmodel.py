"""Trainable character-n-gram language classifier — in-engine language
ID without external models (the container ships no fastText/langid, so
the engine trains its own profiles from labeled data, the classic
Cavnar–Trenkle n-gram approach that production crawl pipelines used
long before neural LID).

Two halves, both pure DataFrame plans:

- **train**: labeled docs → char trigram counts per language → top-k
  grams per language with integer weights (the "language profile",
  a tiny (n_langs × k) table). One explode + two keyed aggregations.
- **classify**: doc trigram counts joined against the BROADCAST
  profile table → per-(doc, lang) cosine score → deterministic argmax
  (score desc, lang asc). The profile join is the canonical
  broadcast-dim shape; the explode is the only corpus-scale stage and
  is shared with every other text operator.

Why trigrams of characters, not words: character distributions
separate languages even with overlapping vocabulary, degrade
gracefully on short texts, and bound the feature space (≤ alphabet³)
so the profile stays broadcastable at any corpus size.

The marker-word heuristic (functions/text.py::lang_id_heuristic)
remains the zero-training fallback; this module is what a real
deployment trains on its labeled slice. tests/test_langmodel.py builds
a deterministic synthetic multi-language corpus (distinct character
statistics per language — the engine's documents testdata deliberately
shares one vocabulary across lang labels, so it cannot train anything)
and requires >95% holdout accuracy plus classify-determinism.

Reference analogue: none (engine-added webtext capability; SURVEY
training-data-ops addendum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def char_trigram_counts(
    docs: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Per-(id_cols, gram) counts of lowercase character trigrams.
    The explode is `transform(sequence(...), i -> substr(text, i, 3))`
    — pure higher-order functions, no UDF."""
    t = F.lower(F.col(text_col))
    n = F.length(t)
    grams = F.when(
        n >= 3,
        F.transform(F.sequence(F.lit(1), n - 2), lambda i: t.substr(i, F.lit(3))),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(*id_cols, F.explode(grams).alias("gram"))
        .groupBy(*id_cols, "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def train_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    k: int = 300,
) -> DataFrame:
    """Language profiles: top-k trigrams per language with integer
    count weights. Output (lang, gram, w) — (n_langs × k) rows, always
    broadcastable."""
    counts = char_trigram_counts(docs, text_col, (lang_col,)).withColumnRenamed(
        lang_col, "lang"
    )
    w = Window.partitionBy("lang").orderBy(F.col("tf").desc(), F.col("gram").asc())
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("lang", "gram", F.col("tf").alias("w"))
    )


def classify(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "lang_pred",
) -> DataFrame:
    """Assign each doc the language whose profile maximizes cosine
    similarity with the doc's trigram counts. Deterministic tie-break
    (score desc, lang asc); docs sharing NO gram with any profile get
    NULL. Profiles ride a broadcast join; one corpus-scale explode."""
    tf = char_trigram_counts(docs, text_col, (id_col,))
    doc_norm = tf.groupBy(id_col).agg(F.sum(F.col("tf") * F.col("tf")).alias("_dn"))
    prof_norm = profiles.groupBy("lang").agg(F.sum(F.col("w") * F.col("w")).alias("_pn"))
    scored = (
        tf.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("_dot"))
        .join(F.broadcast(prof_norm), "lang")
        .join(doc_norm, id_col)
        .select(
            id_col,
            "lang",
            (F.col("_dot") / F.sqrt(F.col("_pn") * F.col("_dn"))).alias("score"),
        )
    )
    # deterministic argmax: among rows equal to the (10dp-rounded) max
    # score, keep the alphabetically-first lang — rounding first keeps
    # the tie-break independent of float summation order
    wmax = Window.partitionBy(id_col)
    top = scored.withColumn("_mx", F.max(F.round("score", 10)).over(wmax)).where(
        F.round("score", 10) == F.col("_mx")
    )
    pred = top.groupBy(id_col).agg(F.min("lang").alias(out_col))
    return docs.join(pred, id_col, "left")
