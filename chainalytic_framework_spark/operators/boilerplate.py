"""Host-level boilerplate removal — the CCNet/RefinedWeb paragraph-
dedup step adapted to token spans: a w-token span that appears in a
large FRACTION of one host's pages (nav bars, footers, cookie banners,
legal text) is template boilerplate and is cut from every page of that
host before the text enters a training corpus.

This is the WITHIN-GROUP frequency twin of the corpus-global
exact-substring dedup in ``operators/dedup.py`` (``strip_dup_spans``):
there a span is cut when its corpus-wide multiplicity exceeds 1; here a
span is cut when the number of DISTINCT documents of the same group
(host / ``source``) containing it reaches a per-group threshold. The
reference engine has no text pipeline at all (it folds ledger state,
``/root/reference/zones/public-icon/aggregator/transform_registry/stake_history.py``);
boilerplate removal is engine-added capability for the Common-Crawl-
style corpus this engine rolls up (SURVEY §2 LLM-pipeline family).

Threshold semantics (exact, no floats): with ``frac_num/frac_den`` the
boilerplate fraction and ``nd`` the group's document count, a span is
boilerplate iff

    nd >= min_docs  AND  df >= ceil(frac_num * nd / frac_den)

where df = distinct docs of the group containing the span. The ceil is
integer arithmetic (``(frac_num*nd + frac_den - 1) div frac_den``) so
the decision is bit-identical across engines — no IEEE ceil(0.2*25)
edge cases.

Scale shape (10^12 docs): spans are keyed by 64-bit hash (~8 bytes on
the wire, never the span string); the ONE wide shuffle is the
(doc, group, hash) pre-aggregation — a hot boilerplate span occurring
on 10^8 pages of one host spreads across its carrier docs instead of
landing in one per-hash task. Document frequency is a second, much
smaller agg over the collapsed pairs (map-side combinable), group
sizes broadcast, and the boilerplate-hash semi-join probes the SAME
(doc, group, hash) exchange — ReuseExchange computes the span explode
once. No window over a corpus key anywhere. Hash collisions can only
overstrip with probability ~n²/2⁶⁴ per group — negligible, and the
sf-gate oracle (string-keyed) certifies collision-free hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_span_hashes(docs: DataFrame, text_col: str, id_col: str,
                       group_col: str, w: int) -> DataFrame:
    """(id, group, _h span-hash, _pos positions list) — one row per
    (doc, span-hash), positions collapsed (bounded by doc length).
    Docs shorter than w tokens emit nothing."""
    # explode the position index FIRST and build the span hash in the
    # post-explode projection: whole-stage codegen compiles it, while
    # the former (pos, hash) structs inside a transform lambda ran the
    # slice+concat+hash interpreted per element — measured 2x slower
    # at bench sf1.0 (optimization r06)
    toks = F.split(F.col(text_col), " ", -1)
    idx = F.when(
        F.size(toks) >= w, F.sequence(F.lit(1), F.size(toks) - (w - 1))
    ).otherwise(F.array().cast("array<int>"))
    sp = docs.select(
        F.col(id_col), F.col(group_col), toks.alias("_tk"), F.explode(idx).alias("pos")
    ).select(
        id_col,
        group_col,
        "pos",
        F.xxhash64(F.concat_ws(" ", F.slice(F.col("_tk"), F.col("pos"), w))).alias("_h"),
    )
    return sp.groupBy(id_col, group_col, "_h").agg(
        F.collect_list("pos").alias("_pos")
    )


def boilerplate_strip(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", group_col: str = "source",
                      w: int = 8, frac_num: int = 1, frac_den: int = 2,
                      min_docs: int = 5) -> DataFrame:
    """Cut every token covered by a group-frequent (boilerplate) w-span
    and reassemble the document — all JVM array ops, no Python in the
    row path.

    Returns (id, {text_col} with covered tokens removed, n_tokens_kept,
    n_tokens_dropped); every input doc emits exactly one row (docs with
    nothing to cut — short docs, small groups, no frequent span — pass
    through unchanged; fully-boilerplate docs emit text ''). The
    covering-token cut policy matches ``strip_dup_spans`` (the w-gram
    approximation of cutting the exact substring)."""
    g1 = _group_span_hashes(docs, text_col, id_col, group_col, w)
    nd = (
        docs.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .withColumn(
            "_thr",
            F.expr(f"({frac_num} * _nd + {frac_den} - 1) div {frac_den}"),
        )
        .select(group_col, "_thr")
    )
    df_ = g1.groupBy(group_col, "_h").agg(F.count(F.lit(1)).alias("_df"))
    bp = (
        df_.join(F.broadcast(nd), group_col)
        .where(F.col("_df") >= F.col("_thr"))
        .select(group_col, "_h")
    )
    starts = (
        g1.join(bp, [group_col, "_h"], "left_semi")
        .groupBy(id_col)
        .agg(F.flatten(F.collect_list("_pos")).alias("_starts"))
    )
    joined = docs.join(starts, id_col, "left")
    toks = F.split(F.col(text_col), " ", -1)
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + (w - 1)),
            )
        )
    )
    kept = F.filter(toks, lambda x, i: ~F.array_contains(covered, i + F.lit(1)))
    return joined.select(
        id_col,
        F.concat_ws(" ", kept).alias(text_col),
        F.size(kept).alias("n_tokens_kept"),
        (F.size(toks) - F.size(kept)).alias("n_tokens_dropped"),
    )
