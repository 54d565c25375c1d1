"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "docs_per_sec": ...}

Headliners: the engine's full pages pipeline (synth → 1m rollup →
cascade 1h/1d/30d → gap-fill; docs/sec is measured on this), a
cold-tier encode+decode roundtrip, plus representative contract
queries over the driver testdata tables. Every query is forced
end-to-end with a noop sink (no driver collect).

NOTE on cross-round comparisons: the headline `value` is the SUM of
per-entry walls, and the entry list GROWS across rounds — compare
per-query timings (and docs_per_sec), not the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chainalytic_framework_spark import contract
from chainalytic_framework_spark.operators.gapfill import gapfill_locf
from chainalytic_framework_spark.session import build_session, prewarm_python_workers
from chainalytic_framework_spark.synth import generate_pages

HEADLINE = [
    "rollup_1m_events",
    "rollup_1h_cascade_events",
    "rollup_1d_salted_events",
    "cumulative_daily_events",
    "topk_users_events",
    "recent_active_users_events",
    "gapfill_locf_events",
    "transition_counts_events",
    "join_revenue_by_nation",
    "tpch_q1_lineitem",
    "text_stats_lang_documents",
    "dedup_exact_documents",
    "knn_bruteforce_embeddings",
    # round-2 additions: the verified-dedup chain and TF-IDF (the
    # iterative ops — components, IVF — are correctness-gated at sf0.01
    # by the driver; their per-round fixed job overhead at this sf would
    # swamp the headline without measuring anything scale-relevant)
    "lsh_verified_pairs_documents",
    "tfidf_top_terms_documents",
    # round-2 session additions: distribution tier + merged-quantile
    # read, drift stat, and index-served retrieval — each a different
    # shuffle/plan shape than anything above
    "histogram_p90_daily_events",
    "cusum_drift_events",
    "term_search_documents",
    # round-3 additions: routed-tier quantile serving, exact-substring
    # dedup (the big span shuffle), and the packing window — each a
    # distinct plan shape (multi-tier union + window, hash-window +
    # rollup, global window cumsum)
    "routed_p90_events",
    "dup_span_stats_documents",
    "pack_chunks_documents",
    # round-4 additions: corpus n-gram tables and the split-label scan
    # (both pure agg/scan shapes new to the list)
    "ngram_counts_documents",
    "split_assign_documents",
    # round-5 additions: candle cascade (min_by/max_by agg-only shape)
    # and the per-entity lead window (state-duration accounting)
    "ohlc_1h_events",
    "state_durations_events",
    # round-5 continuation additions: trailing RANGE-window burst scan
    # (a frame shape not in the list) and the cached-count log-odds
    # top-k (multi-consumer reuse + sharded window)
    "burst_windows_events",
    "distinctive_terms_documents",
    # round-5 final-session additions: symbolic series words (rank
    # window + hash aggs), the word-banded candidate→verify pair
    # pipeline, and the recrawl derive (lag window + key agg)
    "sax_words_events",
    "motif_verified_pairs_events",
    "recrawl_schedule_events",
    # round-5 closing additions: rank-trimmed robust location (single
    # shared-partitioning window+agg) and the tier-completeness grid
    # scan (distinct + bounded lag window) — the shapes the serving SLA
    # path exercises at 100 TB
    "trimmed_mean_daily_events",
    "tier_coverage_1m_events",
    # round-5 final additions: the agg-only pixel downsample (raw-tier
    # serving path), the bounded-frame array-ops despike, and
    # index-served phrase retrieval (positional posting intersection)
    "m4_downsample_events",
    "hampel_despike_events",
    "phrase_search_documents",
    "stl_anomaly_events",
    "boilerplate_strip_documents",
    # round-5 monitoring/sketch additions: the multi-frame hysteresis
    # window chain (state carry + edge detect + numbering in ONE sort),
    # the KMV sketch build (distinct-collapse + two-phase k-min) with
    # its broadcast pair join, and ASAP's shared rolled frame (every
    # candidate window's sum as sibling columns off one exchange)
    "alert_episodes_events",
    "kmv_overlap_events",
    "asap_smooth_events",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # best-of-N per timed section: this shared host shows >2x run-to-run
    # variance under neighbor load; min isolates code capability
    n_rep = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.1

    spark = build_session(
        app_name="cfs-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    prewarm_python_workers(spark)

    timings: dict[str, float] = {}

    # --- engine pipeline on synthetic pages (docs/sec headline) ---
    # the REAL path: run_pipeline (1m from raw, cascade from stored
    # parents, fold+state, manifests) into a fresh store, then gap-fill.
    import shutil

    from chainalytic_framework_spark.plans.pipeline import run_pipeline
    from chainalytic_framework_spark.tables import TableStore

    n_docs = max(10_000, int(6_000_000 * sf))
    pages_path = f"/tmp/cfs_bench_pages_{n_docs}"
    if not os.path.isdir(pages_path):
        generate_pages(spark, n_docs).write.mode("overwrite").parquet(pages_path)
    pages_on_disk = spark.read.parquet(pages_path)
    wh = "/tmp/cfs_bench_wh"
    shutil.rmtree(wh, ignore_errors=True)
    store = TableStore(spark, wh)

    # best-of-2: this shared host shows >2x run-to-run variance under
    # neighbor load; min isolates code capability from noise (same
    # protocol as tools/bench_scaling.py)
    pipeline_sec = None
    for attempt in range(n_rep):
        shutil.rmtree(wh, ignore_errors=True)
        store = TableStore(spark, wh)
        t0 = time.perf_counter()
        result = run_pipeline(spark, pages_on_disk, store, with_fold=True)
        # bounded spine: pass the run's pending window so the headline
        # exercises the scale-safe gap-fill path (equality with the
        # unbounded form is tested in tests/test_gapfill.py)
        _force(gapfill_locf(store.read("tier_1h"), "1h",
                            range_start=result["pending_range"][0]))
        sec = time.perf_counter() - t0
        pipeline_sec = sec if pipeline_sec is None else min(pipeline_sec, sec)
    timings["pages_pipeline"] = round(pipeline_sec, 3)

    # cold tier roundtrip: Gorilla-encode the 1d tier, then decode every
    # blob back through the transposed batch decoder — the cold
    # write+read path as its own headline entry
    from chainalytic_framework_spark.operators.cold_store import decode_cold, encode_cold

    cold_best = None
    for attempt in range(n_rep):
        t0 = time.perf_counter()
        store.write(encode_cold(store.read("tier_1d"), day_keyed=False), "cold_1d")
        _force(decode_cold(store.read("cold_1d")))
        sec = time.perf_counter() - t0
        cold_best = sec if cold_best is None else min(cold_best, sec)
    timings["cold_roundtrip_1d"] = round(cold_best, 3)

    # per-lang Holt-Winters forecast off the 1h tier (zero-filled spine;
    # the serving-side forecast path at bench scale)
    from pyspark.sql import functions as Fx

    from chainalytic_framework_spark.operators.forecast import holt_forecast

    fc_best = None
    for attempt in range(n_rep):
        t0 = time.perf_counter()
        t1h = (
            store.read("tier_1h")
            .groupBy("lang", "bucket_start")
            .agg(Fx.sum("point_count").alias("point_count"))
        )
        bounds = t1h.groupBy("lang").agg(
            Fx.min("bucket_start").alias("_b0"), Fx.max("bucket_start").alias("_b1")
        )
        spine = bounds.select(
            "lang",
            Fx.explode(Fx.expr("sequence(_b0, _b1, interval 3600 seconds)")).alias(
                "bucket_start"
            ),
        )
        dense = spine.join(t1h, ["lang", "bucket_start"], "left").fillna(
            {"point_count": 0}
        )
        _force(holt_forecast(dense, key_cols=("lang",), gamma=0.3, period=24,
                             horizon=24))
        sec = time.perf_counter() - t0
        fc_best = sec if fc_best is None else min(fc_best, sec)
    timings["forecast_1h_lang"] = round(fc_best, 3)
    docs_per_sec = round(result["docs"] / pipeline_sec, 1)
    n_docs = result["docs"]

    # --- contract headliners over driver testdata (best-of-2 each) ---
    qs = contract.queries()
    for name in HEADLINE:
        best = None
        for attempt in range(n_rep):
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            sec = time.perf_counter() - t0
            best = sec if best is None else min(best, sec)
        timings[name] = round(best, 3)

    # value = sum of per-entry best-of-2 walls (NOT the harness's own
    # double-run overhead); see the module note on cross-round reads
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "rollup_engine_headline_suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "pipeline_docs": n_docs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
