"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Cluster usage:

    zip -r cfs.zip chainalytic_framework_spark
    spark-submit --py-files cfs.zip \
        --conf spark.sql.shuffle.partitions=4096 \
        -m chainalytic_framework_spark run \
        --input s3://bucket/pages/ --warehouse s3://bucket/wh/ \
        --snapshot-id $SNAPSHOT --with-sketches

    python -m chainalytic_framework_spark synth --rows 1000000 --out /tmp/pages

The ``run`` subcommand is one idempotent pipeline increment: pending
days are derived from the manifest, tiers/fold/state commit via dynamic
partition overwrite + merge_upsert, so re-running after a failure is
safe. Environment knobs (SPARK_GRAFT_*) are documented in session.py,
bucketing.py and plans/pipeline.py.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def _cmd_run(args: argparse.Namespace) -> None:
    from .plans.pipeline import run_pipeline
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-run")
    pages = spark.read.parquet(args.input)
    store = TableStore(spark, args.warehouse)
    retention_now = (
        dt.datetime.fromisoformat(args.retention_now) if args.retention_now else None
    )
    result = run_pipeline(
        spark,
        pages,
        store,
        metric_set=args.metric_set,
        input_snapshot_id=args.snapshot_id,
        with_fold=not args.no_fold,
        with_sketches=args.with_sketches,
        with_histograms=args.with_histograms,
        with_cold_tier=args.with_cold_tier,
        enforce_retention_now=retention_now,
    )
    print(json.dumps(result, default=str))  # pending_range carries dates


def _cmd_synth(args: argparse.Namespace) -> None:
    from .session import get_active_or_build
    from .synth import generate_pages

    spark = get_active_or_build(app_name="cfs-synth")
    generate_pages(spark, args.rows, seed=args.seed).write.mode("overwrite").parquet(args.out)
    print(json.dumps({"rows": args.rows, "out": args.out}))


def _cmd_compact(args: argparse.Namespace) -> None:
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-compact")
    store = TableStore(spark, args.warehouse)
    n = store.compact_partitions(
        args.table,
        args.partition_by.split(","),
        max_files_per_partition=args.max_files,
        target_bytes=args.target_bytes,
    )
    print(json.dumps({"table": args.table, "partitions_rewritten": n}))


def _cmd_query(args: argparse.Namespace) -> None:
    from . import contract
    from .session import get_active_or_build

    qs = contract.queries()
    if args.name not in qs:
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "available": sorted(qs)}))
        raise SystemExit(2)
    spark = get_active_or_build(app_name=f"cfs-query-{args.name}")
    df = qs[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out}))
    else:
        rows = df.limit(args.limit).collect()
        print(json.dumps({"query": args.name, "rows": [r.asDict() for r in rows]},
                         default=str))


def _retention_check_args(args: argparse.Namespace):
    """(horizons, now_epoch) for the routed-read retention validation —
    shared by ALL serve commands so none can silently read a range whose
    fine-tier segments were already expired (ADVICE r2/r4): serve-range
    and serve-quantile fail loudly, and serve-forecast must too, else
    expired buckets enter the Holt fit as zeros and skew the forecast
    with no error."""
    if not args.retention_now:
        return None, None
    from .operators.retention import DEFAULT_HORIZONS, _to_epoch

    return DEFAULT_HORIZONS, _to_epoch(dt.datetime.fromisoformat(args.retention_now))


def _load_tier_dfs(store):
    """Numeric tier frames for a routed read, with the live streaming
    edge riding in as the finest tier (per-bucket batch-wins) when a
    stream log exists — shared by every serve command so tier discovery
    has exactly one definition."""
    from .operators.bucketing import TIER_ORDER

    tier_dfs = {
        t: store.read(f"tier_{t}") for t in TIER_ORDER
        if store.exists(f"tier_{t}")
    }
    if store.exists("tier_1m_stream"):
        from .streaming.stream import serve_tier

        tier_dfs["1m"] = serve_tier(store, "1m")
    return tier_dfs



def _cmd_serve_range(args: argparse.Namespace) -> None:
    """Tier-routed range read over a warehouse written by `run`."""
    from .operators.router import read_routed
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve")
    store = TableStore(spark, args.warehouse)
    # live streaming edge rides in as part of the finest tier
    # (per-bucket batch-wins — serve_quantile does the same via
    # serve_distribution)
    tiers = _load_tier_dfs(store)
    # validate the cover against the retention policy so a range whose
    # fine-tier segments were already expired fails loudly instead of
    # silently undercounting (ADVICE r2)
    horizons, now_epoch = _retention_check_args(args)
    # comma-separated measures read every tier segment ONCE
    measures = tuple(args.measure.split(","))
    df = read_routed(tiers, args.t0, args.t1,
                     measure=measures[0] if len(measures) == 1 else measures,
                     keys=tuple(args.keys.split(",")),
                     retention_horizons=horizons, now_epoch=now_epoch)
    rows = df.limit(args.limit).collect()
    print(json.dumps({"t0": args.t0, "t1": args.t1, "measure": args.measure,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_quantile(args: argparse.Namespace) -> None:
    """Routed quantile over the stored histogram tiers of a warehouse
    written by `run --with-histograms`."""
    from .operators.router import read_routed_quantile
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-q")
    store = TableStore(spark, args.warehouse)
    hists = {t: store.read(f"hist_{t}") for t in ("1m", "1h", "1d", "30d")
             if store.exists(f"hist_{t}")}
    # include the streaming edge when a partial log exists: the merged
    # history+edge read drops in as the finest routed tier
    if store.exists("hist_1m_stream"):
        from .streaming.stream import serve_distribution

        hists["1m"] = serve_distribution(store, series_cols=("lang",))
    if not hists:
        print(json.dumps({"error": "no hist_* tiers in warehouse "
                                   "(run with --with-histograms)"}))
        raise SystemExit(2)
    horizons, now_epoch = _retention_check_args(args)
    df = read_routed_quantile(
        hists, args.t0, args.t1, series_cols=tuple(args.keys.split(",")),
        q_x100=args.q, out_col="q_lo",
        retention_horizons=horizons, now_epoch=now_epoch,
    )
    rows = df.limit(args.limit).collect()
    print(json.dumps({"t0": args.t0, "t1": args.t1, "q": args.q,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_stream(args: argparse.Namespace) -> None:
    """Drain the pages stream into the warehouse (availableNow) and
    optionally fold closed days into the batch tiers — the operational
    form of the streaming edge: run it on a schedule between batch
    pipeline increments."""
    from .streaming.stream import (
        compact_hist_stream_into_batch,
        compact_stream_into_batch,
        start_heavyhitter_stream_to_store,
        start_histogram_stream_to_store,
        start_stream_to_store,
    )
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-stream")
    store = TableStore(spark, args.warehouse)
    q = start_stream_to_store(
        spark, args.input, store, checkpoint_dir=args.checkpoint + "/tier",
        trigger_available_now=True, with_sketches=args.with_sketches,
    )
    q.awaitTermination()
    if args.with_histograms:
        qh = start_histogram_stream_to_store(
            spark, args.input, store, checkpoint_dir=args.checkpoint + "/hist",
            trigger_available_now=True,
        )
        qh.awaitTermination()
    if args.with_heavyhitters:
        qq = start_heavyhitter_stream_to_store(
            spark, args.input, store, checkpoint_dir=args.checkpoint + "/hh",
            trigger_available_now=True,
        )
        qq.awaitTermination()
    result = {"drained": True}
    if args.compact_closed:
        import pyspark.sql.functions as F

        wm = store.read("tier_1m_stream").agg(F.max("bucket_day")).first()[0] \
            if store.exists("tier_1m_stream") else None
        result["compacted_tier_days"] = [
            str(d) for d in compact_stream_into_batch(store, closed_before=wm)
        ]
        if args.with_histograms and store.exists("hist_1m_stream"):
            result["compacted_hist_days"] = [
                str(d) for d in compact_hist_stream_into_batch(store, closed_before=wm)
            ]
    print(json.dumps(result))


def _zero_fill_spine(tier, keys, measure, grain):
    """Dense per-key spine for additive count measures: an empty bucket
    IS zero (unlike LOCF state carry) — missing buckets -> 0."""
    from pyspark.sql import functions as F

    from .operators.bucketing import SECONDS

    secs = SECONDS[grain]
    bounds = tier.groupBy(*keys).agg(
        F.min("bucket_start").alias("_b0"), F.max("bucket_start").alias("_b1")
    )
    spine = bounds.select(
        *keys,
        F.explode(
            F.expr(f"sequence(_b0, _b1, interval {secs} seconds)")
        ).alias("bucket_start"),
    )
    return spine.join(tier, [*keys, "bucket_start"], "left").fillna({measure: 0})


def _cmd_forecast(args: argparse.Namespace) -> None:
    """Per-key Holt(-Winters) forecast over a stored tier (gap-fill the
    tier first for url grain; lang grain is dense already)."""
    from .operators.forecast import holt_forecast
    from .session import get_active_or_build
    from .tables import TableStore

    from pyspark.sql import functions as F

    spark = get_active_or_build(app_name="cfs-forecast")
    store = TableStore(spark, args.warehouse)
    tier = store.read(f"tier_{args.tier}")
    if args.gapfill:
        from .operators.gapfill import gapfill_locf

        tier = gapfill_locf(tier, args.tier)
    keys = args.keys.split(",")
    # collapse to the requested key grain (tier tables are url grain):
    # one row per (keys, bucket)
    tier = tier.groupBy(*keys, "bucket_start").agg(
        F.sum(args.measure).alias(args.measure)
    )
    if args.zero_fill:
        tier = _zero_fill_spine(tier, keys, args.measure, args.tier)
    df = holt_forecast(
        tier, key_cols=tuple(keys), value_col=args.measure,
        alpha=args.alpha, beta=args.beta,
        gamma=args.gamma, period=args.period, horizon=args.horizon,
    )
    rows = df.orderBy(*args.keys.split(","), "step").limit(args.limit).collect()
    print(json.dumps({"tier": args.tier, "measure": args.measure,
                      "horizon": args.horizon,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_forecast(args: argparse.Namespace) -> None:
    """Long-horizon forecast whose INPUT series routes through the tier
    router (VERDICT r3 next-item #8): history far from the edge reads
    coarse tiers, ragged edges read fine ones, everything rebucketed to
    the forecast grain — same fit as the direct-tier ``forecast``
    command on identical data (parity-tested), radically fewer rows
    scanned over long windows."""
    from pyspark.sql import functions as F  # noqa: F401 (spine helper)

    from .operators.bucketing import TIER_ORDER
    from .operators.forecast import holt_forecast
    from .operators.router import read_routed_series
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-forecast")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    series = read_routed_series(
        tier_dfs, args.t0, args.t1, args.grain,
        measure=args.measure, keys=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    )
    # routed series collapse to the requested key grain already (tier
    # tables are url grain -> aggregate over urls happened in the router)
    if args.zero_fill:
        series = _zero_fill_spine(series, keys, args.measure, args.grain)
    df = holt_forecast(
        series, key_cols=tuple(keys), value_col=args.measure,
        alpha=args.alpha, beta=args.beta,
        gamma=args.gamma, period=args.period, horizon=args.horizon,
    )
    rows = df.orderBy(*keys, "step").limit(args.limit).collect()
    print(json.dumps({"grain": args.grain, "measure": args.measure,
                      "t0": args.t0, "t1": args.t1, "horizon": args.horizon,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_cold(args: argparse.Namespace) -> None:
    """Compress-after-age policy: move fully-closed tier days older than
    --before into Gorilla blob cold storage; `serve-range`-style reads
    keep working transparently via read_tier_with_cold."""
    from .operators.cold_store import enforce_cold_policy
    from .operators.retention import _to_epoch
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-cold")
    store = TableStore(spark, args.warehouse)
    moved = enforce_cold_policy(
        store, args.tier, colder_than_epoch=_to_epoch(dt.datetime.fromisoformat(args.before))
    )
    print(json.dumps({"tier": args.tier, "before": args.before,
                      "days_moved": moved}))


def _cmd_serve_chart(args: argparse.Namespace) -> None:
    """Chart-serving path: routed regular series over [t0, t1) at the
    requested grain, decimated to ``--npoints`` per key. Two methods
    (operators/lttb.py), both deterministic across cluster sizes:
    ``lttb`` (default) — exact-integer shape-preserving selection;
    ``m4`` — first/last/min/max per pixel bucket (error-free min/max
    envelope; ≤4 points per bucket, bucket width = range/(npoints/4)
    clamped to the grain). A 2-year dashboard pane reads coarse tiers
    for deep history and ships ~npoints rows per series to the client,
    never 10⁶ buckets."""
    from pyspark.sql import functions as F

    from .operators.bucketing import SECONDS, TIER_ORDER
    from .operators.lttb import lttb_downsample_exact, m4_downsample
    from .operators.router import read_routed_series
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-chart")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    series = read_routed_series(
        tier_dfs, args.t0, args.t1, args.grain,
        measure=args.measure, keys=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    ).select(
        *keys,
        F.col("bucket_start").cast("long").alias("t"),
        F.col(args.measure).cast("long").alias("v"),
    )
    if args.method == "m4":
        # pixel width: the range split across npoints/4 buckets (M4 emits
        # ≤4 points per bucket), never finer than the routed grain
        n_buckets = max(1, args.npoints // 4)
        bsecs = max(SECONDS[args.grain],
                    -(-(args.t1 - args.t0) // n_buckets))
        # t is unique per key in a routed regular series — valid tie id
        out = m4_downsample(series, keys, "t", "v", bsecs, id_col="t",
                            origin=args.t0)
    else:
        out = lttb_downsample_exact(series, keys, "t", "v", args.npoints)
    rows = out.orderBy(*keys, "t").limit(args.limit).collect()
    print(json.dumps({"grain": args.grain, "measure": args.measure,
                      "t0": args.t0, "t1": args.t1, "npoints": args.npoints,
                      "method": args.method,
                      "rows": [r.asDict() for r in rows]}, default=str))



def _cmd_crawl_plan(args: argparse.Namespace) -> None:
    """Crawl planner over the fold history: per-url change-rate recrawl
    schedule (operators/recrawl.py, Cho/Garcia-Molina ratio estimator
    on the fold's text_hash visit history) serialized onto each host's
    politeness grid (running-max closed form of the greedy fetch
    recurrence) — the engine's 'what do we fetch next, and when'
    endpoint. Emits the earliest --limit fetches plus plan totals."""
    from pyspark.sql import functions as F

    from .functions.urls import url_host
    from .operators.recrawl import politeness_schedule, recrawl_schedule
    from .plans.pipeline import FOLD_TABLE
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-crawl-plan")
    store = TableStore(spark, args.warehouse)
    if not store.exists(FOLD_TABLE):
        print(json.dumps({"error": f"no {FOLD_TABLE} table in warehouse "
                                   "(run without --no-fold first)"}))
        raise SystemExit(2)
    ev = store.read(FOLD_TABLE).select(
        "url",
        F.col("warc_ts").cast("timestamp").cast("long").alias("t"),
        F.col("text_hash").alias("fp"),
    )
    due = recrawl_schedule(
        ev, ["url"], "t", "fp",
        min_interval=args.min_interval, max_interval=args.max_interval,
    ).select(
        "url", url_host(F.col("url")).alias("host"),
        F.col("next_due_epoch").alias("due"),
    )
    plan = politeness_schedule(due, "host", "due", ["url"], args.gap)
    n_deferred = 0
    if args.budget is not None:
        # third planner stage: ration --budget fetch slots across hosts
        # by due-url share (largest-remainder, exact integer quotas);
        # each host keeps its politeness-ordered first `quota` fetches,
        # the rest defer to the next cycle
        from .operators.recrawl import apportion_budget

        quotas = apportion_budget(
            due.groupBy("host").agg(F.count(F.lit(1)).alias("n_due")),
            ["host"], "n_due", budget=args.budget,
        )
        plan = plan.join(quotas.select("host", "quota"), "host")
        deferred = plan.where(F.col("fetch_rank") > F.col("quota"))
        plan = plan.where(F.col("fetch_rank") <= F.col("quota")).drop("quota")
        n_deferred = deferred.count()
    plan = plan.persist()
    try:
        totals = plan.agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.max("delay_seconds").alias("max_delay_seconds"),
            F.sum((F.col("delay_seconds") > 0).cast("long")).alias("n_delayed"),
        ).collect()[0]
        rows = plan.orderBy("fetch_epoch", "url").limit(args.limit).collect()
    finally:
        plan.unpersist()
    print(json.dumps({"gap_seconds": args.gap,
                      "n_urls": totals["n_urls"],
                      "n_delayed": totals["n_delayed"],
                      "n_deferred": n_deferred,
                      "budget": args.budget,
                      "max_delay_seconds": totals["max_delay_seconds"],
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_trending(args: argparse.Namespace) -> None:
    """Recency-weighted top-k over the tier store: per-key half-life-
    decayed activity (operators/decay.py) with the INPUT routed through
    the tiers — long history aggregates from coarse buckets, the ragged
    edge from fine ones, every bucket's measure decayed by its bucket
    start against T = --t1. A stored bucket is one decay term, so the
    score is computed from tier rows without touching raw history; the
    plan is the routed read + one hash agg + TakeOrderedAndProject."""
    from pyspark.sql import functions as F

    from .operators.decay import trending_topk
    from .operators.router import read_routed_series
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-trending")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    series = read_routed_series(
        tier_dfs, args.t0, args.t1, args.grain,
        measure=args.measure, keys=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    )
    df = trending_topk(
        series, keys,
        F.col("bucket_start").cast("timestamp").cast("long"),
        t_ref=args.t1, half_life_s=args.half_life, k=args.k,
        weight=F.col(args.measure).cast("double"),
    )
    rows = df.collect()
    print(json.dumps({"grain": args.grain, "measure": args.measure,
                      "t0": args.t0, "t1": args.t1,
                      "half_life": args.half_life,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_sax(args: argparse.Namespace) -> None:
    """Shape-search endpoint: SAX word per key over the routed series
    (operators/sax.py), optionally filtered to keys whose word matches
    ``--like <key>``'s word — "find series shaped like this one". The
    words are exact-integer shape signatures, so the same query on a
    1000-executor cluster returns byte-identical words; matching is a
    word-keyed join, never an all-pairs scan."""
    from pyspark.sql import functions as F

    from .operators.bucketing import TIER_ORDER
    from .operators.router import read_routed_series
    from .operators.sax import paa_segments, sax_words
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-sax")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    series = read_routed_series(
        tier_dfs, args.t0, args.t1, args.grain,
        measure=args.measure, keys=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    ).select(
        *keys,
        F.col("bucket_start").cast("long").alias("t"),
        F.col(args.measure).cast("long").alias("v"),
    )
    paa = paa_segments(series, keys, "t", "v", n_segments=args.segments)
    words = sax_words(paa, keys, alphabet=args.alphabet)
    if args.like is not None:
        # resolve the reference word(s) driver-side: one persisted plan
        # feeds both the lookup and the match (don't recompute the
        # routed read + windows twice), a missing/typo'd key fails
        # loudly instead of masquerading as "unique shape", and a
        # multi-column key (same keys[0] under several secondary keys)
        # matches ANY of its words without duplicating output rows
        words = words.persist()
        ref_words = [
            r["word"]
            for r in words.where(F.col(keys[0]) == args.like)
            .select("word").distinct().collect()
        ]
        if not ref_words:
            print(json.dumps({"error": f"--like key {args.like!r} has no "
                                       f"series in [t0, t1)"}))
            raise SystemExit(2)
        words = words.where(F.col("word").isin(ref_words))
    rows = words.orderBy("word", *keys).limit(args.limit).collect()
    print(json.dumps({"grain": args.grain, "measure": args.measure,
                      "t0": args.t0, "t1": args.t1,
                      "segments": args.segments, "alphabet": args.alphabet,
                      "like": args.like,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_trend(args: argparse.Namespace) -> None:
    """Series-health summary over a routed range: exact-integer linear
    fit (slope per grain step + signed r²), batch changepoint, and max
    drawdown per key — the monitoring endpoint's "is this metric
    trending / when did it turn / how bad was the worst slide" answer,
    computed from the SAME routed read every other serve command uses
    (coarse tiers for deep history, fine near the edges). x is the
    bucket index rebased to t0, so the sufficient-statistic products
    stay far inside decimal(38,0) at any range length."""
    from pyspark.sql import functions as F

    from .operators.bucketing import SECONDS, TIER_ORDER
    from .operators.router import read_routed_series
    from .operators.trend import changepoint, linfit, max_drawdown, theil_sen
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-trend")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    series = read_routed_series(
        tier_dfs, args.t0, args.t1, args.grain,
        measure=args.measure, keys=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    ).select(
        *keys,
        F.col("bucket_start").cast("long").alias("b"),
        F.col(args.measure).cast("long").alias("v"),
    )
    step = SECONDS[args.grain]
    # one routed read feeds all three aggregates (don't re-scan per stat)
    series = series.persist()
    try:
        pts = series.withColumn(
            "x", ((F.col("b") - F.lit(args.t0)) / step).cast("long")
        )
        fit = linfit(pts, keys, "x", "v")
        if getattr(args, "robust", False):
            # Theil-Sen median slope + Mann-Kendall S: one outlier bucket
            # moves the estimate one rank where least squares chases it;
            # pair frame is quadratic in the ROUTED series length (already
            # bounded by the range/grain), keyed, never cartesian
            rob = theil_sen(pts, keys, "x", "v").withColumnRenamed(
                "slope_x1e4", "robust_slope_x1e4"
            )
            fit = fit.join(rob, keys, "left")
        cp = changepoint(series, keys, "b", "v")
        dd = max_drawdown(series, keys, "b", "v")
        # LEFT joins: a single-bucket series has a fit row but no
        # changepoint row (its k<n filter is empty) — the sparse/new
        # series a monitor most needs must still appear
        out = fit.join(cp, keys, "left").join(dd.drop("n_buckets"), keys, "left")
        if getattr(args, "movers", False):
            # top movers: steepest |slope| first (TakeOrderedAndProject;
            # key tiebreak keeps the cut deterministic)
            order = [F.abs(F.col("slope_x1e4")).desc(), *keys]
        else:
            order = list(keys)
        rows = out.orderBy(*order).limit(args.limit).collect()
    finally:
        series.unpersist()
    print(json.dumps({"grain": args.grain, "measure": args.measure,
                      "t0": args.t0, "t1": args.t1,
                      "rows": [r.asDict() for r in rows]}, default=str))



def _cmd_serve_alerts(args: argparse.Namespace) -> None:
    """Hysteresis alert episodes over a routed range: value ≥ --hi
    opens an episode, ≤ --lo closes it, the dead band extends it
    (operators/states.py::alert_episodes) — the alert-rule endpoint
    over the SAME routed read every other serve command uses, so deep
    history evaluates from coarse tiers and the ragged edge from fine
    ones. Integer thresholds on integer measures: the episode set is
    byte-identical at any parallelism."""
    from pyspark.sql import functions as F

    from .operators.router import read_routed_series
    from .operators.states import alert_episodes
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-alerts")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    series = read_routed_series(
        tier_dfs, args.t0, args.t1, args.grain,
        measure=args.measure, keys=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    ).select(
        *keys,
        F.col("bucket_start").cast("long").alias("b"),
        F.col(args.measure).cast("long").alias("v"),
    )
    eps = alert_episodes(series, keys, "b", "v", hi=args.hi, lo=args.lo)
    rows = eps.orderBy(*keys, "episode").limit(args.limit).collect()
    print(json.dumps({"grain": args.grain, "measure": args.measure,
                      "t0": args.t0, "t1": args.t1,
                      "hi": args.hi, "lo": args.lo,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_coverage(args: argparse.Namespace) -> None:
    """Tier-completeness SLA endpoint: per (key, day), how much of the
    chosen tier's expected bucket grid is actually present in the
    warehouse, and the worst contiguous missing run — the freshness
    surface the monitoring console and gap-fill key off
    (operators/states.py::tier_coverage over the STORED tier frame:
    tier rows ARE the grid observations, so coverage is read straight
    off the tier, no raw-event scan). The streaming edge rides in as
    the finest tier (same _load_tier_dfs composition as every other
    serve command), so 'present' includes not-yet-compacted buckets."""
    from pyspark.sql import functions as F

    from .operators.bucketing import SECONDS
    from .operators.states import tier_coverage
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-cov")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    if args.grain not in tier_dfs:
        print(json.dumps({"error": f"no tier_{args.grain} in warehouse"}))
        return
    keys = args.keys.split(",")
    tier = tier_dfs[args.grain]
    tier_secs = SECONDS[args.grain]
    # SLA period: the day grid for sub-day tiers; one bucket for
    # coarser tiers (presence/absence per window — tier_coverage
    # rejects a tier coarser than its period)
    period = max(86400, tier_secs)
    # snap the range OUT to whole periods: a mid-period cut would score
    # the filtered-out buckets as warehouse holes (fabricated "worst
    # days" at every window edge)
    if args.t0 is not None:
        t0 = (args.t0 // period) * period
        tier = tier.where(F.col("bucket_start").cast("timestamp")
                          .cast("long") >= t0)
    if args.t1 is not None:
        t1 = -(-args.t1 // period) * period
        tier = tier.where(F.col("bucket_start").cast("timestamp")
                          .cast("long") < t1)
    cov = tier_coverage(tier.select(*keys, "bucket_start"), keys,
                        "bucket_start", tier_secs=tier_secs,
                        day_secs=period)
    # worst days first: the SLA reader wants the holes, not the 100%s
    rows = (cov.orderBy(F.col("coverage_x1e4").asc(),
                        F.col("day_epoch").asc(), *keys)
            .limit(args.limit).collect())
    print(json.dumps({"grain": args.grain, "keys": args.keys,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_drift(args: argparse.Namespace) -> None:
    """Distribution-drift endpoint: PSI between two routed ranges,
    answered from the stored hist_* tiers (counts are additive, so no
    raw scan); streaming histogram edge rides in as the finest tier
    when present — same composition as serve-quantile."""
    from .operators.bucketing import TIER_ORDER
    from .operators.router import read_routed_drift
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-drift")
    store = TableStore(spark, args.warehouse)
    hists = {t: store.read(f"hist_{t}") for t in TIER_ORDER
             if store.exists(f"hist_{t}")}
    if store.exists("hist_1m_stream"):
        from .streaming.stream import serve_distribution

        hists["1m"] = serve_distribution(store, series_cols=tuple(args.keys.split(",")))
    if not hists:
        print(json.dumps({"error": "no hist_* tiers in warehouse "
                                   "(run with --with-histograms)"}))
        raise SystemExit(2)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    out = read_routed_drift(
        hists, args.a0, args.a1, args.b0, args.b1,
        series_cols=tuple(keys),
        retention_horizons=horizons, now_epoch=now_epoch,
    )
    rows = out.orderBy(*keys).limit(args.limit).collect()
    print(json.dumps({"a": [args.a0, args.a1], "b": [args.b0, args.b1],
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_contribution(args: argparse.Namespace) -> None:
    """Root-cause endpoint: which keys drove the metric change between
    two routed ranges (operators/contribution.py). Each range reads
    through the tier router (coarse tiers for deep history, fine at
    the edges); per-key range totals, signed delta, and exact-integer
    share of the total move, ranked by |delta| — the "explain the
    move" companion to serve-drift's "did the distribution move"."""
    from pyspark.sql import functions as F

    from .operators.contribution import contribution
    from .operators.router import read_routed_series
    from .session import get_active_or_build
    from .tables import TableStore

    if max(args.a0, args.b0) < min(args.a1, args.b1):
        # each routed read returns exactly its requested range; with
        # overlapping ranges the union would carry shared buckets twice
        # and both conditional sums would double-count them
        raise SystemExit("serve-contribution: ranges A and B must be "
                         "disjoint")
    spark = get_active_or_build(app_name="cfs-serve-contribution")
    store = TableStore(spark, args.warehouse)
    tier_dfs = _load_tier_dfs(store)
    keys = args.keys.split(",")
    horizons, now_epoch = _retention_check_args(args)
    parts = []
    for t0, t1 in ((args.a0, args.a1), (args.b0, args.b1)):
        parts.append(
            read_routed_series(
                tier_dfs, t0, t1, args.grain,
                measure=args.measure, keys=tuple(keys),
                retention_horizons=horizons, now_epoch=now_epoch,
            ).select(
                *keys,
                F.col("bucket_start").cast("long").alias("b"),
                F.col(args.measure).cast("long").alias("v"),
            )
        )
    both = parts[0].unionByName(parts[1])
    out = contribution(
        both, keys, "b", "v", args.a0, args.a1, args.b0, args.b1
    )
    rows = (
        out.orderBy(F.abs(F.col("delta")).desc(), *keys)
        .limit(args.limit)
        .collect()
    )
    print(json.dumps({"a": [args.a0, args.a1], "b": [args.b0, args.b1],
                      "grain": args.grain, "measure": args.measure,
                      "rows": [r.asDict() for r in rows]}, default=str))


def _cmd_serve_distinct(args: argparse.Namespace) -> None:
    """Routed distinct-count estimates from the stored HLL sketch tiers
    (history + streaming sketch edge as the finest tier when present)."""
    from .operators.bucketing import TIER_ORDER
    from .operators.router import read_routed_distinct
    from .session import get_active_or_build
    from .tables import TableStore

    spark = get_active_or_build(app_name="cfs-serve-d")
    store = TableStore(spark, args.warehouse)
    sk = {t: store.read(f"sketch_{t}") for t in TIER_ORDER
          if store.exists(f"sketch_{t}")}
    if store.exists("sketch_1m_stream"):
        from .streaming.stream import serve_distinct

        sk["1m"] = serve_distinct(store).select("bucket_start", "lang", "url_sketch")
    horizons, now_epoch = _retention_check_args(args)
    df = read_routed_distinct(sk, args.t0, args.t1,
                              keys=tuple(args.keys.split(",")),
                              retention_horizons=horizons,
                              now_epoch=now_epoch)
    rows = df.limit(args.limit).collect()
    print(json.dumps({"t0": args.t0, "t1": args.t1,
                      "rows": [r.asDict() for r in rows]}, default=str))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="chainalytic_framework_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="one idempotent pipeline increment")
    r.add_argument("--input", required=True, help="pages parquet/Iceberg path")
    r.add_argument("--warehouse", required=True, help="tier/state warehouse root")
    r.add_argument("--metric-set", default="default")
    r.add_argument("--snapshot-id", default="", help="input snapshot lineage id")
    r.add_argument("--no-fold", action="store_true")
    r.add_argument("--with-sketches", action="store_true")
    r.add_argument("--with-histograms", action="store_true")
    r.add_argument("--with-cold-tier", action="store_true")
    r.add_argument("--retention-now", default=None,
                   help="ISO datetime (UTC) to enforce retention against")
    r.set_defaults(fn=_cmd_run)

    s = sub.add_parser("synth", help="generate deterministic synthetic pages")
    s.add_argument("--rows", type=int, required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=_cmd_synth)

    c = sub.add_parser("compact", help="bin-pack small files in oversized partitions")
    c.add_argument("--warehouse", required=True)
    c.add_argument("--table", required=True)
    c.add_argument("--partition-by", default="bucket_day", help="comma-separated")
    c.add_argument("--max-files", type=int, default=4)
    c.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    c.set_defaults(fn=_cmd_compact)

    q = sub.add_parser("query", help="run a named catalog query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help="write parquet instead of printing")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=_cmd_query)

    sv = sub.add_parser("serve-range",
                        help="tier-routed range read from a warehouse")
    sv.add_argument("--warehouse", required=True)
    sv.add_argument("--t0", type=int, required=True, help="epoch secs, 1m-aligned")
    sv.add_argument("--t1", type=int, required=True)
    sv.add_argument("--measure", default="point_count")
    sv.add_argument("--keys", default="url", help="comma-separated grain cols")
    sv.add_argument("--limit", type=int, default=50)
    sv.add_argument("--retention-now", default=None,
                    help="ISO datetime (UTC): validate routed segments "
                         "against the retention policy before reading")
    sv.set_defaults(fn=_cmd_serve_range)

    sq = sub.add_parser("serve-quantile",
                        help="tier-routed quantile from stored histogram tiers")
    sq.add_argument("--warehouse", required=True)
    sq.add_argument("--t0", type=int, required=True, help="epoch secs, 1m-aligned")
    sq.add_argument("--t1", type=int, required=True)
    sq.add_argument("--q", type=int, default=90, help="percentile (integer)")
    sq.add_argument("--keys", default="lang", help="comma-separated series cols")
    sq.add_argument("--limit", type=int, default=50)
    sq.add_argument("--retention-now", default=None)
    sq.set_defaults(fn=_cmd_serve_quantile)

    sm = sub.add_parser("stream", help="drain the pages stream into the warehouse")
    sm.add_argument("--input", required=True, help="pages parquet dir (file stream)")
    sm.add_argument("--warehouse", required=True)
    sm.add_argument("--checkpoint", required=True)
    sm.add_argument("--with-sketches", action="store_true")
    sm.add_argument("--with-histograms", action="store_true")
    sm.add_argument("--with-heavyhitters", action="store_true")
    sm.add_argument("--compact-closed", action="store_true",
                    help="fold closed stream days into the batch tiers")
    sm.set_defaults(fn=_cmd_stream)

    fc = sub.add_parser("forecast", help="Holt(-Winters) forecast over a stored tier")
    fc.add_argument("--warehouse", required=True)
    fc.add_argument("--tier", default="1h")
    fc.add_argument("--measure", default="point_count")
    fc.add_argument("--keys", default="lang", help="comma-separated key cols")
    fc.add_argument("--horizon", type=int, default=12)
    fc.add_argument("--alpha", type=float, default=0.5)
    fc.add_argument("--beta", type=float, default=0.1)
    fc.add_argument("--gamma", type=float, default=None)
    fc.add_argument("--period", type=int, default=None)
    fc.add_argument("--gapfill", action="store_true",
                    help="LOCF gap-fill the tier before fitting (url grain)")
    fc.add_argument("--zero-fill", action="store_true",
                    help="dense per-key spine, missing buckets = 0 "
                         "(additive count measures)")
    fc.add_argument("--limit", type=int, default=50)
    fc.set_defaults(fn=_cmd_forecast)

    sfc = sub.add_parser("serve-forecast",
                         help="router-fed Holt(-Winters) forecast: long "
                              "history aggregates from coarse tiers")
    sfc.add_argument("--warehouse", required=True)
    sfc.add_argument("--t0", type=int, required=True, help="epoch secs, grain-aligned")
    sfc.add_argument("--t1", type=int, required=True, help="epoch secs, grain-aligned")
    sfc.add_argument("--grain", default="1h", help="forecast bucket grain (tier name)")
    sfc.add_argument("--measure", default="point_count")
    sfc.add_argument("--keys", default="lang")
    sfc.add_argument("--horizon", type=int, default=12)
    sfc.add_argument("--alpha", type=float, default=0.5)
    sfc.add_argument("--beta", type=float, default=0.1)
    sfc.add_argument("--gamma", type=float, default=None)
    sfc.add_argument("--period", type=int, default=None)
    sfc.add_argument("--zero-fill", action="store_true")
    sfc.add_argument("--retention-now", default=None,
                     help="ISO datetime; fail loudly if the routed cover "
                          "needs expired fine-tier segments")
    sfc.add_argument("--limit", type=int, default=50)
    sfc.set_defaults(fn=_cmd_serve_forecast)

    cd = sub.add_parser("cold", help="compress-after-age: move closed tier "
                                     "days into Gorilla blob cold storage")
    cd.add_argument("--warehouse", required=True)
    cd.add_argument("--tier", default="1d")
    cd.add_argument("--before", required=True,
                    help="ISO datetime; days fully closed before this move")
    cd.set_defaults(fn=_cmd_cold)

    sch = sub.add_parser("serve-chart",
                         help="routed series decimated to n shape-preserving "
                              "points per key (LTTB) — the dashboard pane path")
    sch.add_argument("--warehouse", required=True)
    sch.add_argument("--t0", type=int, required=True)
    sch.add_argument("--t1", type=int, required=True)
    sch.add_argument("--grain", default="1h")
    sch.add_argument("--measure", default="point_count")
    sch.add_argument("--keys", default="lang")
    sch.add_argument("--npoints", type=int, default=200)
    sch.add_argument("--method", choices=["lttb", "m4"], default="lttb",
                     help="lttb: shape-preserving selection; m4: exact "
                          "min/max envelope per pixel bucket")
    sch.add_argument("--retention-now", default=None,
                     help="ISO datetime; fail loudly if the routed cover "
                          "needs expired fine-tier segments")
    sch.add_argument("--limit", type=int, default=1000)
    sch.set_defaults(fn=_cmd_serve_chart)

    cp = sub.add_parser("crawl-plan",
                        help="recrawl schedule + per-host politeness grid "
                             "from the fold history: what to fetch, when")
    cp.add_argument("--warehouse", required=True)
    cp.add_argument("--gap", type=int, default=600,
                    help="politeness: min seconds between a host's fetches")
    cp.add_argument("--min-interval", type=int, default=3600)
    cp.add_argument("--max-interval", type=int, default=30 * 86400)
    cp.add_argument("--budget", type=int, default=None,
                    help="total fetch slots this cycle, rationed across "
                         "hosts by due-url share (exact largest-remainder "
                         "quotas); over-quota fetches defer")
    cp.add_argument("--limit", type=int, default=100)
    cp.set_defaults(fn=_cmd_crawl_plan)

    str_ = sub.add_parser("serve-trending",
                          help="recency-weighted top-k keys: half-life-"
                               "decayed activity over the routed tiers")
    str_.add_argument("--warehouse", required=True)
    str_.add_argument("--t0", type=int, required=True,
                      help="epoch secs, grain-aligned")
    str_.add_argument("--t1", type=int, required=True,
                      help="epoch secs, grain-aligned; also the decay "
                           "reference time T")
    str_.add_argument("--grain", default="1h")
    str_.add_argument("--measure", default="point_count")
    str_.add_argument("--keys", default="lang")
    str_.add_argument("--half-life", type=int, default=86400,
                      help="decay half-life in seconds")
    str_.add_argument("--k", type=int, default=20)
    str_.add_argument("--retention-now", default=None,
                      help="ISO datetime; fail loudly if the routed cover "
                           "needs expired fine-tier segments")
    str_.set_defaults(fn=_cmd_serve_trending)

    sx = sub.add_parser("serve-sax",
                        help="SAX shape words per key over a routed range; "
                             "--like <key> filters to same-shaped series")
    sx.add_argument("--warehouse", required=True)
    sx.add_argument("--t0", type=int, required=True)
    sx.add_argument("--t1", type=int, required=True)
    sx.add_argument("--grain", default="1h")
    sx.add_argument("--measure", default="point_count")
    sx.add_argument("--keys", default="url")
    sx.add_argument("--segments", type=int, default=8)
    sx.add_argument("--alphabet", type=int, default=4)
    sx.add_argument("--like", default=None,
                    help="key value; return only keys sharing its word")
    sx.add_argument("--retention-now", default=None,
                    help="ISO datetime; fail loudly if the routed cover "
                         "needs expired fine-tier segments")
    sx.add_argument("--limit", type=int, default=100)
    sx.set_defaults(fn=_cmd_serve_sax)

    st_ = sub.add_parser("serve-trend",
                         help="series health over a routed range: exact "
                              "slope/r2, changepoint, max drawdown per key")
    st_.add_argument("--warehouse", required=True)
    st_.add_argument("--t0", type=int, required=True)
    st_.add_argument("--t1", type=int, required=True)
    st_.add_argument("--grain", default="1h")
    st_.add_argument("--measure", default="point_count")
    st_.add_argument("--keys", default="lang")
    st_.add_argument("--retention-now", default=None,
                     help="ISO datetime; fail loudly if the routed cover "
                          "needs expired fine-tier segments")
    st_.add_argument("--limit", type=int, default=100)
    st_.add_argument("--movers", action="store_true",
                     help="rank by |slope| desc (top movers) instead of key")
    st_.add_argument("--robust", action="store_true",
                     help="add Theil-Sen median slope + Mann-Kendall S "
                          "(outlier-resistant trend) per key")
    st_.set_defaults(fn=_cmd_serve_trend)

    sal = sub.add_parser("serve-alerts",
                         help="hysteresis alert episodes over a routed "
                              "range: opens at >=hi, closes at <=lo, "
                              "dead band extends")
    sal.add_argument("--warehouse", required=True)
    sal.add_argument("--t0", type=int, required=True)
    sal.add_argument("--t1", type=int, required=True)
    sal.add_argument("--grain", default="1h")
    sal.add_argument("--measure", default="point_count")
    sal.add_argument("--keys", default="lang")
    sal.add_argument("--hi", type=int, required=True)
    sal.add_argument("--lo", type=int, required=True)
    sal.add_argument("--retention-now", default=None,
                     help="ISO datetime; fail loudly if the routed cover "
                          "needs expired fine-tier segments")
    sal.add_argument("--limit", type=int, default=1000)
    sal.set_defaults(fn=_cmd_serve_alerts)

    scov = sub.add_parser("serve-coverage",
                          help="tier-completeness SLA per (key, day): "
                               "present vs expected buckets + worst "
                               "missing run, worst days first")
    scov.add_argument("--warehouse", required=True)
    scov.add_argument("--grain", default="1m")
    scov.add_argument("--keys", default="lang")
    scov.add_argument("--t0", type=int, default=None)
    scov.add_argument("--t1", type=int, default=None)
    scov.add_argument("--limit", type=int, default=100)
    scov.set_defaults(fn=_cmd_serve_coverage)

    sdr = sub.add_parser("serve-drift",
                         help="PSI distribution drift between two routed "
                              "ranges, from the stored histogram tiers")
    sdr.add_argument("--warehouse", required=True)
    sdr.add_argument("--a0", type=int, required=True)
    sdr.add_argument("--a1", type=int, required=True)
    sdr.add_argument("--b0", type=int, required=True)
    sdr.add_argument("--b1", type=int, required=True)
    sdr.add_argument("--keys", default="lang")
    sdr.add_argument("--retention-now", default=None,
                     help="ISO datetime; fail loudly if either routed cover "
                          "needs expired fine-tier segments")
    sdr.add_argument("--limit", type=int, default=100)
    sdr.set_defaults(fn=_cmd_serve_drift)

    sct = sub.add_parser("serve-contribution",
                         help="which keys drove the metric change between "
                              "two routed ranges (delta + share of move)")
    sct.add_argument("--warehouse", required=True)
    sct.add_argument("--a0", type=int, required=True)
    sct.add_argument("--a1", type=int, required=True)
    sct.add_argument("--b0", type=int, required=True)
    sct.add_argument("--b1", type=int, required=True)
    sct.add_argument("--grain", default="1h")
    sct.add_argument("--measure", default="point_count")
    sct.add_argument("--keys", default="lang")
    sct.add_argument("--retention-now", default=None,
                     help="ISO datetime; fail loudly if either routed cover "
                          "needs expired fine-tier segments")
    sct.add_argument("--limit", type=int, default=100)
    sct.set_defaults(fn=_cmd_serve_contribution)

    sd = sub.add_parser("serve-distinct",
                        help="routed distinct-count estimates from the HLL "
                             "sketch tiers (history+edge)")
    sd.add_argument("--warehouse", required=True)
    sd.add_argument("--t0", type=int, required=True)
    sd.add_argument("--t1", type=int, required=True)
    sd.add_argument("--keys", default="lang")
    sd.add_argument("--retention-now", default=None,
                    help="ISO datetime; fail loudly if the routed cover "
                         "needs expired fine-tier segments")
    sd.add_argument("--limit", type=int, default=100)
    sd.set_defaults(fn=_cmd_serve_distinct)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
