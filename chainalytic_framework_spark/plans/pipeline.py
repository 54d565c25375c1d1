"""Resumable driver pipeline: pending buckets → rollup → cascade →
fold/state → checkpoint.

Work unit: ``bucket_day``. A run:

1. fingerprints the input (lineage snapshot id),
2. computes pending days = input days ∖ committed days (manifest
   anti-join — reference T2 poll loop made deterministic),
3. builds the 1m tier for pending days only and commits it via dynamic
   partition overwrite (idempotent re-runs — T1 semantics without the
   reference's cursor rewind),
4. re-derives each coarser tier's affected partitions FROM THE STORED
   parent tier (continuous-aggregate maintenance: a coarse bucket is
   recomputed from child partials, never from raw pages),
5. updates the per-url fold state table INCREMENTALLY: change events
   commit to FOLD_TABLE, then the state delta merges into only the
   hash-bucket partitions it touches (TableStore.merge_upsert — Iceberg
   MERGE INTO on a cluster, staged dynamic partition overwrite on
   parquet). Out-of-order backfills re-fold ONLY the urls present in
   the backfilled days (semi-joined history scan) and surgically
   replace their fold rows and state rows,
6. appends manifest rows with metrics.

At 10^12 docs each step is one Spark job whose scan is partition-pruned
to the pending days; nothing loops per-bucket on the driver.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bucketing import SECONDS
from ..operators.fold import (
    extract_state,
    fold_observations,
    fold_with_state,
    prepare_observations,
)
from ..operators.registry import downsample_with_spec, get_metric_set, rollup_with_spec
from ..operators.rollup import with_layout_columns
from ..tables import TableStore
from .checkpoint import append_entries, committed_days

TIER_TABLE = "tier_{name}"          # default metric set
TIER_TABLE_NS = "tier_{ms}_{name}"  # non-default sets get their own tables
STATE_TABLE = "fold_state"
FOLD_TABLE = "fold_events"

# Hash-bucket partitioning of the state table: state commits touch only
# the buckets a run's urls land in (merge_upsert), never the full table.
# Size to the cluster: 64 buckets bound sandbox small-file counts; at
# 10^12 urls export SPARK_GRAFT_STATE_BUCKETS=4096+ so one bucket stays
# executor-sized. Changing N on an existing store requires one full
# state rewrite (the partition layout is a function of N).
import os as _os

N_STATE_BUCKETS = int(_os.environ.get("SPARK_GRAFT_STATE_BUCKETS", "64"))


def _tier_table(name: str, metric_set: str = "default") -> str:
    """Tier table name, NAMESPACED by metric set: two sets have
    different column sets, and dynamic partition overwrite into a
    shared path would leave a table whose partitions disagree on
    schema (parquet infers from one footer — later reads fail or
    silently null). The default set keeps the bare name for
    compatibility with the query layer and stored warehouses."""
    if metric_set == "default":
        return TIER_TABLE.format(name=name)
    return TIER_TABLE_NS.format(ms=metric_set, name=name)


def pending_days(spark: SparkSession, pages: DataFrame, store: TableStore,
                 snapshot_id: str, finest: str = "1m") -> list:
    """Candidate days = [min, max] of the input time range (a cheap
    single-column probe), minus committed manifest days. Days inside
    the range with zero rows cost one empty manifest row; never a wrong
    result.

    Timezone-safe: bounds come back as SESSION-timezone (UTC) date
    strings via date_format — never driver-local datetime rendering,
    which would shift day boundaries on a non-UTC driver and silently
    orphan boundary rows. If ``snapshot_id`` is non-empty, only days
    committed against THAT snapshot count as done, so a day re-delivered
    under a new input snapshot is reprocessed (idempotent overwrite)."""
    import datetime as _dt

    r = pages.agg(
        F.date_format(F.min("warc_ts"), "yyyy-MM-dd").alias("lo"),
        F.date_format(F.max("warc_ts"), "yyyy-MM-dd").alias("hi"),
    ).first()
    if r["lo"] is None:
        return []
    lo = _dt.date.fromisoformat(r["lo"])
    hi = _dt.date.fromisoformat(r["hi"])
    all_days = [lo + _dt.timedelta(days=i) for i in range((hi - lo).days + 1)]
    committed = committed_days(store, finest, snapshot_id=snapshot_id or None)
    if committed is None:
        return all_days
    done = {row["day"] for row in committed.collect()}
    return [d for d in all_days if d not in done]


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store: TableStore,
    grain: str = "url",
    metric_set: str = "default",
    input_snapshot_id: str = "",
    with_fold: bool = True,
    persist_observations: bool = True,
    with_cold_tier: bool = False,
    cold_source_tier: str = "1d",
    with_sketches: bool = False,
    with_histograms: bool = False,
    enforce_retention_now=None,
) -> dict:
    t_run = time.perf_counter()
    ms = get_metric_set(metric_set)
    finest = ms.finest()
    pend = pending_days(spark, pages, store, input_snapshot_id, finest=finest)
    if not pend:
        return {"pending_days": 0, "docs": 0, "wall_seconds": 0.0}

    psel = pages.where(F.to_date("warc_ts").isin(pend))
    entries = []

    # ---- ONE raw scan: narrow pages to observations (blobs → lengths
    # in the scan projection), persist; both the 1m tier and the fold
    # read this. At 10^12 docs persist() spills to local disk — still
    # far cheaper than a second pass over the html column.
    obs = prepare_observations(psel)
    if persist_observations:
        from pyspark import StorageLevel

        # NOTE (r06, measured and rejected): persisting this frame
        # repartition(url) makes HashPartitioning(url) satisfy both the
        # fold window's and the finest rollup's required distributions
        # (0 exchanges above the cache scan, verified), but the bench
        # got SLOWER — the saved exchanges ran inside the CONCURRENT
        # chains where they overlap, while the url repartition pays on
        # the serial materialization path before any chain starts.
        obs = obs.persist(StorageLevel.MEMORY_AND_DISK)
        # materialize ONCE before the concurrent chains launch: without
        # this, the tier chain and the fold chain would race to compute
        # the same cached partitions and duplicate the raw html scan —
        # the single most expensive pass of the whole run
        obs.count()

    # n_in (input docs) is produced inside the tier chain (Σ point_count
    # of the written 1m rows — no second raw scan); concurrent chains
    # stamp a placeholder and the join point below fills it in.
    n_in = 0

    def _cold_chain():
        ents = []
        # ---- optional: cold-tier blobs for the coarse tier ----
        t0 = time.perf_counter()
        from ..operators.cold_store import encode_cold

        cold = encode_cold(store.read(_tier_table(cold_source_tier, ms.name)))
        store.write(cold, f"cold_{cold_source_tier}")
        ents.append(
            dict(tier=f"cold_{cold_source_tier}",
                 bucket_range_start=dt.datetime.combine(pend[0], dt.time()),
                 bucket_range_end=dt.datetime.combine(pend[-1], dt.time()) + dt.timedelta(days=1),
                 input_snapshot_id=input_snapshot_id, rows_in=-1, rows_out=0,
                 wall_seconds=time.perf_counter() - t0, docs_per_sec=0.0)
        )

        return ents

    def _cascade_chain():
        # ---- finest tier + downsample cascade + cold tier ----
        nonlocal n_in
        ents = []
        t0 = time.perf_counter()
        if "url_hash" in obs.columns and "url" in obs.columns:
            # FUSED rollup+layout+clustering (r06): repartition the
            # SOURCE rows on (bucket_day, url_hash group) and lead the
            # grouping key with those columns — the aggregate's
            # distribution is then already satisfied AND already the
            # write layout, so the chain pays one exchange where the
            # round-5 plan paid two (agg shuffle + cluster shuffle).
            from ..operators.registry import rollup_with_spec_clustered

            m1 = rollup_with_spec_clustered(
                obs, ms, finest, spark.sparkContext.defaultParallelism
            )
        else:
            m1 = with_layout_columns(rollup_with_spec(obs, ms, finest))
            # hash clustering, not range: repartitionByRange runs a
            # sampling job that re-executes the rollup (even off
            # persisted obs it is a second full aggregation); hash gets
            # bounded files + local url_hash clustering with ONE shuffle
            # (same switch that bought the fold commit +25-46% in r2)
            m1 = store.cluster_for_write_hash(m1, ["bucket_day"])
        # keep the clustered finest frame for the cascade + day stats:
        # this run's written pend-day partitions ARE this frame, so
        # single-day-grain children and the manifest agg read it from
        # cache instead of re-scanning the just-written parquet (at
        # scale the persist spills to local disk — same cost as the
        # read-back it replaces, minus the commit round-trip)
        from pyspark import StorageLevel

        m1 = m1.persist(StorageLevel.MEMORY_AND_DISK)
        store.overwrite_partitions(m1, _tier_table(finest, ms.name), ["bucket_day"])
        wall = time.perf_counter() - t0
        # one manifest row PER DAY — the resume anti-join's work unit.
        day_stats = (
            m1.groupBy("bucket_day")
            .agg(F.count(F.lit(1)).alias("rows_out"), F.sum("point_count").alias("docs"))
            .collect()
        )
        day_counts = {r["bucket_day"]: r["rows_out"] for r in day_stats}
        n_in = int(sum(r["docs"] for r in day_stats))
        for d in pend:
            ents.append(
                dict(tier=finest, bucket_range_start=dt.datetime.combine(d, dt.time()),
                     bucket_range_end=dt.datetime.combine(d, dt.time()) + dt.timedelta(days=1),
                     input_snapshot_id=input_snapshot_id, rows_in=n_in,
                     rows_out=int(day_counts.get(d, 0)),
                     wall_seconds=wall, docs_per_sec=n_in / wall if wall > 0 else 0.0)
            )

        # each scheduled coarser tier derives from its parent; a child
        # whose buckets fit inside single days reads the parent rows this
        # run just wrote — still cached — while multi-day children
        # (30d windows reach beyond the pending days) read the STORED
        # parent table for history outside the run's window
        mem_parents = {finest: m1}
        cached = [m1]
        for child, parent in ms.cascade_pairs():
            t0 = time.perf_counter()
            csecs = SECONDS[child]
            if csecs > 86400:
                # child buckets span multiple days: re-derive every child
                # window covering the pending days — all in UTC epochs
                # (calendar.timegm), never driver-local time
                import calendar

                starts = sorted(
                    {(calendar.timegm(d.timetuple()) // csecs) * csecs for d in pend}
                )
                # compare in EPOCH space: a naive-datetime literal is
                # interpreted in the driver's LOCAL timezone by
                # TimestampType.toInternal, which on a non-UTC driver shifts
                # the [lo, hi) window and silently drops edge parent rows.
                lo_e, hi_e = min(starts), max(starts) + csecs
                src = store.read(_tier_table(parent, ms.name)).where(
                    (F.col("bucket_start").cast("long") >= F.lit(lo_e))
                    & (F.col("bucket_start").cast("long") < F.lit(hi_e))
                )
            elif parent in mem_parents:
                src = mem_parents[parent]
            else:
                src = store.read(_tier_table(parent, ms.name)).where(
                    F.col("bucket_day").isin(pend)
                )
            psrc = src.drop("bucket_day", "url_bucket")
            if "url_hash" in psrc.columns and "url" in psrc.columns:
                # fused agg+layout exchange, same as the finest tier
                from ..operators.registry import downsample_with_spec_clustered

                out = downsample_with_spec_clustered(
                    psrc, ms, child, spark.sparkContext.defaultParallelism
                )
            else:
                out = with_layout_columns(downsample_with_spec(psrc, ms, child))
                out = store.cluster_for_write_hash(out, ["bucket_day"])
            if csecs <= 86400:
                out = out.persist(StorageLevel.MEMORY_AND_DISK)
                cached.append(out)
                mem_parents[child] = out
            store.overwrite_partitions(out, _tier_table(child, ms.name), ["bucket_day"])
            wall = time.perf_counter() - t0
            ents.append(
                dict(tier=child, bucket_range_start=dt.datetime.combine(pend[0], dt.time()),
                     bucket_range_end=dt.datetime.combine(pend[-1], dt.time()) + dt.timedelta(days=1),
                     input_snapshot_id=input_snapshot_id, rows_in=-1, rows_out=0,
                     wall_seconds=wall, docs_per_sec=0.0)
            )

        for df in cached:
            df.unpersist()
        if with_cold_tier:
            ents.extend(_cold_chain())
        return ents

    def _sketch_chain():
        ents = []
        # ---- optional: HLL distinct-url sketch tiers ----
        # Mergeable partials (operators/sketches.py): the finest sketch tier
        # reads the persisted obs (urls seen once), coarser tiers union the
        # stored child sketches — distinct counts at any grain without ever
        # re-shuffling the url key space.
        from ..operators.sketches import url_sketch_downsample, url_sketch_rollup

        t0 = time.perf_counter()
        sk = url_sketch_rollup(obs, finest).withColumn(
            "bucket_day", F.to_date("bucket_start")
        )
        store.overwrite_partitions(sk, f"sketch_{finest}", ["bucket_day"])
        for child, parent in ms.cascade_pairs():
            pdf = store.read(f"sketch_{parent}")
            csecs = SECONDS[child]
            if csecs <= 86400:
                pdf = pdf.where(F.col("bucket_day").isin(pend))
            else:
                # same epoch-window pruning as the numeric cascade: only
                # parent sketches inside the affected child windows —
                # otherwise every incremental run re-unions the ENTIRE
                # sketch history and rewrites every coarse partition
                import calendar

                starts = sorted(
                    {(calendar.timegm(d.timetuple()) // csecs) * csecs for d in pend}
                )
                lo_e, hi_e = min(starts), max(starts) + csecs
                pdf = pdf.where(
                    (F.col("bucket_start").cast("long") >= F.lit(lo_e))
                    & (F.col("bucket_start").cast("long") < F.lit(hi_e))
                )
            out = url_sketch_downsample(pdf.drop("bucket_day"), child).withColumn(
                "bucket_day", F.to_date("bucket_start")
            )
            store.overwrite_partitions(out, f"sketch_{child}", ["bucket_day"])
        ents.append(
            dict(tier="sketches", bucket_range_start=dt.datetime.combine(pend[0], dt.time()),
                 bucket_range_end=dt.datetime.combine(pend[-1], dt.time()) + dt.timedelta(days=1),
                 input_snapshot_id=input_snapshot_id, rows_in=-1, rows_out=0,
                 wall_seconds=time.perf_counter() - t0, docs_per_sec=0.0)
        )

        return ents

    def _hist_chain():
        ents = []
        # ---- optional: text-length histogram tiers ----
        # Distribution partials (operators/histogram.py): data-independent
        # leading-decimal-digit buckets, so coarser tiers merge stored child
        # counts losslessly — quantile dashboards never touch raw. Same
        # incremental cascade pruning as the numeric/sketch tiers.
        from ..operators.histogram import histogram_downsample, histogram_rollup

        t0 = time.perf_counter()
        fsecs = SECONDS[finest]
        be = (F.col("warc_ts").cast("long") / fsecs).cast("long") * fsecs
        h = histogram_rollup(obs, be, ["lang"], F.col("text_len")).withColumn(
            "bucket_day", F.to_date(F.col("bucket_epoch").cast("timestamp"))
        )
        store.overwrite_partitions(h, f"hist_{finest}", ["bucket_day"])
        for child, parent in ms.cascade_pairs():
            pdf = store.read(f"hist_{parent}")
            csecs = SECONDS[child]
            if csecs <= 86400:
                pdf = pdf.where(F.col("bucket_day").isin(pend))
            else:
                import calendar

                starts = sorted(
                    {(calendar.timegm(d.timetuple()) // csecs) * csecs for d in pend}
                )
                lo_e, hi_e = min(starts), max(starts) + csecs
                pdf = pdf.where(
                    (F.col("bucket_epoch") >= F.lit(lo_e))
                    & (F.col("bucket_epoch") < F.lit(hi_e))
                )
            out = histogram_downsample(pdf.drop("bucket_day"), ["lang"], csecs).withColumn(
                "bucket_day", F.to_date(F.col("bucket_epoch").cast("timestamp"))
            )
            store.overwrite_partitions(out, f"hist_{child}", ["bucket_day"])
        ents.append(
            dict(tier="histograms",
                 bucket_range_start=dt.datetime.combine(pend[0], dt.time()),
                 bucket_range_end=dt.datetime.combine(pend[-1], dt.time()) + dt.timedelta(days=1),
                 input_snapshot_id=input_snapshot_id, rows_in=-1, rows_out=0,
                 wall_seconds=time.perf_counter() - t0, docs_per_sec=0.0)
        )

        return ents

    def _fold_chain():
        ents = []
        # ---- stateful fold: change-event stream + state table ----
        # The fold runs ONCE: its per-observation change events (is_new /
        # text_changed / gap / expiry) are committed to FOLD_TABLE first
        # (idempotent by day), then the state update is derived from the
        # WRITTEN rows — no recomputation of the pandas stage.
        t0 = time.perf_counter()
        state = store.read(STATE_TABLE) if store.exists(STATE_TABLE) else None
        rebuild = False
        if state is not None:
            watermark = state.agg(F.max(F.to_date("last_ts"))).first()[0]
            rebuild = watermark is not None and min(pend) <= watermark

        sb = F.pmod(F.col("url_hash"), F.lit(N_STATE_BUCKETS)).cast("int")
        if rebuild:
            # TARGETED backfill re-fold: an out-of-order day only
            # perturbs the fold state of urls PRESENT in that day — so
            # re-fold exactly those urls over their full history (one
            # semi-joined scan + a pandas fold sized to the touched
            # urls), then surgically replace their rows in FOLD_TABLE
            # (within the day partitions they appear in) and their state
            # rows (within the hash buckets they land in). Untouched
            # urls' fold rows, day partitions, and state buckets are
            # never read or rewritten. The previous design re-folded the
            # ENTIRE raw history on any backfill.
            from pyspark import StorageLevel

            touched = obs.select("url").distinct()
            hist = prepare_observations(pages).join(touched, "url", "left_semi")
            restated = fold_observations(hist).withColumn(
                "bucket_day", F.to_date("warc_ts")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            store.merge_upsert(
                restated, FOLD_TABLE, key="url", partition_col="bucket_day",
                single_row_per_key=False,
            )
            delta_state = extract_state(restated).withColumn("state_bucket", sb)
            store.merge_upsert(delta_state, STATE_TABLE, key="url",
                               partition_col="state_bucket")
            restated.unpersist()
        else:
            # Forward (in-order) run: fold pending days on top of the
            # carried state; change events committed to FOLD_TABLE
            # first, then the state delta is derived from the WRITTEN
            # rows (no recomputation of the pandas stage) and merged
            # into only the touched state buckets.
            if state is not None:
                fold_out = fold_with_state(obs, state)
            else:
                fold_out = fold_observations(obs)
            from pyspark import StorageLevel

            # persist the fold at the WINDOW's url partitioning (r06):
            # the day-clustered table write re-shuffles anyway, but the
            # state delta's groupBy(url, url_hash) is satisfied by the
            # cached url partitioning — deriving state from the
            # day-clustered frame (round 5) paid a second full-fold
            # shuffle just to undo the day layout. Two consumers run
            # sequentially, so the first (the commit) materializes the
            # cache; no concurrent first-reader duplication.
            fold_out = fold_out.withColumn(
                "bucket_day", F.to_date("warc_ts")
            ).persist(StorageLevel.MEMORY_AND_DISK)
            # hash clustering, NOT range: repartitionByRange's sampling
            # job would recompute the entire fold a second time
            fold_days = store.cluster_for_write_hash(
                fold_out, ["bucket_day"], secondary="url_hash",
            )
            store.overwrite_partitions(fold_days, FOLD_TABLE, ["bucket_day"])
            delta_state = extract_state(fold_out).withColumn("state_bucket", sb)
            store.merge_upsert(delta_state, STATE_TABLE, key="url",
                               partition_col="state_bucket")
            fold_out.unpersist()
        wall = time.perf_counter() - t0
        ents.append(
            dict(tier="fold", bucket_range_start=dt.datetime.combine(pend[0], dt.time()),
                 bucket_range_end=dt.datetime.combine(pend[-1], dt.time()) + dt.timedelta(days=1),
                 input_snapshot_id=input_snapshot_id, rows_in=-1, rows_out=0,
                 wall_seconds=wall, docs_per_sec=0.0)
        )

        return ents

    def _user_fold_chain():
        ents = []
        # ---- user metric-set fold (the registry's Transform hook) ----
        # Contract: ms.fold(obs) returns a DataFrame carrying warc_ts; the
        # pipeline derives bucket_day and commits it with the same
        # idempotent dynamic-partition-overwrite as the built-in fold.
        t0 = time.perf_counter()
        user_out = ms.fold(obs).withColumn("bucket_day", F.to_date("warc_ts"))
        store.overwrite_partitions(
            store.cluster_for_write_hash(user_out, ["bucket_day"]),
            f"fold_{ms.name}", ["bucket_day"],
        )
        ents.append(
            dict(tier=f"fold_{ms.name}",
                 bucket_range_start=dt.datetime.combine(pend[0], dt.time()),
                 bucket_range_end=dt.datetime.combine(pend[-1], dt.time()) + dt.timedelta(days=1),
                 input_snapshot_id=input_snapshot_id, rows_in=-1, rows_out=0,
                 wall_seconds=time.perf_counter() - t0, docs_per_sec=0.0)
        )

        return ents

    # ---- independent chains run CONCURRENTLY ----
    # After the finest tier commits, the numeric cascade (+cold tier),
    # sketch, histogram, and fold chains share no tables, so their jobs
    # are submitted from separate driver threads and the Spark scheduler
    # overlaps them — none of these stages saturates the executors on
    # its own, so pipeline wall drops from sum-of-chains toward
    # max-of-chains. Within a chain, commit order (and therefore resume
    # semantics) is unchanged; parquet dynamic overwrite uses per-write
    # options, so threads share no session conf.
    chains = [_cascade_chain]
    if with_sketches:
        chains.append(_sketch_chain)
    if with_histograms:
        chains.append(_hist_chain)
    if with_fold:
        chains.append(_fold_chain)
    if ms.fold is not None:
        chains.append(_user_fold_chain)
    if len(chains) == 1:
        entries.extend(chains[0]())
    else:
        from concurrent.futures import ThreadPoolExecutor

        # One scheduler POOL per chain (ADVICE r4): spark.scheduler.mode
        # =FAIR alone round-robins across POOLS, but every job lands in
        # the single 'default' pool (internally FIFO) unless its thread
        # names one. setLocalProperty is thread-local (pinned-thread
        # mode), so tagging here gives each chain its own pool; pools
        # need no allocation file — unconfigured pools get weight 1 and
        # the FAIR root shares tasks evenly across them. Within a pool
        # FIFO is right: a chain's jobs are sequential anyway.
        #
        # Pools only when slots outnumber one chain's useful width
        # (VERDICT r4 item 4): on a narrow cluster (< 16 slots)
        # round-robining 4-5 chains across cores a single chain could
        # saturate just breaks cache locality and stretches every
        # chain's tail — there, all jobs stay in 'default' (FIFO) and
        # chains overlap only in each other's shuffle gaps, which is
        # the narrow side's best case.
        sc = spark.sparkContext
        import os as _os

        _pool_env = _os.environ.get("SPARK_GRAFT_CHAIN_POOLS")
        use_pools = (sc.defaultParallelism >= 16 if _pool_env is None
                     else _pool_env == "1")

        def _in_pool(fn):
            def run():
                if use_pools:
                    sc.setLocalProperty("spark.scheduler.pool", fn.__name__)
                try:
                    return fn()
                finally:
                    if use_pools:
                        sc.setLocalProperty("spark.scheduler.pool", None)
            return run

        with ThreadPoolExecutor(max_workers=len(chains)) as ex:
            for fut in [ex.submit(_in_pool(c)) for c in chains]:
                entries.extend(fut.result())  # re-raises chain errors

    # chains that ran concurrently with the tier chain stamped a
    # placeholder for the input-doc count; fill it now that the tier
    # chain's day_stats committed n_in
    for e in entries:
        if e["rows_in"] == -1:
            e["rows_in"] = n_in
            w = e["wall_seconds"]
            e["docs_per_sec"] = n_in / w if w > 0 else 0.0

    # ---- optional: retention enforcement (after coarser covers commit) ----
    if enforce_retention_now is not None:
        from ..operators.retention import enforce_retention

        # each scheduled tier's ACTUAL coarser cover comes from the
        # metric set's schedule (sets may skip tiers, e.g. 1m → 1d
        # directly) — the global TIER_ORDER chain would name a tier
        # that never exists, the clamp would never engage, and fine
        # buckets could be dropped with no committed cover
        cover = {parent: child for child, parent in ms.cascade_pairs()}
        for tname, cov in cover.items():
            pmax = None
            if store.exists(_tier_table(cov, ms.name)):
                # collect as EPOCH — collecting a TimestampType renders a
                # driver-local naive datetime (fromInternal), which would
                # shift retention math off-UTC on a non-UTC driver
                pmax = (
                    store.read(_tier_table(cov, ms.name))
                    .agg(F.max(F.col("bucket_start").cast("long")))
                    .first()[0]
                )
            enforce_retention(
                store, _tier_table(tname, ms.name), tname, enforce_retention_now,
                parent_committed_max=pmax, parent_name=cov,
            )

    if persist_observations:
        obs.unpersist()
    append_entries(spark, store, entries)
    total = time.perf_counter() - t_run
    return {
        "pending_days": len(pend),
        # inclusive day range this run touched — callers bound follow-up
        # reads (e.g. gap-fill spine) to it instead of all history
        "pending_range": (pend[0], pend[-1]),
        "docs": n_in,
        "wall_seconds": round(total, 3),
        "docs_per_sec": round(n_in / total, 1) if total > 0 else 0.0,
    }
