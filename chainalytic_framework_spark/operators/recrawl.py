"""Change-rate recrawl scheduling: when to fetch each url again.

A crawl pipeline's derive step per url: from the observed fingerprint
history (did the extracted text change between visits?), estimate the
page's change interval and schedule the next fetch.  This is the
frequency-estimation half of Cho & Garcia-Molina, "Estimating Frequency
of Change" (ACM TOIT 2003) — here the simple ratio estimator
``span / changes`` kept in exact integer seconds so the schedule is
bit-identical at any parallelism (their bias-corrected
``-ln((n−X+0.5)/(n+0.5))`` refinement swaps in as one expression if a
deployment wants it; it only reweights the same sufficient statistics).

Per key the operator emits sufficient statistics + decision:

- ``n_obs``          observations,
- ``n_changes``      visits whose fingerprint differs from the prior
                     visit (first visit is not a change),
- ``span_seconds``   last_ts − first_ts,
- ``interval_seconds`` = span div changes, clamped to
                     [min_interval, max_interval]; a url never seen to
                     change gets max_interval (stop burning fetches),
- ``next_due_epoch`` = last_ts + interval_seconds.

Scale: one window family partitioned by key for the change lag, then
one hash-partitioned groupBy with map-side combine — the same
single-shuffle shape as the fold family (``operators/fold.py``).  At
10^12 documents output is |urls| rows, all integer columns.

Reference analogue: chainalytic's upstream fetch loop re-polls every
block height unconditionally
(/root/reference/src/chainalytic/zones/public-icon/upstream/data_feeder.py);
a web corpus cannot afford unconditional refetch, so the engine adds
the scheduling derive the reference never needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    obs: DataFrame,
    key_cols: list[str],
    ts_epoch_col: str,
    fingerprint_col: str,
    min_interval: int = 3600,
    max_interval: int = 30 * 86400,
) -> DataFrame:
    """Per-key recrawl decision from a visit log.

    ``obs`` has one row per (key, visit): ``ts_epoch_col`` BIGINT epoch
    seconds (unique per key — visit times), ``fingerprint_col`` any
    equality-comparable content fingerprint (xxhash64 of extracted
    text in the pipeline; see ``functions/text.py::fingerprint``).
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_epoch_col)
    lagged = obs.select(
        *key_cols,
        F.col(ts_epoch_col).alias("_ts"),
        (
            F.lag(fingerprint_col).over(w).isNotNull()
            & (F.col(fingerprint_col) != F.lag(fingerprint_col).over(w))
        )
        .cast("int")
        .alias("_chg"),
    )
    agg = lagged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.min("_ts").alias("_first"),
        F.max("_ts").alias("_last"),
    )
    span = F.col("_last") - F.col("_first")
    raw = F.when(
        F.col("n_changes") > 0, F.expr("(_last - _first) div n_changes")
    ).otherwise(F.lit(int(max_interval)))
    interval = F.least(
        F.lit(int(max_interval)), F.greatest(F.lit(int(min_interval)), raw)
    )
    return agg.select(
        *key_cols,
        "n_obs",
        "n_changes",
        span.cast("long").alias("span_seconds"),
        interval.cast("long").alias("interval_seconds"),
        (F.col("_last") + interval).cast("long").alias("next_due_epoch"),
    )


def politeness_schedule(
    due: DataFrame,
    host_col: str,
    due_epoch_col: str,
    key_cols: list[str],
    gap_seconds: int,
) -> DataFrame:
    """Per-host politeness scheduling: serialize each host's due
    fetches onto a minimum-gap grid — the crawl planner's second half
    (:func:`recrawl_schedule` says WHEN a url is due; this says when it
    is actually FETCHED, one request per ``gap_seconds`` per host).

    The greedy schedule (every fetch as early as allowed) is the
    recurrence ``fetch_i = max(due_i, fetch_{i-1} + gap)``, which has a
    closed form as a running max — substitute ``adj_i = due_i − gap·i``
    over the host's due-ordered rank i and the recurrence collapses to

        fetch_i = gap·i + max_{j ≤ i} adj_j

    so one rank window + one running-max window per host computes the
    whole schedule with NO sequential fold and no recursion — exact
    integer seconds, deterministic at any parallelism (ties on the due
    time are broken by ``key_cols``). ``delay_seconds`` = fetch − due
    is the politeness-induced backlog (a host whose p95 delay grows has
    more due urls per gap than the grid admits — raise the gap or shard
    the host).

    Output: key_cols + host + (due_epoch, fetch_epoch, delay_seconds,
    fetch_rank).

    Scale: both windows partition by HOST — bounded by a host's url
    count, never corpus size; hot hosts are exactly the salting story
    the tier engine already documents (operators/bucketing.py), and the
    schedule itself is the reason hot hosts stay bounded: a host admits
    span/gap fetches per window no matter how many urls want in.

    Reference analogue: the reference fetches one chain head serially
    (upstream/data_feeder.py poll loop) — the politeness constraint IS
    its whole ingest model; here it is re-derived per host as a closed
    form over the distributed frontier.
    """
    w = Window.partitionBy(host_col).orderBy(due_epoch_col, *key_cols)
    g = int(gap_seconds)
    ranked = due.select(
        *key_cols,
        host_col,
        F.col(due_epoch_col).cast("long").alias("due_epoch"),
        (F.row_number().over(w) - 1).alias("_rn"),
    )
    adj = (F.col("due_epoch") - F.lit(g) * F.col("_rn")).alias("_adj")
    runmax = F.max("_adj").over(
        Window.partitionBy(host_col)
        .orderBy("due_epoch", *key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sched = ranked.withColumn("_adj", adj).withColumn(
        "fetch_epoch", (F.lit(g) * F.col("_rn") + runmax).cast("long")
    )
    return sched.select(
        *key_cols,
        host_col,
        "due_epoch",
        "fetch_epoch",
        (F.col("fetch_epoch") - F.col("due_epoch")).cast("long").alias(
            "delay_seconds"
        ),
        (F.col("_rn") + 1).cast("long").alias("fetch_rank"),
    )


def apportion_budget(
    weights: DataFrame,
    key_cols: list[str],
    weight_col: str,
    budget: int,
    shards: int = 64,
) -> DataFrame:
    """Integer fair-share of a global fetch budget across hosts by the
    largest-remainder (Hamilton) method — the crawl planner's third
    stage (:func:`recrawl_schedule` says when urls are due,
    :func:`politeness_schedule` serializes each host, this decides how
    many fetch slots each host GETS when the fleet can do only
    ``budget`` fetches this cycle).

    Exact by construction: with W = Σ weights,

        quota_i = (budget·w_i) div W  +  1[rank_i ≤ R]
        R       = budget − Σ_i (budget·w_i) div W

    where rank_i orders hosts by (remainder (budget·w_i) mod W DESC,
    key ASC) — a total deterministic order, so quotas are bit-identical
    at any parallelism and Σ quota_i = budget EXACTLY (never the
    off-by-a-few that float shares + rounding give). The per-row
    product is taken in decimal(38,0) (ANSI overflow THROWS, never
    wraps), so any budget·weight a BIGINT corpus can produce is safe.

    Scale shape: the weight total and the floor-sum are two scalar aggs
    (bounded driver data — same contract as the centroid seeds);
    the +1 bonus set needs the top-R remainders, computed two-phase
    like ``functions/text.py::ngram_counts``: a per-shard
    row_number pre-prune keeps ≤ min(R, shard size) rows per shard, then
    the final global rank window sorts ≤ R·shards survivors — never a
    single-task sort of the whole host axis. The bonus flag joins back
    on the host key. Zero-weight hosts get quota 0 (never a bonus slot:
    their remainder is 0 and ties sort after any positive remainder
    only by key — they are excluded outright to keep the rule honest).

    Returns key_cols + (weight, quota) with Σ quota = budget.

    Reference analogue: none — the reference polls one upstream
    unconditionally; a crawl fleet must ration fetches across millions
    of hosts (north-rule crawl-scheduling tooling).
    """
    if budget < 0:
        raise ValueError(f"budget must be ≥ 0: {budget}")
    dec = "decimal(38,0)"
    pos = weights.where(F.col(weight_col) > 0)
    tot = pos.agg(F.sum(F.col(weight_col).cast("long")).alias("w")).collect()
    w_total = int(tot[0]["w"] or 0)
    if w_total == 0 or budget == 0:
        return weights.select(
            *key_cols,
            F.col(weight_col).cast("long").alias("weight"),
            F.lit(0).cast("long").alias("quota"),
        )
    prod = (F.lit(int(budget)).cast(dec) * F.col(weight_col).cast(dec)).cast(dec)
    based = pos.select(
        *key_cols,
        F.col(weight_col).cast("long").alias("weight"),
        F.expr(
            f"CAST(CAST({budget} AS {dec}) * CAST({weight_col} AS {dec})"
            f" div CAST({w_total} AS {dec}) AS BIGINT)"
        ).alias("_base"),
        (prod % F.lit(w_total).cast(dec)).cast("long").alias("_rem"),
    )
    floor_sum = int(based.agg(F.sum("_base").alias("s")).collect()[0]["s"] or 0)
    r = int(budget) - floor_sum
    if r > 0:
        shard = F.pmod(F.xxhash64(*key_cols), F.lit(int(shards)))
        w_local = Window.partitionBy(shard).orderBy(F.desc("_rem"), *key_cols)
        pruned = (
            based.withColumn("_prn", F.row_number().over(w_local))
            .where(F.col("_prn") <= r)
            .drop("_prn")
        )
        w_glob = Window.orderBy(F.desc("_rem"), *key_cols)
        bonus = (
            pruned.withColumn("_grn", F.row_number().over(w_glob))
            .where(F.col("_grn") <= r)
            .select(*key_cols, F.lit(1).cast("long").alias("_bonus"))
        )
        based = based.join(bonus, key_cols, "left")
    else:
        based = based.withColumn("_bonus", F.lit(None).cast("long"))
    quotas = based.select(
        *key_cols,
        "weight",
        (F.col("_base") + F.coalesce(F.col("_bonus"), F.lit(0)))
        .cast("long")
        .alias("quota"),
    )
    zeros = weights.where(
        F.col(weight_col).isNull() | (F.col(weight_col) <= 0)
    ).select(
        *key_cols,
        F.col(weight_col).cast("long").alias("weight"),
        F.lit(0).cast("long").alias("quota"),
    )
    return quotas.unionByName(zeros)
