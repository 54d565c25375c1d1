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
