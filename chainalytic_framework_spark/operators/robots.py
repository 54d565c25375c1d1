"""robots.txt parsing and crawl-permission filtering.

The crawl pipeline's gatekeeper: parse each host's robots.txt into
(agent-group, allow/disallow, path-prefix) rules and filter the url
frontier by the longest-match rule (REP semantics per RFC 9309: the
most specific — longest — matching prefix wins; on a length tie the
Allow rule wins; no matching rule means allowed).

Scope kept to the deterministic core: literal path PREFIXES (the
overwhelming majority of real rules). ``*`` wildcards and ``$`` anchors
are approximated CONSERVATIVELY (fail-closed, never fail-open): a
Disallow containing them participates in matching via its literal stem
(the prefix before the first wildcard character — it can over-block,
never under-block), while a wildcard Allow is ignored (it could only
widen access). Both survive parsing verbatim (``is_wildcard`` flag) so
callers can route wildcard-heavy hosts to a full-REP matcher. Grammar
is lenient like the major crawlers': leading whitespace, whitespace
before the colon, inline ``#`` comments, and case-insensitive
directive names are all accepted.

Everything is DataFrame-native: line explode + two window passes per
host for agent-group sectioning (a rule line belongs to the nearest
preceding User-agent header RUN — consecutive User-agent lines share
one group), then a host-keyed join of the frontier against the rules
with a struct-max longest-match pick. Rules tables are tiny relative
to frontiers (a few dozen lines per host), so Spark broadcasts them;
the frontier never shuffles.

Reference analogue: none — the reference ingests a chain it fully owns
(no permission layer); engine-added webtext tooling, same family as
``operators/recrawl.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"(?i)^\s*(user-agent|allow|disallow)\s*:\s*(.*?)\s*$"


def parse_robots(
    robots: DataFrame,
    host_col: str,
    text_col: str,
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt bodies into per-host prefix rules for ``agent``.

    ``robots`` carries one row per host with the raw robots.txt text.
    Output: (host, rule 'allow'|'disallow', prefix, is_wildcard) for
    every rule in a group whose User-agent set contains ``agent``
    (exact token match; callers pass '*' for the generic group).
    Empty-value Disallow lines (allow everything) are dropped; rules
    containing ``*``/``$`` are kept verbatim with ``is_wildcard=true``
    — :func:`robots_allowed` applies them conservatively, and callers
    can route such hosts to a full-REP matcher instead.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "raw"),
    )
    parsed = lines.select(
        "host",
        "ln",
        F.lower(
            F.regexp_extract(F.regexp_replace("raw", r"#.*$", ""), _DIRECTIVE_RE, 1)
        ).alias("directive"),
        F.regexp_extract(F.regexp_replace("raw", r"#.*$", ""), _DIRECTIVE_RE, 2).alias(
            "value"
        ),
    ).where(F.col("directive") != "")
    w = Window.partitionBy("host").orderBy("ln")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    grouped = parsed.withColumn("_ua", is_ua).withColumn(
        "_new",
        (
            (F.col("_ua") == 1)
            & (F.coalesce(F.lag("_ua").over(w), F.lit(0)) == 0)
        ).cast("int"),
    ).withColumn(
        "grp",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agents = (
        grouped.where(F.col("_ua") == 1)
        .groupBy("host", "grp")
        .agg(F.collect_set(F.lower("value")).alias("agents"))
    )
    rules = grouped.where(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select("host", "grp", F.col("directive").alias("rule"), F.col("value").alias("prefix"))
    return (
        rules.join(agents, ["host", "grp"])
        .where(F.array_contains("agents", agent.lower()))
        .select(
            "host", "rule", "prefix",
            F.col("prefix").rlike(r"[*$]").alias("is_wildcard"),
        )
    )


def robots_allowed(
    frontier: DataFrame,
    rules: DataFrame,
    host_col: str,
    path_col: str,
) -> DataFrame:
    """Longest-match crawl permission per frontier row.

    Appends ``allowed`` (boolean), ``matched_prefix`` and
    ``matched_rule`` (null when no rule matches — allowed by default).
    The winning rule is ``max(struct(len(prefix), rule='allow',
    prefix))``: longest prefix first, Allow beating Disallow on a
    length tie (RFC 9309), with the prefix itself as the final
    deterministic tiebreak. Wildcard rules enter CONSERVATIVELY: a
    wildcard Disallow matches by its literal stem before the first
    ``*``/``$`` (over-blocks, never under-blocks), a wildcard Allow is
    dropped (could only widen access) — see module docstring. The join
    is host-keyed with a startswith post-filter; the rules side
    broadcasts (it is |hosts|·rules rows), so the frontier never
    shuffles for the join — the groupBy back to one row per frontier
    entry (duplicates preserved via an in-plan row id) is the only
    frontier-sized exchange.
    """
    fk = [c for c in frontier.columns]
    stem = F.regexp_extract("prefix", r"^([^*$]*)", 1)
    r = rules.where(
        ~F.col("is_wildcard") | (F.col("rule") == "disallow")
    ).select(
        F.col("host").alias("_rh"),
        F.col("rule").alias("_rr"),
        F.when(F.col("is_wildcard"), stem).otherwise(F.col("prefix")).alias("_rp"),
    ).where(F.col("_rp") != "")
    frontier = frontier.withColumn("_rid", F.monotonically_increasing_id())
    j = frontier.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("_rh"))
        & F.col(path_col).startswith(F.col("_rp")),
        "left",
    )
    best = F.max(
        F.when(
            F.col("_rp").isNotNull(),
            F.struct(
                F.length("_rp").alias("l"),
                (F.col("_rr") == "allow").cast("int").alias("a"),
                F.col("_rp").alias("p"),
            ),
        )
    ).alias("_best")
    agg = j.groupBy(*fk, "_rid").agg(best)
    return agg.select(
        *fk,
        F.coalesce(F.col("_best.a") == 1, F.lit(True)).alias("allowed"),
        F.col("_best.p").alias("matched_prefix"),
        F.when(F.col("_best.a") == 1, F.lit("allow"))
        .when(F.col("_best.a") == 0, F.lit("disallow"))
        .alias("matched_rule"),
    )
