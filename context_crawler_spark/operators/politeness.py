"""Per-host politeness budgets and robots.txt enforcement.

North-rule capabilities the reference lacks (its only analog is
``maxConcurrency: 2`` per crawler, reference src/core.ts:214): cap fetches
per registered domain per round, honor robots disallow rules, and survive
host skew (one host holding 40% of the frontier must not serialize the round
onto one task).

Skew strategy — SALTED TWO-PHASE RANKING:
  phase 1: rank within (host, salt) where ``salt = pmod(xxhash64(url), S)``;
           any row in a host's global top-B is necessarily within the top-B
           of its own salt group, so pruning to local_rank ≤ B is LOSSLESS
           and cuts a hot host from M rows to at most S·B before any
           single-task work happens
  phase 2: exact rank over host on the pruned set (≤ S·B rows per host)
Both phases are built-in window functions — JVM, codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def claim_order():
    """Claim-order parity: SQLite ``ORDER BY priority DESC, createdAt ASC``
    with implicit rowid tie-break (reference src/queue.ts:131-137). ``seq``
    is the engine's deterministic rowid analog and created_at increases with
    seq, so (priority DESC, seq ASC) is the same total order, stable under
    parallelism. (Function, not module constant: Column construction needs
    an active session in classic mode.)"""
    return [F.col("priority").desc(), F.col("seq").asc()]


def apply_politeness(
    frontier: DataFrame,
    budget_per_host: int,
    host_col: str = "host",
    salt_shards: int = 16,
) -> DataFrame:
    """Keep at most ``budget_per_host`` rows per host, chosen in claim order.

    Dropped rows are NOT failures — the caller leaves them pending for the
    next round (deferral, not rejection).
    """
    salt = F.pmod(F.xxhash64("url"), F.lit(salt_shards))
    pruned = (
        frontier.withColumn("__lr", F.row_number().over(
            Window.partitionBy(F.col(host_col), salt).orderBy(*claim_order())))
        .filter(F.col("__lr") <= budget_per_host)
        .drop("__lr")
    )
    w_host = Window.partitionBy(host_col).orderBy(*claim_order())
    return (
        pruned.withColumn("__hr", F.row_number().over(w_host))
        .filter(F.col("__hr") <= budget_per_host)
        .drop("__hr")
    )


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host",
) -> DataFrame:
    """Filter out URLs a robots rule disallows.

    ``robots`` schema: (host, rule_type in ('allow','disallow'), path_prefix)
    where path_prefix is an RFC 9309 pattern — literal prefix, ``*``
    wildcards, optional trailing ``$`` anchor (functions/robots.py parses
    robots.txt text into this shape). Longest-pattern-wins: among matching
    rules for a URL the longest pattern decides; ties → allow wins; no
    matching rule → allowed. The robots table is per-host metadata (tiny
    next to the frontier) → BROADCAST join; the pattern→regex translation
    AND the match both run as built-in JVM expressions (no Python on
    either join side), pinned equal to functions/robots.pattern_to_regex
    by tests.
    """
    if robots is None:
        return frontier
    # RFC 9309 match target: path + optional query, NEVER the fragment
    # (pinned by test_parity_robots_query_urls — oracle.py mirrors this).
    # Authority stops at / ? # so a query on an empty path survives.
    raw = F.regexp_replace(
        F.regexp_replace("url", r"#.*$", ""),
        r"(?i)^[a-z][a-z0-9+.-]*://[^/?#]*", "",  # scheme is case-insensitive
    )
    path = (
        F.when(raw == "", "/")
        .when(raw.startswith("?"), F.concat(F.lit("/"), raw))
        .otherwise(raw)
    )
    # pattern → anchored regex, all built-ins: escape regex metachars,
    # un-escape * into .*, turn a trailing (escaped) $ back into an anchor
    esc = F.regexp_replace(
        F.col("path_prefix"), r"([.^$*+?(){}\[\]|\\])", r"\\$1"
    )
    star = F.regexp_replace(esc, r"\\\*", ".*")
    rules = (
        robots.select(
            F.col("host").alias("__rhost"),
            F.col("rule_type").alias("__rtype"),
            F.col("path_prefix").alias("__rprefix"),
            star.alias("__star"),
        )
        .withColumn(
            "__rx",
            F.concat(
                F.lit("^"),
                F.when(
                    F.col("__star").endswith("\\$"),
                    F.expr("substring(__star, 1, length(__star)-2) || '$'"),
                ).otherwise(F.col("__star")),
            ),
        )
        .drop("__star")
    )
    key = "url_hash" if "url_hash" in frontier.columns else "url"
    joined = (
        frontier.select(F.col(key).alias("__k"), F.col(host_col).alias("__h"),
                        path.alias("__path"))
        .join(
            F.broadcast(rules),
            on=(F.col("__h") == F.col("__rhost"))
            & F.expr("__path rlike __rx"),
            how="inner",
        )
    )
    # longest matching rule per URL; allow beats disallow on equal length.
    # Struct comparison is lexicographic (plen, then is_allow). Only the
    # slim (key, verdict) projection shuffles — never the full frontier row
    # — and unmatched URLs never enter the aggregate at all (inner join):
    # they are allowed by the left_anti against the blocked set below.
    rule_val = F.struct(
        F.length("__rprefix").alias("plen"),
        (F.col("__rtype") == "allow").cast("int").alias("is_allow"),
    )
    blocked = (
        joined.groupBy("__k")
        .agg(F.max(rule_val).alias("__verdict"))
        .filter(F.col("__verdict.is_allow") == 0)
        .select(F.col("__k").alias(key))
    )
    return frontier.join(blocked, on=key, how="left_anti")


def apply_trap_budgets(
    frontier: DataFrame,
    trap_hosts: DataFrame,
    trap_budget: int = 0,
    budget_per_host: int = 64,
    host_col: str = "host",
) -> DataFrame:
    """Per-host budgets with crawler-trap demotion: hosts flagged by
    ``operators/traps.url_trap_signals`` get ``trap_budget`` claims per
    round (0 = frozen entirely, small = probe slowly — IRLbot-style budget
    control) while every other host keeps ``budget_per_host``. Like
    apply_politeness, dropped rows stay pending — a host cleared of its
    trap flag resumes at full budget next round.

    ``trap_hosts`` is per-host metadata ((host, trap boolean) — the
    url_trap_signals output works directly) → BROADCAST join, same shape
    as robots; the budget cut itself reuses the salted two-phase ranking.
    """
    from pyspark.sql.functions import broadcast

    flags = trap_hosts.filter(F.col("trap")).select(
        F.col(host_col).alias("__trap_host"))
    budgeted = (
        apply_politeness(frontier, budget_per_host, host_col=host_col)
        .join(broadcast(flags),
              F.col(host_col) == F.col("__trap_host"), "left")
    )
    if trap_budget <= 0:
        return budgeted.filter(F.col("__trap_host").isNull()).drop(
            "__trap_host")
    salt_w = Window.partitionBy(host_col).orderBy(*claim_order())
    return (
        budgeted.withColumn("__tr", F.row_number().over(salt_w))
        .filter(F.col("__trap_host").isNull()
                | (F.col("__tr") <= trap_budget))
        .drop("__trap_host", "__tr")
    )


def adaptive_host_delays(
    fetch_log: DataFrame,
    target_factor: float = 10.0,
    min_delay_s: float = 0.5,
    max_delay_s: float = 30.0,
    error_frac_threshold: float = 0.1,
    error_backoff: float = 2.0,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    status_col: str = "status",
) -> DataFrame:
    """Adaptive per-host crawl delays learned from observed fetch behavior
    — the politeness policy production crawlers run instead of one flat
    delay: BUbiNG (Boldi et al. 2014 §4) spaces same-host requests
    proportionally to the host's OWN fetch time (a slow server gets more
    breathing room), and congestion signals (HTTP 429 Too Many Requests /
    503, RFC 6585) trigger a multiplicative backoff, AIMD-style.

        delay(host) = clamp(target_factor · mean_latency_s
                            · (error_backoff if err_frac ≥ threshold else 1),
                            min_delay_s, max_delay_s)

    Errors counted as congestion: 429, 503, and 0 (our transport-failure
    marker). Hosts are judged only on their own evidence — a host absent
    from the log keeps the static config delay (it simply has no row
    here).

    Output: ``(host, n_requests, mean_latency_ms, err_frac,
    crawl_delay_s)`` — the ``(host, crawl_delay_s)`` shape
    ``CrawlScheduler(host_delays=...)`` / ``HttpFetcher`` already consume,
    so the loop closes: round N's fetch telemetry becomes round N+1's
    politeness table.

    Cross-engine exactness: mean/err_frac are single IEEE divisions over
    exact integer sums (no libm), so the doubles — and the threshold
    comparison — are bit-identical in any engine; ``crawl_delay_s``
    rounds to 3dp only at the very end, for display stability.

    Plan at 10^10 fetches/round: ONE shuffle, partial-aggregated map-side
    to ≤ #hosts rows; the output is broadcast-sized by construction.
    """
    lat = F.col(latency_col).cast("double")
    err = F.col(status_col).isin(429, 503, 0).cast("long")
    # mean over NON-NULL latencies only (count(lat), not count(*)):
    # transport failures (status 0) typically log a NULL latency, and a
    # count(*) denominator would bias mean_latency — and the learned
    # delay — LOW for exactly the hosts that are failing (ADVICE r4).
    agg = fetch_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("n_requests"),
        (F.sum(lat) / F.count(lat)).alias("__mean_ms"),
        (F.sum(err).cast("double") / F.count(F.lit(1))).alias("err_frac"),
    )
    base = (F.lit(float(target_factor)) * F.col("__mean_ms")
            / F.lit(1000.0))
    backed = F.when(
        F.col("err_frac") >= F.lit(float(error_frac_threshold)),
        base * F.lit(float(error_backoff))).otherwise(base)
    return agg.select(
        "host",
        "n_requests",
        F.round(F.col("__mean_ms"), 3).alias("mean_latency_ms"),
        F.round(F.col("err_frac"), 6).alias("err_frac"),
        # zero latency samples (every fetch failed in transport) → no
        # speed evidence but maximal failure evidence: back off fully to
        # max_delay_s instead of emitting NULL. mean_latency_ms stays
        # NULL for such hosts — honest "no measurement". The NULL branch
        # is explicit (not coalesce-after-clamp) because least/greatest
        # skip NULL args in Spark, which would clamp a NULL mean to the
        # FLOOR — the opposite of backing off.
        F.when(F.col("__mean_ms").isNull(), F.lit(float(max_delay_s)))
        .otherwise(
            F.round(
                F.least(F.lit(float(max_delay_s)),
                        F.greatest(F.lit(float(min_delay_s)), backed)),
                3)).alias("crawl_delay_s"),
    )


def with_aged_priority(
    frontier: DataFrame,
    current_round: int,
    boost_every: int = 10,
    max_boost: int = 5,
    priority_col: str = "priority",
    enqueued_round_col: str = "enqueued_round",
) -> DataFrame:
    """Starvation-free claim priority (opt-in — it deliberately DIVERGES
    from the reference's strict ``priority DESC`` SQLite order, which can
    starve a low-priority URL forever behind an unbounded high-priority
    stream; Mercator-class frontiers age-boost instead).

        eff_priority = priority + min(max_boost, waited_rounds // boost_every)

    Integer arithmetic only — deterministic, SQL-replayable, and a pure
    projection (zero shuffle): the claim window downstream orders by
    ``eff_priority`` exactly as it ordered by ``priority``. Rows missing
    an enqueue round age from round 0 (conservative: oldest).
    """
    waited = F.lit(int(current_round)) - F.coalesce(
        F.col(enqueued_round_col), F.lit(0))
    boost = F.least(
        F.lit(int(max_boost)),
        F.floor(waited / F.lit(int(boost_every))).cast("int"))
    return frontier.withColumn(
        "eff_priority",
        (F.col(priority_col) + F.greatest(boost, F.lit(0))).cast("int"))
