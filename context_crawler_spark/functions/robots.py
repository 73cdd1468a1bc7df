"""robots.txt parsing — text → the engine's broadcastable rules tables.

The reference has no robots handling (crawlee is run with it disabled);
the north rule requires it, so the semantics are pinned directly to the
PUBLIC specs (RFC 9309 + Google's robots.txt documentation):

  * groups = consecutive ``User-agent`` lines followed by rules; all groups
    whose agent token matches are merged
  * group selection: longest agent value that is a case-insensitive prefix
    of the crawler's product token; ``*`` is the fallback group
  * rule patterns support ``*`` (any chars) and a trailing ``$`` (end
    anchor); everything else matches literally
  * precedence: longest pattern (octet length) wins; tie → allow
  * match target: URL path + optional query, never the fragment
  * ``Crawl-delay`` (de-facto extension) is captured per group

Pure functions here; the distributed enforcement is
operators/politeness.apply_robots (broadcast join, JVM regex match) and the
per-host delay gate in plans/scheduler. The sequential mirror used by
parity tests is tests/oracle.py:_robots_allows — same semantics,
independent implementation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DEFAULT_AGENT = "contextcrawler"


@dataclass
class RobotsGroup:
    agents: list[str] = field(default_factory=list)
    rules: list[tuple[str, str]] = field(default_factory=list)  # (type, pattern)
    crawl_delay_s: float | None = None


def _parse_groups(text: str) -> list[RobotsGroup]:
    groups: list[RobotsGroup] = []
    cur: RobotsGroup | None = None
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        fld, val = line.split(":", 1)
        fld = fld.strip().lower()
        val = val.strip()
        if fld == "user-agent":
            if not in_agent_run:
                cur = RobotsGroup()
                groups.append(cur)
                in_agent_run = True
            cur.agents.append(val.lower())
        elif cur is not None:
            in_agent_run = False
            if fld in ("allow", "disallow"):
                if val:  # empty Disallow = no rule (allow all)
                    cur.rules.append((fld, val))
            elif fld == "crawl-delay":
                try:
                    cur.crawl_delay_s = float(val)
                except ValueError:
                    pass
        # fields before any user-agent line are ignored (RFC 9309 §2.2.1)
    return groups


def sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` directives from robots.txt, in file order (sitemaps.org
    protocol §"Informing search engine crawlers"; RFC 9309 carries them as
    ignorable other-records). Group-independent per the spec — collected
    from anywhere in the file, including before any User-agent line —
    absolute URLs only. Feed the result to the scheduler's sitemap seed
    expansion (plans/scheduler.seed), closing the discovery loop:
    robots.txt → sitemap tree → URL frontier."""
    out: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        fld, val = line.split(":", 1)
        if fld.strip().lower() == "sitemap":
            val = val.strip()
            if val.startswith(("http://", "https://")):
                out.append(val)
    return out


def select_rules(
    text: str, user_agent: str = DEFAULT_AGENT
) -> tuple[list[tuple[str, str]], float | None]:
    """((rule_type, pattern) list, crawl_delay) for the crawler's token:
    merge every group with the LONGEST matching agent value; fall back to
    the ``*`` groups; no match → no rules (everything allowed)."""
    token = user_agent.lower()
    groups = _parse_groups(text)
    best_len = -1
    for g in groups:
        for a in g.agents:
            if a != "*" and token.startswith(a) and len(a) > best_len:
                best_len = len(a)
    rules: list[tuple[str, str]] = []
    delay: float | None = None
    for g in groups:
        selected = any(
            (a != "*" and token.startswith(a) and len(a) == best_len)
            if best_len >= 0 else (a == "*")
            for a in g.agents
        )
        if selected:
            rules.extend(g.rules)
            if g.crawl_delay_s is not None:
                delay = g.crawl_delay_s if delay is None else min(delay, g.crawl_delay_s)
    return rules, delay


def pattern_to_regex(pattern: str) -> str:
    """Robots pattern → anchored regex string (``*`` → ``.*``, trailing
    ``$`` → end anchor, everything else literal). Same translation the
    JVM-side matcher derives with built-in expressions
    (operators/politeness.py) — pinned equal by tests."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    out = "^" + ".*".join(re.escape(part) for part in pattern.split("*"))
    return out + "$" if anchored else out


def pattern_matches(pattern: str, path: str) -> bool:
    return re.match(pattern_to_regex(pattern), path) is not None


def allows(rules: list[tuple[str, str]], path: str) -> bool:
    """Longest-pattern-wins verdict; tie → allow; no match → allowed."""
    best_len, best_allow = -1, True
    for rtype, pattern in rules:
        if not pattern_matches(pattern, path):
            continue
        is_allow = rtype == "allow"
        if len(pattern) > best_len or (len(pattern) == best_len and is_allow):
            best_len, best_allow = len(pattern), is_allow
    return best_allow


def robots_tables(spark, robots_texts: dict[str, str],
                  user_agent: str = DEFAULT_AGENT):
    """{host: robots.txt text} → (rules_df, delays_df).

    rules_df: (host, rule_type, path_prefix) — the broadcast side of
    apply_robots (patterns may contain * and $).
    delays_df: (host, crawl_delay_s) — feeds the scheduler's per-host
    crawl-delay eligibility gate. Both are per-host metadata: tiny."""
    rule_rows, delay_rows = [], []
    for host, text in robots_texts.items():
        rules, delay = select_rules(text or "", user_agent)
        rule_rows.extend((host, t, p) for t, p in rules)
        if delay is not None:
            delay_rows.append((host, float(delay)))
    rules_df = spark.createDataFrame(
        rule_rows, "host string, rule_type string, path_prefix string")
    delays_df = spark.createDataFrame(
        delay_rows, "host string, crawl_delay_s double")
    return rules_df, delays_df


def sitemap_table(spark, robots_texts: dict[str, str]):
    """{host: robots.txt text} → (host, sitemap_url, pos) DataFrame — the
    robots-declared sitemap set. Compose with the scheduler:
    ``eng.seed(extra_seeds=[r.sitemap_url for r in table.collect()])``
    (sitemap URLs match config.SITEMAP_RE and expand through the nested
    sitemapindex walker, so robots.txt → sitemap tree → frontier is one
    seed call). Per-host metadata — tiny, broadcastable."""
    rows = []
    for host, text in robots_texts.items():
        for i, u in enumerate(sitemap_urls(text or "")):
            rows.append((host, u, i))
    return spark.createDataFrame(
        rows, "host string, sitemap_url string, pos int")


def parse_robots_rules_df(cache: "DataFrame",  # noqa: F821 — typing only
                          user_agent: str = DEFAULT_AGENT) -> "DataFrame":
    """Distributed robots parse over a fetched-cache table ``(host,
    status, robots_text, ...)`` → long-form rule rows ``(host, rule_type,
    path_prefix, crawl_delay_s)``. The driver-side ``robots_tables``
    collects a dict — fine for tests, wrong for 10^7 hosts; this is the
    same parser run where the rows live (one Arrow pass, no shuffle).

    Fetch-outcome semantics (RFC 9309 §2.3.1):
      * 2xx → parse the body for this crawler's token;
      * 4xx ("unavailable") → NO rule rows: the crawler may proceed as if
        unrestricted;
      * 5xx / transport failure ("unreachable", status 0) → one synthetic
        ``disallow /`` row: must assume complete disallow.

    Split with :func:`split_robots_rules` into the two tables the engine
    already consumes.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {"host": [], "rule_type": [], "path_prefix": [],
                   "crawl_delay_s": []}

            def emit(h, t, p, d):
                out["host"].append(h)
                out["rule_type"].append(t)
                out["path_prefix"].append(p)
                out["crawl_delay_s"].append(d)

            for host, status, text in zip(
                    pdf["host"], pdf["status"], pdf["robots_text"]):
                st = int(status)
                if 200 <= st < 300 and text is not None:
                    rules, delay = select_rules(text, user_agent)
                    for rtype, pattern in rules:
                        emit(host, rtype, pattern, None)
                    if delay is not None:
                        emit(host, "crawl-delay", None, float(delay))
                elif 400 <= st < 500:
                    pass  # unavailable → unrestricted (no rows)
                else:  # 5xx or transport failure → complete disallow
                    emit(host, "disallow", "/", None)
            yield pd.DataFrame(out)

    return cache.mapInPandas(
        run,
        "host string, rule_type string, path_prefix string, "
        "crawl_delay_s double",
    )


def split_robots_rules(parsed: "DataFrame"):
    """Long-form rule rows → ``(rules_df, delays_df)`` — the exact pair
    ``robots_tables`` returns, so live-fetched robots drop into
    ``apply_robots`` / the scheduler's crawl-delay gate unchanged."""
    from pyspark.sql import functions as F

    rules = parsed.filter(
        F.col("rule_type").isin("allow", "disallow")
    ).select("host", "rule_type", "path_prefix")
    delays = parsed.filter(F.col("rule_type") == "crawl-delay").select(
        "host", "crawl_delay_s")
    return rules, delays
