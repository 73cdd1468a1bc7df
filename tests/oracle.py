"""Sequential crawl oracle — the reference's semantics in plain Python.

Re-derives the deterministic crawl the reference performs (SQLite claim
order ``priority DESC, createdAt ASC`` + rowid tie-break, reference
src/queue.ts:131-137; FIFO BFS RequestQueue with uniqueKey dedup,
src/core.ts:203-207,265,341; retry w/ backoff src/queue.ts:186-227), plus
the north-rule politeness/robots semantics, one URL at a time with ordinary
lists and dicts. The Spark engine must reproduce its visit order and
URL-seen set exactly (tests/test_parity.py).

Timing note: with the engine's defaults (round interval 60 s > max backoff
5 s·2² = 20 s·jitter ≤ 20 s) a retry always matures by the next round, so
the oracle models retries as next-round-eligible without reproducing the
seeded jitter value itself (jitter parity is unit-tested separately).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from context_crawler_spark.config import SITEMAP_RE, CrawlConfig
from context_crawler_spark.functions import extract
from context_crawler_spark.functions.urlnorm import canonicalize_url, registered_domain, url_host


@dataclass
class _Rec:
    url: str
    canonical: str
    host: str
    priority: int
    depth: int
    seq: int
    attempts: int = 0
    status: str = "pending"
    retry_round: int | None = None  # earliest round eligible again
    error: str | None = None


@dataclass
class OracleResult:
    visit_order: list[str] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)          # canonical urls
    failed: list[str] = field(default_factory=list)
    rounds: int = 0
    extracted: dict[str, str] = field(default_factory=dict)  # url -> text
    # (round, host, url, priority, seq) per CLAIMED row, in claim order —
    # for invariant checks (politeness budgets, ordering)
    claims: list[tuple[int, str, str, int, int]] = field(default_factory=list)
    # urls emitted to the dataset sink, in fetch order: == visit_order
    # unless honor_meta_robots (noindex suppressed) or honor_canonical
    # (self-confessed duplicates suppressed) is on
    emitted: list[str] = field(default_factory=list)


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 pattern match (* wildcard, trailing $ anchor) — sequential
    mirror, implemented independently of the engine's JVM translation."""
    import re as _re

    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    pieces = pattern.split("*")
    rx = "^" + ".*".join(_re.escape(p) for p in pieces) + ("$" if anchored else "")
    return _re.match(rx, path) is not None


def _robots_allows(robots: list[tuple[str, str, str]] | None, host: str, url: str) -> bool:
    """RFC 9309 longest-pattern-wins; allow wins ties; no match → allowed.
    robots rows: (host, rule_type, path_pattern)."""
    if not robots:
        return True
    from urllib.parse import urlsplit

    # RFC 9309 match target: path + optional query (fragment excluded) —
    # same semantic as operators/politeness.py:apply_robots
    parts = urlsplit(url)
    path = (parts.path or "/") + (f"?{parts.query}" if parts.query else "")
    best_len, best_allow = -1, True
    for h, rtype, pattern in robots:
        if h != host or not _pattern_matches(pattern, path):
            continue
        is_allow = rtype == "allow"
        if len(pattern) > best_len or (len(pattern) == best_len and is_allow):
            best_len, best_allow = len(pattern), is_allow
    return best_allow


def run_oracle(
    config: CrawlConfig,
    pages: dict[str, str],          # url -> html (the synthetic web)
    robots: list[tuple[str, str, str]] | None = None,
    max_rounds: int = 1000,
    # hygiene toggles mirroring the engine seams (VERDICT r4 #4):
    host_delays: dict[str, float] | None = None,   # host -> crawl_delay_s
    trap_hosts: set[str] | None = None,            # flagged crawler traps
    trap_budget: int = 0,                          # claims/round for traps
) -> OracleResult:
    res = OracleResult()
    frontier: list[_Rec] = []
    seen_canon: set[str] = set()
    next_seq = 0

    def enqueue(url: str, priority: int, depth: int) -> None:
        nonlocal next_seq
        canon = canonicalize_url(url)
        if canon is None or canon in seen_canon:
            return
        seen_canon.add(canon)
        frontier.append(
            _Rec(url=url, canonical=canon, host=registered_domain(url_host(url) or "") or "",
                 priority=priority, depth=depth, seq=next_seq)
        )
        next_seq += 1

    # -- seeding (reference src/core.ts:265-352) --
    seeds: list[str] = [config.entry]
    if config.auto_discover_nav and config.entry in pages:
        for u in extract.discover_nav_urls(
            pages[config.entry], config.entry, config.discovery_selector
        ):
            if config.in_scope(u):
                seeds.append(u)
    expanded = extract.expand_sitemap_seeds(
        seeds,
        fetch=lambda u: pages.get(u, ""),
        in_scope=config.in_scope,
        is_sitemap=lambda u: bool(SITEMAP_RE.search(u.split("?")[0])),
    )
    for u in expanded:
        enqueue(u, config.priority, 0)

    fetched_total = 0
    # per-host last successful fetch round (crawl-delay gate; engine
    # host_state analog — round clock spacing is ROUND_INTERVAL_S)
    from context_crawler_spark.plans.scheduler import ROUND_INTERVAL_S

    last_fetch_round: dict[str, int] = {}
    for r in range(1, max_rounds + 1):
        eligible = [
            rec for rec in frontier
            if rec.status == "pending" and (rec.retry_round is None or rec.retry_round <= r)
            and (config.max_depth is None or rec.depth <= config.max_depth)
        ]
        if config.host_crawl_delay_s or host_delays:
            # per-host rows override the global config value, exactly like
            # the engine's host_delays broadcast gate (scheduler.run_round)
            def _delay(h: str) -> float:
                if host_delays and h in host_delays:
                    return host_delays[h]
                return float(config.host_crawl_delay_s or 0)

            eligible = [
                rec for rec in eligible
                if rec.host not in last_fetch_round
                or (r - last_fetch_round[rec.host]) * ROUND_INTERVAL_S
                >= _delay(rec.host)
            ]
        if config.respect_robots and robots:
            blocked = [rec for rec in eligible
                       if not _robots_allows(robots, rec.host, rec.url)]
            for rec in blocked:
                rec.status, rec.error = "failed", "robots_disallowed"
                res.failed.append(rec.url)
            eligible = [rec for rec in eligible if rec.status == "pending"]
        # claim order: priority DESC, seq ASC (createdAt monotone with seq)
        eligible.sort(key=lambda rec: (-rec.priority, rec.seq))
        # per-host politeness budget; flagged trap hosts get the (smaller)
        # trap_budget — operators/politeness.apply_trap_budgets semantics
        taken: dict[str, int] = {}
        batch: list[_Rec] = []
        for rec in eligible:
            cap = (min(trap_budget, config.politeness_budget)
                   if trap_hosts and rec.host in trap_hosts
                   else config.politeness_budget)
            if taken.get(rec.host, 0) < cap:
                taken[rec.host] = taken.get(rec.host, 0) + 1
                batch.append(rec)
        if config.max_pages is not None:
            batch = batch[: max(0, config.max_pages - fetched_total)]
        if not batch:
            # idle round (gated hosts / immature retries) vs drained frontier
            if any(rec.status == "pending" for rec in frontier) and (
                config.max_pages is None or fetched_total < config.max_pages
            ):
                continue
            break
        res.rounds = r

        # fetch in claim order; collect candidates in (parent_seq, link_index)
        candidates: list[tuple[int, int, str]] = []
        for rec in batch:
            res.claims.append((r, rec.host, rec.url, rec.priority, rec.seq))
            rec.attempts += 1
            html = pages.get(rec.url)
            if html is None:
                if rec.attempts < config.max_attempts:
                    rec.retry_round = r + 1  # backoff < round interval
                else:
                    rec.status, rec.error = "failed", "fetch_miss"
                    res.failed.append(rec.url)
                continue
            rec.status = "completed"
            last_fetch_round[rec.host] = r
            res.visit_order.append(rec.url)
            res.extracted[rec.url] = extract.extract_text(html, config.selector)
            fetched_total += 1
            # page-level hygiene toggles (all default-off = parity mode)
            noindex = nofollow = False
            if config.honor_meta_robots:
                toks = set((extract.extract_meta_robots(html) or "")
                           .split(","))
                noindex = bool(toks & {"noindex", "none"})
                nofollow = bool(toks & {"nofollow", "none"})
            is_dup = False
            if config.honor_canonical:
                hint = extract.extract_canonical(html, rec.url)
                if hint and hint.startswith(("http://", "https://")):
                    hc = canonicalize_url(hint)
                    if hc is not None and hc != rec.canonical:
                        is_dup = True  # duplicate: suppress emit, enqueue
                        if not nofollow and config.in_scope(hint):
                            # target rides the link pipeline at index -1 —
                            # sorts before the page's own links
                            candidates.append((rec.seq, -1, hint))
            if not noindex and not is_dup:
                res.emitted.append(rec.url)
            if nofollow:
                continue
            cap_links = config.max_links_per_page
            for href, link_ix, _is_nav in extract.extract_links(html, rec.url):
                if cap_links is not None and link_ix >= cap_links:
                    continue  # Mercator outlink cap (DOM order)
                if config.in_scope(href):
                    candidates.append((rec.seq, link_ix, href))
        candidates.sort(key=lambda t: (t[0], t[1]))
        for _ps, _li, href in candidates:
            depth = next(rec.depth for rec in batch if rec.seq == _ps) + 1
            if config.max_depth is None or depth <= config.max_depth:
                enqueue(href, config.priority, depth)
        if config.max_pages is not None and fetched_total >= config.max_pages:
            break
    res.seen = set(seen_canon)
    return res
