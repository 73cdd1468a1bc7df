"""Property-based tests (SURVEY.md §5.4): random site graphs × random
configs → crawl invariants, checked against the fast sequential oracle;
plus seeded randomized engine↔oracle parity.

Invariants (north-rule semantics):
  1. no URL fetched twice (canonical-level)
  2. every fetched non-seed URL matches include ∧ ¬exclude
  3. per-host claims per round ≤ politeness budget
  4. within a round, claim order is (priority DESC, seq ASC)
  5. total fetches ≤ max_pages
  6. the URL-seen set contains every fetched URL's canonical form
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.functions.urlnorm import canonicalize_url

from .oracle import run_oracle


def _random_web(seed: int, n_hosts: int, pages_per_host: int) -> dict[str, str]:
    """Random but deterministic site graph rendered in the supported HTML
    subset; includes dirty link variants (fragments, utm params, uppercase
    hosts) and dangling links (fetch misses → retry path)."""
    rng = random.Random(seed)
    hosts = [f"site{i}.test" for i in range(n_hosts)]
    urls = [f"https://{h}/" for h in hosts] + [
        f"https://{h}/{sec}/p{i}"
        for h in hosts
        for sec in ("docs", "blog")
        for i in range(pages_per_host)
    ]
    web: dict[str, str] = {}
    for u in urls:
        links = []
        for _ in range(rng.randint(0, 5)):
            t = rng.choice(urls)
            variant = rng.randint(0, 4)
            if variant == 1:
                t += "#sec"
            elif variant == 2:
                t += "?utm_source=r"
            elif variant == 3:
                t = t.replace("https://site", "https://SITE")
            links.append(t)
        if rng.random() < 0.3:
            links.append(f"https://{rng.choice(hosts)}/missing/p{rng.randint(0,99)}")
        nav = ""
        if u.endswith("/"):
            nav = "<nav>" + "".join(
                f'<a href="https://{u.split("//")[1].split("/")[0]}/{sec}/p0">{sec}</a>'
                for sec in ("docs", "blog")
            ) + "</nav>"
        body = "".join(f'<p>text {i} <a href="{t}">l</a></p>' for i, t in enumerate(links))
        web[u] = (
            f"<html><head><title>{u}</title></head><body>{nav}"
            f"<article><h1>{u}</h1>{body}</article></body></html>"
        )
    return web


config_strategy = st.fixed_dictionaries(
    {
        "seed": st.integers(0, 10_000),
        "n_hosts": st.integers(1, 4),
        "pages_per_host": st.integers(1, 6),
        "budget": st.integers(1, 8),
        "max_pages": st.one_of(st.none(), st.integers(1, 40)),
        "exclude_blog": st.booleans(),
        "max_depth": st.one_of(st.none(), st.integers(1, 4)),
    }
)


@given(config_strategy)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_oracle_invariants(params):
    web = _random_web(params["seed"], params["n_hosts"], params["pages_per_host"])
    cfg = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site*.test/**"],
        exclude=["**/blog/**"] if params["exclude_blog"] else None,
        selector="article",
        politeness_budget=params["budget"],
        max_pages=params["max_pages"],
        max_depth=params["max_depth"],
    )
    res = run_oracle(cfg, web, max_rounds=200)

    # 1. no URL fetched twice
    canon = [canonicalize_url(u) for u in res.visit_order]
    assert len(canon) == len(set(canon))
    # 2. scope: every fetched non-seed URL is in scope (the entry itself
    #    bypasses globs, reference addRequests semantics)
    for u in res.visit_order:
        if u != cfg.entry:
            assert cfg.in_scope(u), u
        if params["exclude_blog"]:
            assert "/blog/" not in u
    # 3+4. politeness budget and claim order per round
    by_round: dict[int, list] = {}
    for (r, host, url, prio, seq) in res.claims:
        by_round.setdefault(r, []).append((host, url, prio, seq))
    for r, claims in by_round.items():
        hosts_count: dict[str, int] = {}
        for host, _u, _p, _s in claims:
            hosts_count[host] = hosts_count.get(host, 0) + 1
        assert all(c <= params["budget"] for c in hosts_count.values())
        keys = [(-p, s) for (_h, _u, p, s) in claims]
        assert keys == sorted(keys)
    # 5. page cap
    if params["max_pages"] is not None:
        assert len(res.visit_order) <= params["max_pages"]
    # 6. seen ⊇ fetched
    assert set(canon) <= res.seen


@pytest.mark.parametrize("seed", [7, 19])
def test_randomized_engine_oracle_parity(spark, tmp_path, seed):
    """Seeded random graphs through BOTH implementations — full parity."""
    from context_crawler_spark.plans.scheduler import CrawlScheduler
    from context_crawler_spark.sources.synthetic_web import EPOCH
    from context_crawler_spark.state import SnapshotStore
    from datetime import timedelta

    web = _random_web(seed, n_hosts=3, pages_per_host=3)
    cfg = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site*.test/**"],
        exclude=["**/blog/**"] if seed % 2 else None,
        selector="article",
        politeness_budget=3,
    )
    rows = [
        (u, EPOCH + timedelta(seconds=i), h.encode(), "", "en")
        for i, (u, h) in enumerate(web.items())
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    store = SnapshotStore(str(tmp_path / f"s{seed}"))
    eng = CrawlScheduler(spark, store, cfg, pages, n_buckets=8)
    eng.run(max_rounds=60)
    oracle = run_oracle(cfg, web, max_rounds=60)
    assert eng.visit_order() == oracle.visit_order
    seen_engine = {
        r["canonical_url"] for r in eng.url_seen().select("canonical_url").collect()
    }
    assert seen_engine == oracle.seen
