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


@settings(max_examples=300, deadline=None)
@given(
    items=st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 4000)), max_size=40),
    max_tokens=st.one_of(st.none(), st.integers(1, 300)),
    max_bytes=st.one_of(st.none(), st.integers(1, 6000)),
)
def test_split_plan_invariants(items, max_tokens, max_bytes):
    """Pure-state-machine invariants of the output splitter, any input:
    ids are -1 or 1..final_counter, non-decreasing over the sequence, and
    file names are plain iff no flush ever happened."""
    from context_crawler_spark.operators.output import (
        finalize_file_names,
        split_plan_full,
    )

    assignment, counter = split_plan_full(items, max_tokens, max_bytes)
    assert len(assignment) == len(items)
    assert counter >= 1
    kept = [a for a in assignment if a != -1]
    assert all(1 <= a <= counter for a in kept)
    assert kept == sorted(kept)  # file ids never go backwards
    if max_tokens is None:
        assert -1 not in assignment  # drops only exist under a token budget
    names = finalize_file_names(assignment, "j", counter)
    if counter == 1:
        assert set(names.values()) <= {"j.json"}
        assert bool(names) == bool(kept)
    else:
        assert "j.json" not in names.values()
        # every mid-run flush file exists (even if empty of items)
        assert set(range(1, counter)) <= set(names)
        assert (counter in names) == (counter in kept)


def _brute_pattern_match(pattern: str, path: str) -> bool:
    """Exponential-but-tiny reference matcher for robots patterns."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]

    def m(p: str, s: str) -> bool:
        if not p:
            return not s if anchored else True
        if p[0] == "*":
            return any(m(p[1:], s[i:]) for i in range(len(s) + 1))
        return bool(s) and s[0] == p[0] and m(p[1:], s[1:])

    return m(pattern, path)


@settings(max_examples=400, deadline=None)
@given(
    pattern=st.text(alphabet="/ab.?*$", min_size=0, max_size=8),
    path=st.text(alphabet="/ab.?x", min_size=0, max_size=10),
)
def test_robots_pattern_matches_brute_force(pattern, path):
    from context_crawler_spark.functions.robots import pattern_matches

    assert pattern_matches(pattern, path) == _brute_pattern_match(
        pattern, path), (pattern, path)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n=st.integers(1, 400),
    nb_exp=st.integers(6, 9),
    seed=st.integers(0, 2**31 - 1),
)
def test_cuckoo_never_false_negative(n, nb_exp, seed):
    """Inserted keys ALWAYS probe positive (the involution guarantee),
    for any load the insert loop accepts; deleted keys stop matching
    unless another key shares bucket+fingerprint (FPs allowed, FNs not)."""
    import numpy as np

    from context_crawler_spark.operators.cuckoo import CuckooTable

    rng = np.random.RandomState(seed)
    keys = np.unique(rng.randint(-2**62, 2**62, size=n, dtype=np.int64))
    t = CuckooTable(nb=1 << nb_exp)
    fails = t.insert(keys)
    assert fails == 0 or (len(keys) > (1 << nb_exp) * 2)  # only under load
    if fails == 0:
        assert bool(t.contains(keys).all())
        half = keys[: len(keys) // 2]
        if len(half):
            t.delete(half)
            rest = keys[len(keys) // 2:]
            if len(rest):
                assert bool(t.contains(rest).all())  # survivors still match
