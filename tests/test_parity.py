"""End-to-end engine↔oracle parity (SURVEY.md §5.2; the north rule's
"matching the reference's crawl ordering and URL-seen set under the same
seed list + politeness budget" clause).

Runs the Spark BSP scheduler and the sequential Python oracle on the same
deterministic synthetic web and asserts IDENTICAL visit order, URL-seen set,
and byte-identical extracted text per url.
"""

from __future__ import annotations

import pytest

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.plans.scheduler import CrawlScheduler
from context_crawler_spark.state import SnapshotStore

from .oracle import run_oracle


def _run_both(spark, tiny_pages, tiny_web, tmp_path, config, robots_rows=None,
              use_bloom=True):
    store = SnapshotStore(str(tmp_path / "store"))
    robots_df = None
    if robots_rows:
        robots_df = spark.createDataFrame(
            robots_rows, "host string, rule_type string, path_prefix string"
        )
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8,
                         use_bloom=use_bloom, expected_urls_per_bucket=4096)
    eng.run(max_rounds=50, robots=robots_df)
    oracle = run_oracle(config, tiny_web, robots=robots_rows)
    return eng, oracle


def _assert_parity(spark, eng, oracle):
    assert eng.visit_order() == oracle.visit_order
    seen_engine = {
        r["canonical_url"] for r in eng.url_seen().select("canonical_url").collect()
    }
    assert seen_engine == oracle.seen
    po = eng.pages_out()
    extracted = {r["url"]: r["text"] for r in po.select("url", "text").collect()}
    assert extracted == oracle.extracted  # byte-identical per url


def test_parity_basic_bfs(spark, tiny_pages, tiny_web, tmp_path):
    """Single-host BFS with excludes; exercises canonical dedup of dirty
    URLs and the /support dir→/support/** exclude expansion."""
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**"],
        exclude=["https://site0.test/support", "**/blog"],
        selector="article",
    )
    eng, oracle = _run_both(spark, tiny_pages, tiny_web, tmp_path, config)
    assert len(oracle.visit_order) > 10  # the crawl actually went somewhere
    assert not any("/support" in u or "/blog" in u for u in oracle.visit_order)
    _assert_parity(spark, eng, oracle)


def test_parity_politeness_and_max_pages(spark, tiny_pages, tiny_web, tmp_path):
    """Cross-host crawl, per-host budget 3/round, page cap: ordering under
    deferral must still match the oracle exactly."""
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**", "https://site1.test/**",
               "https://site2.test/**"],
        selector="article",
        politeness_budget=3,
        max_pages=40,
    )
    eng, oracle = _run_both(spark, tiny_pages, tiny_web, tmp_path, config)
    assert len(oracle.visit_order) == 40
    _assert_parity(spark, eng, oracle)


def test_parity_robots(spark, tiny_pages, tiny_web, tmp_path):
    # disallow the docs leaf pages but allow-override page-1: all leaves are
    # discovered from the (allowed) /docs index; only page-1 may be fetched —
    # exercises longest-match-wins with an allow override.
    robots = [
        ("site0.test", "disallow", "/docs/page"),
        ("site0.test", "allow", "/docs/page-1"),
    ]
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**"],
        selector="article",
        respect_robots=True,
    )
    eng, oracle = _run_both(spark, tiny_pages, tiny_web, tmp_path, config,
                            robots_rows=robots)
    visited = set(oracle.visit_order)
    assert "https://site0.test/docs" in visited
    assert "https://site0.test/docs/page-0" not in visited
    assert "https://site0.test/docs/page-1" in visited
    _assert_parity(spark, eng, oracle)


def test_parity_host_crawl_delay(spark, tiny_pages, tiny_web, tmp_path):
    """Crawl-delay gating: a host fetched in round r is ineligible until
    the delay elapses (host_state join); idle rounds must not terminate
    the crawl. Cross-host so gated rounds still progress elsewhere."""
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**", "https://site1.test/**"],
        selector="article",
        politeness_budget=2,
        host_crawl_delay_s=120,  # 2 round intervals
    )
    eng, oracle = _run_both(spark, tiny_pages, tiny_web, tmp_path, config)
    assert len(oracle.visit_order) > 5
    # no host fetched in consecutive rounds
    by_round_host = {}
    for (r, host, _u, _p, _s) in oracle.claims:
        by_round_host.setdefault(host, []).append(r)
    for host, rounds in by_round_host.items():
        rs = sorted(set(rounds))
        assert all(b - a >= 2 for a, b in zip(rs, rs[1:])), (host, rs)
    _assert_parity(spark, eng, oracle)


def test_resume_mid_crawl(spark, tiny_pages, tiny_web, tmp_path):
    """Kill after round k → a fresh scheduler over the same store must
    finish with state identical to an uninterrupted run (snapshot
    checkpointing claim of the north rule)."""
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**"],
        selector="article",
        politeness_budget=5,
    )
    store_a = SnapshotStore(str(tmp_path / "a"))
    eng_a = CrawlScheduler(spark, store_a, config, tiny_pages, n_buckets=8)
    eng_a.run(max_rounds=50)

    store_b = SnapshotStore(str(tmp_path / "b"))
    eng_b = CrawlScheduler(spark, store_b, config, tiny_pages, n_buckets=8)
    eng_b.seed()
    eng_b.run_round()
    eng_b.run_round()
    # "kill": drop the scheduler object entirely; resume on a new instance
    del eng_b
    eng_b2 = CrawlScheduler(spark, store_b, config, tiny_pages, n_buckets=8)
    eng_b2.run(max_rounds=50)

    assert eng_b2.visit_order() == eng_a.visit_order()
    seen = lambda e: {r["canonical_url"] for r in e.url_seen().collect()}  # noqa: E731
    assert seen(eng_b2) == seen(eng_a)


def test_rollback_replays_round(spark, tiny_pages, tiny_web, tmp_path):
    """Iceberg-style snapshot rollback: point HEAD at round k, re-run, and
    the crawl converges to the same final state."""
    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article",
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng.run(max_rounds=50)
    final_order = eng.visit_order()

    tagged = store.find_tag("round-1")
    store.rollback(tagged.snapshot_id)
    eng2 = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng2.run(max_rounds=50)
    assert eng2.visit_order() == final_order


def test_url_seen_delta_commits(spark, tiny_pages, tiny_web, tmp_path):
    """Round N's url_seen write is the DELTA (∝ new URLs, not total seen) —
    the r1 scale-killer fix — and compaction folds deltas back into one
    base table in a single atomic commit."""
    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article",
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8,
                         seen_compact_every=100)  # never compact in this run
    eng.seed()
    m1 = eng.run_round()
    snap = store.snapshot()
    assert "url_seen_r1" in snap.tables and "url_seen" not in snap.tables
    delta = store.read(spark, "url_seen_r1")
    assert delta.count() == m1["new_urls"]  # write size ∝ new URLs
    # seed delta untouched by round 1's commit (carried forward by reference)
    parent = store.snapshot(snap.parent_id)
    assert snap.tables["url_seen_r0"] == parent.tables["url_seen_r0"]
    total_after_r1 = eng.url_seen().count()

    # same crawl with aggressive compaction: identical seen set, deltas folded
    store2 = SnapshotStore(str(tmp_path / "s2"))
    eng2 = CrawlScheduler(spark, store2, config, tiny_pages, n_buckets=8,
                          seen_compact_every=2)
    eng2.run(max_rounds=50)
    snap2 = store2.snapshot()
    deltas = [t for t in snap2.tables if t.startswith("url_seen_r")]
    assert "url_seen" in snap2.tables and len(deltas) < 2
    seen = lambda e: {r["canonical_url"] for r in e.url_seen().collect()}  # noqa: E731
    eng.run(max_rounds=50)
    assert seen(eng2) == seen(eng)
    assert eng2.visit_order() == eng.visit_order()


def test_frontier_live_done_split(spark, tiny_pages, tiny_web, tmp_path):
    """The per-round frontier write is O(live backlog + batch), never
    O(terminal history): terminal rows append to frontier_done_r{N} deltas,
    the live table holds only claimable rows, and the full view stays
    consistent with the oracle's seen/visit state."""
    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article",
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8,
                         seen_compact_every=100)
    eng.seed()
    m1 = eng.run_round()
    snap = store.snapshot()
    assert "frontier_done_r1" in snap.tables
    d1 = store.read(spark, "frontier_done_r1")
    # round 1's terminal transitions = fetched + misses-turned-terminal (none here)
    assert d1.filter(d1.status == "completed").count() == m1["fetched"]
    live = eng.live_frontier()
    assert live.filter(live.status == "pending").count() > 0
    assert live.filter(live.status.isin("completed", "failed")).count() == 0
    eng.run(max_rounds=50)
    # after drain: live is empty, full view has every visited row completed
    assert eng.live_frontier().count() == 0
    full = eng.frontier()
    oracle = run_oracle(config, tiny_web)
    completed_urls = {
        r["url"] for r in full.filter(full.status == "completed").collect()
    }
    assert completed_urls == set(oracle.visit_order)


def test_terminal_rows_carry_completed_at(spark, tiny_pages, tmp_path):
    """ADVICE r2: terminal-FAILED (fetch_miss after max_attempts) and
    robots-blocked rows must be stamped completed_at, or cleanup_terminal's
    TTL can never expire them and frontier_done grows unboundedly on
    failure-heavy crawls."""
    from pyspark.sql import functions as F

    from context_crawler_spark.functions.robots import robots_tables

    rules, _delays = robots_tables(
        spark, {"site0.test": "User-agent: *\nDisallow: /guide\n"},
    )
    # drop one discoverable page so its row terminal-fails on fetch_miss
    pages = tiny_pages.filter(
        F.col("url") != "https://site0.test/docs/page-3"
    )
    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article", max_attempts=1, respect_robots=True,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=8,
                         seen_compact_every=100)
    eng.run(max_rounds=50, robots=rules)
    full = eng.frontier()
    term = full.filter(F.col("status").isin("completed", "failed"))
    errs = {r["error"] for r in term.select("error").distinct().collect()}
    assert "fetch_miss" in errs and "robots_disallowed" in errs
    # EVERY terminal row is stamped
    assert term.filter(F.col("completed_at").isNull()).count() == 0


def test_frontier_bucketed_write_volume(spark, tmp_path):
    """Round N's live-frontier MERGE rewrites ONLY buckets holding a
    touched row (claimed / retry / new / robots-blocked); every untouched
    bucket carries forward by manifest reference — the commit's data path
    is IDENTICAL to the parent snapshot's. The sibling of
    test_url_seen_delta_commits for the live backlog (the last O(big)
    per-round state step)."""
    from datetime import datetime, timezone

    from context_crawler_spark.plans.scheduler import FRONTIER_BUCKET_COL
    from context_crawler_spark.sources.synthetic_web import PAGES_SCHEMA

    n_seeds, nb = 300, 16
    urls = [f"https://bulk.test/p{i}" for i in range(n_seeds)]
    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    # link-free pages: a round fetches 4 urls and discovers nothing, so
    # touched buckets come only from the 4 claimed rows
    html = b"<html><body><article>x</article></body></html>"
    pages = spark.createDataFrame(
        [(u, ts, html, "x", "en") for u in urls], PAGES_SCHEMA)
    config = CrawlConfig(
        entry="https://bulk.test/p0", match=["https://bulk.test/**"],
        selector="article", politeness_budget=4, auto_discover_nav=False,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=8,
                         frontier_buckets=nb)
    eng.seed(extra_seeds=urls[1:])
    assert len(store.bucket_tables("frontier")) == nb  # backlog fills all
    m1 = eng.run_round()
    assert m1["claimed"] == 4 and m1["new_urls"] == 0

    snap = store.snapshot()
    cur = store.bucket_tables("frontier", snap.snapshot_id)
    prev = store.bucket_tables("frontier", snap.parent_id)
    changed = {k for k in set(cur) | set(prev) if cur.get(k) != prev.get(k)}
    carried = {k for k in cur if prev.get(k) == cur[k]}
    # ≤4 claimed rows → ≤4 rewritten buckets; the rest carry by reference
    assert 1 <= len(changed) <= 4
    assert len(carried) >= nb - 4
    # rows physically written this round ∝ touched buckets, not backlog
    import os as _os
    written = sum(
        spark.read.parquet(_os.path.join(store.root, cur[k])).count()
        for k in changed if k in cur
    )
    assert written < n_seeds / 2
    # the full live view is still exact: backlog minus the 4 completed
    live = eng.live_frontier()
    assert live.count() == n_seeds - 4
    assert FRONTIER_BUCKET_COL not in live.columns
    # and the crawl still drains to a complete, exact state (drain with a
    # wider budget on the SAME store — 5 rounds instead of 75; also proves
    # a bucketed store resumes under a different scheduler instance)
    fast_cfg = CrawlConfig(
        entry="https://bulk.test/p0", match=["https://bulk.test/**"],
        selector="article", politeness_budget=64, auto_discover_nav=False,
    )
    eng_fast = CrawlScheduler(spark, store, fast_cfg, pages, n_buckets=8,
                              frontier_buckets=nb)
    eng_fast.run(max_rounds=20)
    assert eng_fast.live_frontier().count() == 0
    assert sorted(eng_fast.visit_order()) == sorted(urls)


def test_host_state_delta_commits(spark, tiny_pages, tiny_web, tmp_path):
    """host_state is delta-committed (round N writes only hosts fetched in
    round N) and the folded view stays exact; compaction folds deltas into
    one base table. Sibling of test_url_seen_delta_commits for per-host
    state (10^8-10^9 hosts at web scale)."""
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**", "https://site1.test/**"],
        selector="article", politeness_budget=3,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8,
                         seen_compact_every=100)
    eng.seed()
    m1 = eng.run_round()
    snap = store.snapshot()
    assert "host_state_r1" in snap.tables and "host_state" not in snap.tables
    d1 = store.read(spark, "host_state_r1")
    hosts_r1 = {
        r["host"] for r in store.read(spark, "pages_out_r1")
        .select("host").distinct().collect()
    }
    assert {r["host"] for r in d1.collect()} == hosts_r1  # ∝ touched hosts
    assert d1.count() == len(hosts_r1)
    eng.run(max_rounds=50)
    # folded view == per-host totals recomputed from the full pages_out log
    expect = {
        (r["host"], r["cnt"]) for r in eng.pages_out().groupBy("host")
        .count().withColumnRenamed("count", "cnt").collect()
    }
    got = {(r["host"], r["fetched"]) for r in eng.host_state().collect()}
    assert got == expect

    # aggressive compaction: same crawl, deltas folded into the base table
    store2 = SnapshotStore(str(tmp_path / "s2"))
    eng2 = CrawlScheduler(spark, store2, config, tiny_pages, n_buckets=8,
                          seen_compact_every=2)
    eng2.run(max_rounds=50)
    snap2 = store2.snapshot()
    deltas = [t for t in snap2.tables if t.startswith("host_state_r")]
    assert "host_state" in snap2.tables and len(deltas) < 2
    got2 = {(r["host"], r["fetched"]) for r in eng2.host_state().collect()}
    assert got2 == expect
    assert eng2.visit_order() == eng.visit_order()


def test_reseed_stale_recrawl(spark, tiny_pages, tiny_web, tmp_path):
    """Freshness scheduling (r3): completed URLs older than max_age go back
    into the live frontier atomically; the recrawl re-fetches exactly them,
    never re-discovers (url_seen unchanged), and never double-enqueues."""
    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article",
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng.run(max_rounds=50)
    order1 = eng.visit_order()
    n1 = len(order1)
    assert n1 > 10 and eng.meta.get("finished")
    seen_before = eng.url_seen().count()

    assert eng.reseed_stale(max_age_s=10 ** 9) == 0  # nothing aged out yet
    n = eng.reseed_stale(max_age_s=0)
    assert n == n1
    assert eng.reseed_stale(max_age_s=0) == 0  # already live — no dupes
    live = eng.live_frontier()
    assert live.count() == n1
    assert live.filter(live.status != "pending").count() == 0

    eng2 = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng2.run(max_rounds=50)
    order2 = eng2.visit_order()
    assert len(order2) == 2 * n1          # every page fetched twice
    assert sorted(order2) == sorted(order1 * 2)
    assert eng2.url_seen().count() == seen_before  # no re-discovery
    # both fetches kept in terminal history (append-only, CC-segment style)
    done = eng2.done_frontier()
    assert done.filter(done.status == "completed").count() == 2 * n1


def test_fully_blocked_round_terminates(spark, tmp_path):
    """Liveness (r3): when a round's whole eligible set is robots-blocked,
    the blocked rows must terminalize in that commit and the crawl must
    FINISH — not idle to max_rounds with the rows stuck pending."""
    from datetime import datetime, timezone

    from context_crawler_spark.sources.synthetic_web import PAGES_SCHEMA

    web = {
        "https://r.test/": '<html><body><article>root '
                           '<a href="/a">a</a><a href="/b">b</a>'
                           "</article></body></html>",
        "https://r.test/a": "<html><body><article>A</article></body></html>",
        "https://r.test/b": "<html><body><article>B</article></body></html>",
    }
    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    pages = spark.createDataFrame(
        [(u, ts, h.encode(), "", "en") for u, h in web.items()], PAGES_SCHEMA)
    robots_rows = [("r.test", "disallow", "/a"), ("r.test", "disallow", "/b")]
    robots = spark.createDataFrame(
        robots_rows, "host string, rule_type string, path_prefix string")
    config = CrawlConfig(
        entry="https://r.test/", match=["https://r.test/**"],
        selector="article", respect_robots=True, auto_discover_nav=False,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=4)
    meta = eng.run(max_rounds=10, robots=robots)
    assert meta.get("finished"), eng.metrics()
    assert eng.visit_order() == ["https://r.test/"]
    done = eng.done_frontier()
    blocked = done.filter(done.error == "robots_disallowed")
    assert blocked.count() == 2
    assert eng.live_frontier().count() == 0
    # far fewer rounds than the cap — no idle spin
    assert int(meta["round"]) <= 4
    oracle = run_oracle(config, web, robots=robots_rows)
    assert eng.visit_order() == oracle.visit_order


def _downgrade_to_legacy(store, eng):
    """Rewrite a bucketed store as a pre-bucketing one: live rows in ONE
    monolithic ``frontier`` table, bucket manifest entries dropped."""
    live = eng.live_frontier()
    bucket_keys = [t for t in store.snapshot().tables
                   if t.startswith("frontier#b")]
    store.commit({"frontier": live}, drop=bucket_keys, metadata=eng.meta,
                 tag="downgrade-legacy")


def test_legacy_migration_in_reseed(spark, tiny_pages, tiny_web, tmp_path):
    """ADVICE r3 #1: reseed_stale on a pre-bucketing store must run the
    same one-time migration as run_round — fold the monolithic legacy
    rows into the bucketed MERGE and drop ``frontier`` in the same
    commit. Otherwise the fresh buckets shadow the legacy pending rows
    and the next run_round rebuilds all buckets from the legacy table
    alone, silently discarding the reseeded rows."""
    from collections import Counter

    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article", politeness_budget=3,
    )
    store = SnapshotStore(str(tmp_path / "a"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng.seed()
    for _ in range(3):
        eng.run_round()
    pending_before = eng.live_frontier().filter("status = 'pending'").count()
    completed_before = eng.visit_order()
    assert pending_before > 0 and len(completed_before) > 0
    _downgrade_to_legacy(store, eng)
    assert "frontier" in store.snapshot().tables

    n = eng.reseed_stale(max_age_s=0)
    assert n == len(completed_before)
    snap = store.snapshot()
    assert "frontier" not in snap.tables  # legacy dropped atomically
    assert any(t.startswith("frontier#b") for t in snap.tables)
    # legacy pending rows survived the merge alongside the reseeded ones
    live = eng.live_frontier()
    assert live.filter("status = 'pending'").count() == pending_before + n

    eng2 = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng2.run(max_rounds=60)
    counts = Counter(eng2.visit_order())
    full = run_oracle(config, tiny_web).visit_order
    assert set(counts) == set(full)
    redone = set(completed_before)
    for u in full:
        assert counts[u] == (2 if u in redone else 1), u


def test_legacy_migration_in_blocked_only_commit(spark, tmp_path):
    """ADVICE r3 #1 (sibling): a fully-robots-blocked round on a
    pre-bucketing store must terminalize the blocked rows AND migrate +
    drop the monolithic table in the same commit — the blocked rows must
    never be re-pended (claimable twice) by a later migration pass."""
    from datetime import datetime, timezone

    from context_crawler_spark.sources.synthetic_web import PAGES_SCHEMA

    web = {
        "https://r.test/": '<html><body><article>root '
                           '<a href="/a">a</a><a href="/b">b</a>'
                           "</article></body></html>",
        "https://r.test/a": "<html><body><article>A</article></body></html>",
        "https://r.test/b": "<html><body><article>B</article></body></html>",
    }
    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    pages = spark.createDataFrame(
        [(u, ts, h.encode(), "", "en") for u, h in web.items()], PAGES_SCHEMA)
    robots = spark.createDataFrame(
        [("r.test", "disallow", "/a"), ("r.test", "disallow", "/b")],
        "host string, rule_type string, path_prefix string")
    config = CrawlConfig(
        entry="https://r.test/", match=["https://r.test/**"],
        selector="article", respect_robots=True, auto_discover_nav=False,
    )
    store = SnapshotStore(str(tmp_path / "b"))
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=4)
    eng.seed()
    eng.run_round(robots=robots)            # fetch root, discover /a /b
    _downgrade_to_legacy(store, eng)
    meta = eng.run(max_rounds=10, robots=robots)  # next round: all blocked
    assert meta.get("finished"), eng.metrics()
    snap = store.snapshot()
    assert "frontier" not in snap.tables
    assert eng.live_frontier().count() == 0
    done = eng.done_frontier()
    assert done.filter(done.error == "robots_disallowed").count() == 2
    assert eng.visit_order() == ["https://r.test/"]


def test_frontier_bucket_count_scales_with_backlog(spark, tmp_path):
    """VERDICT r3 #4: NB grows with the backlog (power-of-two doublings,
    re-bucketing the live set in a round's commit) and the STORED NB wins
    over any later constructor value — a resuming scheduler must target
    the pmod space the store was written with."""
    from datetime import datetime, timezone

    from context_crawler_spark.sources.synthetic_web import PAGES_SCHEMA

    n_seeds = 300
    urls = [f"https://nb.test/p{i}" for i in range(n_seeds)]
    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    html = b"<html><body><article>x</article></body></html>"
    pages = spark.createDataFrame(
        [(u, ts, html, "x", "en") for u in urls], PAGES_SCHEMA)
    config = CrawlConfig(
        entry="https://nb.test/p0", match=["https://nb.test/**"],
        selector="article", politeness_budget=64, auto_discover_nav=False,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=8,
                         frontier_buckets=8, frontier_rows_per_bucket=16)
    eng.seed(extra_seeds=urls[1:])
    assert eng._nb() == 8  # seeded at the constructor NB
    eng.run_round()
    # 300-row backlog / 16 rows-per-bucket → next pow2 ≥ 19 → NB 32
    assert eng._nb() == 32
    assert eng.meta["frontier_buckets"] == 32
    assert len(store.bucket_tables("frontier")) > 8
    # resume under a DIFFERENT constructor default: stored NB wins
    eng2 = CrawlScheduler(spark, store, config, pages, n_buckets=8,
                          frontier_buckets=8, frontier_rows_per_bucket=16)
    assert eng2._nb() == 32
    eng2.run(max_rounds=20)
    assert sorted(eng2.visit_order()) == sorted(urls)
    assert eng2.live_frontier().count() == 0


def test_bloom_capacity_scales_with_seen_set(spark, tmp_path):
    """VERDICT r4 #8: bloom shard sizing derives from the same backlog
    estimator that drives NB — when |url_seen| (== next_seq) outgrows
    n_buckets x expected_per_bucket, the round rebuilds every shard at the
    doubled capacity (persisted in snapshot metadata, winning over the
    constructor on resume), keeping bits-per-key — and so fpp — bounded
    through growth. Dedup stays exact across the rebuild and the shard
    footprint is recorded in metrics."""
    from datetime import datetime, timezone

    from context_crawler_spark.sources.synthetic_web import PAGES_SCHEMA

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    n_children = 40
    hub_links = "".join(
        f'<a href="/c{i}">c</a>' for i in range(n_children))
    rows = [("https://bl.test/", ts,
             f"<html><body><article>hub{hub_links}</article></body></html>"
             .encode(), "hub", "en")]
    # children link BACK to the hub and to each other — every later round
    # re-offers already-seen URLs through the (possibly rebuilt) prefilter
    rows += [
        (f"https://bl.test/c{i}", ts,
         (f'<html><body><article>c{i}<a href="/">up</a>'
          f'<a href="/c{(i + 1) % n_children}">n</a></article></body></html>'
          ).encode(), f"c{i}", "en")
        for i in range(n_children)
    ]
    pages = spark.createDataFrame(rows, PAGES_SCHEMA)
    config = CrawlConfig(
        entry="https://bl.test/", match=["https://bl.test/**"],
        selector="article", politeness_budget=50, auto_discover_nav=False,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=4,
                         expected_urls_per_bucket=2)  # capacity 8 << 41
    eng.seed()
    seeded = store.snapshot().metadata["bloom"]
    assert seeded["expected_per_bucket"] == 2
    eng.run(max_rounds=10)
    grown = store.snapshot().metadata["bloom"]
    # 41 seen URLs / 4 buckets → doubled 2→4→8→16
    assert grown["expected_per_bucket"] == 16
    assert grown["m_bits"] >= seeded["m_bits"]
    # both sizings sit on the 1024-bit/shard floor at toy capacity; the
    # sizing RULE is what must hold (m_bits grows once exp*12 > 1024)
    assert grown["m_bits"] == max(1024, 16 * 12)
    assert grown["shard_bytes_total"] == 4 * ((grown["m_bits"] + 7) // 8)
    # dedup stayed exact through the rebuild: every page visited once
    order = eng.visit_order()
    assert len(order) == len(set(order)) == 1 + n_children
    # footprint recorded per round once shards exist
    assert any(m.get("bloom_shard_bytes") == grown["shard_bytes_total"]
               for m in eng.metrics())
    # a resuming scheduler picks up the GROWN sizing, not its constructor
    eng2 = CrawlScheduler(spark, store, config, pages, n_buckets=4,
                          expected_urls_per_bucket=2)
    assert eng2.meta["bloom"]["expected_per_bucket"] == 16


def test_metrics_live_in_tables_not_manifest(spark, tiny_pages, tiny_web,
                                             tmp_path):
    """VERDICT r3 #4: per-round metrics/lineage append to a bounded set of
    metric TABLES (compacted on cadence); the snapshot manifest metadata
    stays O(tables) — no accumulating history."""
    import json

    config = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article", politeness_budget=3,
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8,
                         seen_compact_every=4)
    eng.run(max_rounds=50)
    snap = store.snapshot()
    assert "metrics" not in snap.metadata
    assert len(json.dumps(snap.metadata)) < 4000  # config + counters only
    mdeltas = [t for t in snap.tables if t.startswith("metrics_s")]
    assert len(mdeltas) < 4          # bounded by the compaction cadence
    assert "crawl_metrics" in snap.tables
    hist = eng.metrics()
    rounds = [m["round"] for m in hist if m.get("claimed", 0) > 0]
    assert len(hist) >= int(eng.meta["round"])  # every round recorded
    assert rounds == sorted(rounds)
    assert any(m.get("finished") for m in hist)
    assert any("lineage" in m for m in hist)  # lineage in the table, too
