"""robots.txt parsing + RFC 9309 wildcard matching: parser semantics,
JVM-vs-Python translation parity, and the per-host crawl-delay gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from context_crawler_spark.functions.robots import (
    allows,
    pattern_matches,
    pattern_to_regex,
    robots_tables,
    select_rules,
)

ROBOTS_TXT = """
# example robots
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 10

User-agent: contextcrawler
User-agent: otherbot
Disallow: /*.pdf$
Disallow: /search?
Allow: /search?allowed=
Crawl-delay: 2

User-agent: contextcrawler-images
Disallow: /
"""


def test_group_selection_longest_prefix():
    # our token 'contextcrawler' matches the 'contextcrawler' group, not *
    rules, delay = select_rules(ROBOTS_TXT, "contextcrawler")
    assert ("disallow", "/*.pdf$") in rules
    assert ("disallow", "/private/") not in rules  # * group not merged
    assert delay == 2.0
    # a longer product token picks the more specific group
    rules_img, _ = select_rules(ROBOTS_TXT, "contextcrawler-images/1.0")
    assert rules_img == [("disallow", "/")]
    # unknown bot falls back to the * group
    rules_star, delay_star = select_rules(ROBOTS_TXT, "nobody")
    assert ("disallow", "/private/") in rules_star and delay_star == 10.0


def test_empty_disallow_and_garbage_lines():
    rules, _ = select_rules("User-agent: *\nDisallow:\nNoise\nAllow: /a\n", "x")
    assert rules == [("allow", "/a")]
    assert select_rules("", "x") == ([], None)


@pytest.mark.parametrize("pattern,path,expected", [
    ("/private/", "/private/x", True),
    ("/private/", "/privateer", False),
    ("/*.pdf$", "/docs/a.pdf", True),
    ("/*.pdf$", "/docs/a.pdf?x=1", False),   # $ anchors the end
    ("/search?", "/search?q=1", True),
    ("/search?", "/search", False),
    ("/a*b*c", "/aXXbYYc", True),
    ("/a*b*c", "/acb", False),
    ("/", "/anything", True),
    ("/p$", "/p", True),
    ("/p$", "/pq", False),
])
def test_pattern_matching(pattern, path, expected):
    assert pattern_matches(pattern, path) is expected


def test_longest_pattern_wins_allow_ties():
    rules = [("disallow", "/private/"), ("allow", "/private/ok")]
    assert not allows(rules, "/private/x")
    assert allows(rules, "/private/ok/page")
    # tie on length → allow
    assert allows([("disallow", "/ab"), ("allow", "/ab")], "/abc")


def test_jvm_translation_matches_python(spark):
    """The built-in-expression pattern→regex in apply_robots must agree
    with functions/robots.pattern_to_regex on an adversarial corpus."""
    from context_crawler_spark.operators.politeness import apply_robots
    from tests.oracle import _robots_allows

    patterns = ["/private/", "/*.pdf$", "/search?", "/a*b*c", "/", "/p$",
                "/w(e)i[r]d{2}", "/dot.path", "/back\\slash", "/$", "/*$"]
    paths = ["/private/x", "/privateer", "/docs/a.pdf", "/docs/a.pdf?x=1",
             "/search?q=1", "/search", "/aXXbYYc", "/acb", "/p", "/pq",
             "/w(e)i[r]d{2}/x", "/dot.path/y", "/dotXpath", "/back\\slash",
             "/", "/anything"]
    rows = [(f"https://h.test{p}", "h.test") for p in paths]
    df = spark.createDataFrame(rows, "url string, host string")
    for pattern in patterns:
        for rtype in ("disallow",):
            robots_rows = [("h.test", rtype, pattern)]
            robots = spark.createDataFrame(
                robots_rows, "host string, rule_type string, path_prefix string")
            engine = {r["url"] for r in apply_robots(df, robots).collect()}
            python = {u for u, _h in rows
                      if _robots_allows(robots_rows, "h.test", u)}
            assert engine == python, pattern
            spec = {u for u, _h in rows
                    if allows([(rtype, pattern)],
                              u.replace("https://h.test", "") or "/")}
            assert engine == spec, pattern


def test_robots_tables_and_per_host_crawl_delay(spark, tiny_pages):
    """End-to-end: robots.txt text → (rules, delays) tables → the scheduler
    honors a per-host Crawl-delay (host sits out rounds) while an
    un-delayed host is fetched every round."""
    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.scheduler import CrawlScheduler
    from context_crawler_spark.state import SnapshotStore
    import tempfile

    rules, delays = robots_tables(
        spark,
        {"site0.test": "User-agent: *\nCrawl-delay: 120\n"},  # 2 rounds
        user_agent="contextcrawler",
    )
    assert rules.count() == 0
    assert delays.collect()[0]["crawl_delay_s"] == 120.0

    cfg = CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        selector="article", politeness_budget=2,
    )
    store = SnapshotStore(tempfile.mkdtemp())
    eng = CrawlScheduler(spark, store, cfg, tiny_pages, n_buckets=8,
                         host_delays=delays)
    eng.run(max_rounds=40)
    rounds = [r["round"] for r in
              eng.pages_out().select("round").distinct().collect()]
    rs = sorted(rounds)
    # delayed host: ≥2 round gaps between consecutive fetch rounds
    assert len(rs) > 1 and all(b - a >= 2 for a, b in zip(rs, rs[1:])), rs


def test_run_crawl_robots_input_detection(tmp_path):
    """ADVICE r2: a Spark-written parquet rules dir (part files + _SUCCESS
    + .crc sidecars) must be detected as parquet, NOT parsed as robots.txt
    text; a true robots.txt dir skips hidden files and sidecars."""
    import os
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from run_crawl import _is_parquet_dataset, _read_robots_txt_dir

    pq = tmp_path / "rules_parquet"
    os.makedirs(pq)
    (pq / "_SUCCESS").write_bytes(b"")
    (pq / "part-00000-abc.snappy.parquet").write_bytes(b"PAR1...")
    (pq / ".part-00000-abc.snappy.parquet.crc").write_bytes(b"\x00")
    assert _is_parquet_dataset(str(pq))

    txt = tmp_path / "robots_txt"
    os.makedirs(txt)
    (txt / "a.test.txt").write_text("User-agent: *\nDisallow: /x\n")
    (txt / "b.test").write_text("User-agent: *\nCrawl-delay: 3\n")
    (txt / ".hidden").write_text("junk")
    (txt / "c.crc").write_bytes(b"\x00")
    assert not _is_parquet_dataset(str(txt))
    texts = _read_robots_txt_dir(str(txt))
    assert set(texts) == {"a.test", "b.test"}
    assert "Disallow: /x" in texts["a.test"]


def test_sitemap_directives_collected_group_independent():
    """Sitemap: lines are group-independent (before any User-agent, inside
    groups, anywhere) and keep file order; relative/garbage values drop."""
    from context_crawler_spark.functions.robots import sitemap_urls

    text = (
        "Sitemap: https://a.test/sm-index.xml\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://a.test/sm-2.xml\n"
        "User-agent: other\n"
        "sitemap: https://a.test/sm-3.xml   # case-insensitive + comment\n"
        "Sitemap: /relative-ignored.xml\n"
    )
    assert sitemap_urls(text) == [
        "https://a.test/sm-index.xml",
        "https://a.test/sm-2.xml",
        "https://a.test/sm-3.xml",
    ]
    assert sitemap_urls("") == []


def test_sitemap_table_shape(spark):
    from context_crawler_spark.functions.robots import sitemap_table

    t = sitemap_table(spark, {
        "a.test": "Sitemap: https://a.test/sm.xml\nUser-agent: *\nAllow: /",
        "b.test": "User-agent: *\nDisallow: /x",
    })
    rows = [(r["host"], r["sitemap_url"], r["pos"]) for r in t.collect()]
    assert rows == [("a.test", "https://a.test/sm.xml", 0)]


def test_honor_meta_robots_noindex_nofollow(spark, tmp_path):
    """Page-level robots directives wired through the crawl loop
    (config.honor_meta_robots): a noindex page is fetched and its links
    expand, but it is NOT in pages_out; a nofollow page is emitted but
    its links do NOT expand; with the flag off (default) both behaviors
    revert to reference parity (everything emitted + expanded)."""
    from datetime import datetime

    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.scheduler import CrawlScheduler
    from context_crawler_spark.state import SnapshotStore

    def page(path, body, meta=""):
        html = (f"<html><head><title>{path}</title>{meta}</head>"
                f"<body><article>{body}</article></body></html>")
        return (f"https://m.test{path}", datetime(2024, 1, 1), html.encode())

    rows = [
        page("/", 'root <a href="/a">a</a> <a href="/b">b</a>'),
        page("/a", 'secret <a href="/c">c</a>',
             '<meta name="robots" content="noindex">'),
        page("/b", 'listed <a href="/d">d</a>',
             '<meta name="robots" content="nofollow">'),
        page("/c", "reached via a"),
        page("/d", "never reached when honoring"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")

    def crawl(tag, honor):
        cfg = CrawlConfig(entry="https://m.test/",
                          match=["https://m.test/**"], selector="article",
                          honor_meta_robots=honor)
        eng = CrawlScheduler(spark, SnapshotStore(str(tmp_path / tag)),
                             cfg, pages, n_buckets=4)
        eng.run(max_rounds=10)
        return eng

    eng = crawl("honor", True)
    # dataset view (pages_out / visit_order): /a suppressed by noindex,
    # /d never discovered (nofollow on /b) — but /c present proves the
    # noindex page's links DID expand
    assert set(eng.visit_order()) == {
        "https://m.test/", "https://m.test/b", "https://m.test/c"}
    # the frontier records /a as genuinely fetched (completed, no /d row)
    fr = {r["url"]: r["status"] for r in
          eng.frontier().select("url", "status").collect()}
    assert fr["https://m.test/a"] == "completed"
    assert "https://m.test/d" not in fr
    m = [x for x in eng.metrics() if x.get("fetched")]
    assert sum(x["fetched"] for x in m) == 4     # /a counts as fetched
    assert sum(x.get("emitted", 0) for x in m) == 3
    assert all(x["fetch_misses"] == 0 for x in m)
    # host_state tallies ALL fetches (politeness events), not just the
    # emitted set: the noindex /a fetch must advance the host's counters
    hs = {r["host"]: r["fetched"] for r in eng.host_state().collect()}
    assert hs == {"m.test": 4}

    off = crawl("off", False)
    assert set(off.visit_order()) == {
        "https://m.test/", "https://m.test/a", "https://m.test/b",
        "https://m.test/c", "https://m.test/d"}
    assert {r["url"] for r in off.pages_out().select("url").collect()} == \
        set(off.visit_order())
