"""Live HTTP fetch operator (operators/fetch.py): parity with the
pages-table join over the same site, politeness delay between same-host
requests, robots enforcement, retry-on-failure, config plumbing
(cookie / resource_exclusions / timeout)."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.operators.fetch import HttpFetcher
from context_crawler_spark.plans.scheduler import CrawlScheduler, round_ts
from context_crawler_spark.sources.synthetic_web import generate_pages
from context_crawler_spark.state import SnapshotStore


class _Site:
    """In-process HTTP server serving {path: html}, logging every request."""

    def __init__(self, pages: dict[str, bytes]):
        self.pages = pages
        self.requests: list[tuple[float, str, dict]] = []
        site = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — http.server API
                site.requests.append(
                    (time.monotonic(), self.path, dict(self.headers))
                )
                body = site.pages.get(self.path)
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                if body == b"__BOOM__":
                    self.send_response(500)
                    self.end_headers()
                    return
                if body.startswith(b"__REDIRECT__:"):
                    self.send_response(302)
                    self.send_header(
                        "Location", body[len(b"__REDIRECT__:"):].decode())
                    self.end_headers()
                    return
                # HTTP revalidation (RFC 9110 §13.1): strong ETag = md5 of
                # the body, fixed Last-Modified; a matching If-None-Match
                # (preferred) or If-Modified-Since answers 304 with no body
                import hashlib

                etag = '"' + hashlib.md5(body).hexdigest() + '"'
                lastmod = "Mon, 01 Jan 2024 00:00:00 GMT"
                if self.headers.get("If-None-Match") is not None:
                    if self.headers["If-None-Match"] == etag:
                        self.send_response(304)
                        self.send_header("ETag", etag)
                        self.end_headers()
                        return
                elif self.headers.get("If-Modified-Since") == lastmod:
                    self.send_response(304)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("ETag", etag)
                self.send_header("Last-Modified", lastmod)
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence
                pass

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.base = f"http://127.0.0.1:{self.port}"
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()

    def paths_hit(self) -> list[str]:
        return [p for _t, p, _h in self.requests]

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def site0_rows():
    """site0 of the golden synthetic web, host rewritten later per test."""
    return [r for r in generate_pages(seed=42, n_hosts=3, pages_per_section=8)
            if r["url"].startswith("https://site0.test")]


def _rewrite(rows, base: str):
    """Map the synthetic site onto the local server's URL space — SAME
    rewrite applied to the pages-table side, so the two crawls see one
    site."""
    out = []
    for r in rows:
        out.append({
            **r,
            "url": r["url"].replace("https://site0.test", base),
            "html": r["html"].replace(b"https://site0.test", base.encode()),
        })
    return out


def _serve(rows, base: str) -> dict[str, bytes]:
    pages = {}
    for r in rows:
        path = r["url"][len(base):] or "/"
        pages[path] = r["html"]
    return pages


def _crawl(spark, tmp_path, tag, cfg, pages=None, fetcher=None, robots=None):
    store = SnapshotStore(str(tmp_path / tag))
    eng = CrawlScheduler(spark, store, cfg, pages, n_buckets=8,
                         fetcher=fetcher)
    eng.run(max_rounds=30, robots=robots)
    return eng


def test_http_crawl_matches_join_crawl(spark, site0_rows, tmp_path):
    """THE parity gate (VERDICT r2 #1): the live-fetch crawl must produce
    the identical visit order and byte-identical extracted text as the
    pages-table-join crawl over the same site."""
    site = _Site({})
    try:
        rows = _rewrite(site0_rows, site.base)
        site.pages.update(_serve(rows, site.base))
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article")
        pages_df = spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"]) for r in rows],
            "url string, warc_ts timestamp, html binary",
        )
        join_eng = _crawl(spark, tmp_path, "join", cfg, pages=pages_df)
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        http_eng = _crawl(spark, tmp_path, "http", cfg, fetcher=fetcher)

        assert http_eng.visit_order() == join_eng.visit_order()
        texts = lambda e: {  # noqa: E731
            r["url"]: r["text"] for r in e.pages_out().collect()
        }
        assert texts(http_eng) == texts(join_eng)
        assert len(join_eng.visit_order()) == len(site0_rows)
    finally:
        site.close()


def test_fetch_miss_flows_into_retry_then_terminal(spark, site0_rows, tmp_path):
    """A 500ing URL keeps html NULL → the scheduler's existing retry/backoff
    turns it into attempts=max_attempts then terminal-failed."""
    site = _Site({})
    try:
        rows = _rewrite(site0_rows, site.base)
        served = _serve(rows, site.base)
        served["/docs/page-3"] = b"__BOOM__"  # permanent 500
        site.pages.update(served)
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article", max_attempts=2)
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        eng = _crawl(spark, tmp_path, "http", cfg, fetcher=fetcher)
        full = eng.frontier()
        bad = full.filter(F.col("url").endswith("/docs/page-3")).head()
        assert bad["status"] == "failed"
        assert bad["attempts"] == 2
        assert bad["error"] == "fetch_miss"
        assert bad["completed_at"] is not None
        # the 500 path was actually retried over the wire
        assert site.paths_hit().count("/docs/page-3") == 2
    finally:
        site.close()


def test_robots_disallow_never_hits_the_wire(spark, site0_rows, tmp_path):
    """Robots filtering happens BEFORE the fetch stage: a disallowed path
    must never reach the server."""
    from context_crawler_spark.functions.robots import robots_tables

    site = _Site({})
    try:
        rows = _rewrite(site0_rows, site.base)
        site.pages.update(_serve(rows, site.base))
        rules, _delays = robots_tables(
            spark, {"127.0.0.1": "User-agent: *\nDisallow: /guide\n"},
        )
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article", respect_robots=True)
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        _crawl(spark, tmp_path, "http", cfg, fetcher=fetcher, robots=rules)
        hit = site.paths_hit()
        assert hit, "crawl made no requests"
        assert not any(p.startswith("/guide") for p in hit)
        assert any(p.startswith("/docs") for p in hit)
    finally:
        site.close()


def test_per_host_crawl_delay_spaces_requests(spark, tmp_path):
    """Within one fetch batch, same-host requests are spaced by the crawl
    delay (the task-local sleep), while the operator stays distributed
    (one task per host)."""
    site = _Site({f"/p{i}": b"<html><body>x</body></html>" for i in range(3)})
    try:
        cfg = CrawlConfig(entry=f"{site.base}/p0", host_crawl_delay_s=1)
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        batch = spark.createDataFrame(
            [(f"{site.base}/p{i}", "127.0.0.1", i) for i in range(3)],
            "url string, host string, seq long",
        )
        out = fetcher(batch, round_ts(1)).collect()
        assert sum(1 for r in out if r["html"] is not None) == 3
        times = sorted(t for t, _p, _h in site.requests)
        gaps = [b - a for a, b in zip(times, times[1:])]
        assert len(gaps) == 2 and all(g >= 0.9 for g in gaps), gaps
    finally:
        site.close()


def test_cookie_and_resource_exclusions(spark, tmp_path):
    """config.cookie becomes the Cookie header; excluded extensions are
    skipped pre-fetch (reference request-block list, src/core.ts:243-250)."""
    site = _Site({
        "/a": b"<html><body>a</body></html>",
        "/big.png": b"<html><body>not really</body></html>",
    })
    try:
        cfg = CrawlConfig(
            entry=f"{site.base}/a",
            cookie=[{"name": "consent", "value": "yes"},
                    {"name": "session", "value": "s1"}],
            resource_exclusions=["png", "jpg"],
        )
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        batch = spark.createDataFrame(
            [(f"{site.base}/a", "127.0.0.1", 0),
             (f"{site.base}/big.png", "127.0.0.1", 1)],
            "url string, host string, seq long",
        )
        got = {r["url"]: r["html"] for r in fetcher(batch, round_ts(1)).collect()}
        assert got[f"{site.base}/a"] is not None
        assert got[f"{site.base}/big.png"] is None  # skipped, not 404ed
        assert site.paths_hit() == ["/a"]
        hdrs = site.requests[0][2]
        assert hdrs.get("Cookie") == "consent=yes; session=s1"
        assert hdrs.get("User-Agent") == "contextcrawler"
    finally:
        site.close()


def test_redirects_same_host_followed_cross_host_refused(spark):
    """ADVICE r3: scope/robots/allowlist/politeness were all evaluated
    against the ORIGINAL URL, so the fetcher follows same-host redirects
    (http→https, trailing slash) but treats any cross-host hop as a miss
    — it must never fetch, nor attribute to the original host, content
    from a host that was gated differently."""
    site = _Site({
        "/a": b"<html><body>target</body></html>",
        "/r": b"__REDIRECT__:/a",
        # 'localhost' resolves to the same server but is a DIFFERENT
        # hostname — the off-origin case, observable if it hits the wire
        "/evil": b"",
        "/loop": b"__REDIRECT__:/loop",
    })
    try:
        site.pages["/evil"] = (
            b"__REDIRECT__:http://localhost:%d/a" % site.port)
        cfg = CrawlConfig(entry=f"{site.base}/a")
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        batch = spark.createDataFrame(
            [(f"{site.base}/r", "127.0.0.1", 0),
             (f"{site.base}/evil", "127.0.0.1", 1),
             (f"{site.base}/loop", "127.0.0.1", 2)],
            "url string, host string, seq long",
        )
        got = {r["url"]: r["html"] for r in fetcher(batch, round_ts(1)).collect()}
        assert got[f"{site.base}/r"] == site.pages["/a"]  # same-host followed
        assert got[f"{site.base}/evil"] is None           # cross-host miss
        assert got[f"{site.base}/loop"] is None           # loop exhausted
        # the cross-host target was never requested (no /a hit beyond the
        # one the same-host redirect legitimately caused)
        assert site.paths_hit().count("/a") == 1
    finally:
        site.close()


def test_timeout_is_a_retryable_miss(spark):
    """A connection that can't be established yields NULL html (no raise) —
    the scheduler treats it like any fetch miss."""
    cfg = CrawlConfig(entry="http://127.0.0.1:9/never",
                      wait_for_selector_timeout=500)
    fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
    assert fetcher.timeout_s == 0.5
    batch = spark.createDataFrame(
        [("http://127.0.0.1:9/never", "127.0.0.1", 0)],
        "url string, host string, seq long",
    )
    (row,) = fetcher(batch, round_ts(1)).collect()
    assert row["html"] is None


def _fake_renderer(url: str, body: bytes) -> bytes:
    """Fixture 'browser': executes the page's inline JSON payload the way
    the reference's Playwright render executes scripts — the static shell
    has an EMPTY article; the rendered DOM carries the real text + links
    (reference src/core.ts:133-148 selector wait)."""
    import json as _json
    import re as _re

    m = _re.search(rb'<script type="application/json" id="payload">(.*?)'
                   rb"</script>", body, _re.S)
    if not m:
        return body
    payload = _json.loads(m.group(1))
    links = "".join(f'<a href="{h}">l</a>' for h in payload.get("links", []))
    rendered = f"<article>{payload['text']} {links}</article>".encode()
    return body.replace(b"<article></article>", rendered)


def _spa_page(text: str, links: list[str]) -> bytes:
    import json as _json

    payload = _json.dumps({"text": text, "links": links}).encode()
    return (b"<html><head><title>spa</title></head><body>"
            b"<article></article>"
            b'<script type="application/json" id="payload">' + payload
            + b"</script></body></html>")


def test_render_seam_parity_with_static_fetch(spark, tmp_path):
    """VERDICT r3 #5: an SPA site crawled with the render seam must yield
    the rendered text AND discover renderer-injected links, while the
    static crawl sees empty selectors and no frontier growth — proving a
    browser-pool adapter drops in without touching the scheduler."""
    site = _Site({
        "/": _spa_page("home rendered", ["/a", "/b"]),
        "/a": _spa_page("page a rendered", []),
        "/b": _spa_page("page b rendered", []),
    })
    try:
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article", auto_discover_nav=False)
        static_eng = _crawl(
            spark, tmp_path, "static", cfg,
            fetcher=HttpFetcher(cfg, allow_hosts={"127.0.0.1"}))
        rendered_eng = _crawl(
            spark, tmp_path, "rendered", cfg,
            fetcher=HttpFetcher(cfg, allow_hosts={"127.0.0.1"},
                                render=_fake_renderer))
        # static GET: empty selector, no links → 1 page, empty text
        assert static_eng.visit_order() == [f"{site.base}/"]
        (srow,) = static_eng.pages_out().collect()
        assert srow["text"] == ""
        # rendered: full text, injected links crawled
        assert rendered_eng.visit_order() == [
            f"{site.base}/", f"{site.base}/a", f"{site.base}/b"]
        texts = {r["url"]: r["text"]
                 for r in rendered_eng.pages_out().collect()}
        assert texts[f"{site.base}/"].startswith("home rendered")
        assert texts[f"{site.base}/a"] == "page a rendered"
    finally:
        site.close()


def test_render_failure_is_a_retryable_miss(spark):
    """A raising renderer must not kill the task — the page becomes a
    fetch miss and flows into retry/backoff like any network failure."""
    site = _Site({"/x": b"<html><body><article>x</article></body></html>"})
    try:
        def boom(url, body):
            raise RuntimeError("browser crashed")

        cfg = CrawlConfig(entry=f"{site.base}/x")
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"}, render=boom)
        batch = spark.createDataFrame(
            [(f"{site.base}/x", "127.0.0.1", 0)],
            "url string, host string, seq long",
        )
        (row,) = fetcher(batch, round_ts(1)).collect()
        assert row["html"] is None
    finally:
        site.close()


def test_revalidate_conditional_get_304_and_changed(spark):
    """HTTP revalidation end-to-end: conditional_fetch_plan attaches the
    stored validators per URL; HttpFetcher.revalidate echoes them as
    If-None-Match / If-Modified-Since; a matching ETag answers 304
    (not_modified, no body crosses the wire), a stale ETag answers 200
    with the new body, a validator-less URL does a plain full GET."""
    import hashlib

    from context_crawler_spark.sources.cdx import conditional_fetch_plan

    same = b"<html><body><article>unchanged</article></body></html>"
    new = b"<html><body><article>rewritten</article></body></html>"
    site = _Site({"/same": same, "/changed": new, "/nohist": same})
    try:
        cur_etag = '"' + hashlib.md5(same).hexdigest() + '"'
        old_etag = '"' + hashlib.md5(b"the old body").hexdigest() + '"'
        captures = spark.createDataFrame(
            [
                # two captures of /same — the LATEST one's etag must win
                (f"{site.base}/same", 1, old_etag, None),
                (f"{site.base}/same", 2, cur_etag,
                 "Mon, 01 Jan 2024 00:00:00 GMT"),
                (f"{site.base}/changed", 2, old_etag, None),
            ],
            "url string, ts long, etag string, last_modified string",
        )
        refetch = spark.createDataFrame(
            [(f"{site.base}/same", "127.0.0.1"),
             (f"{site.base}/changed", "127.0.0.1"),
             (f"{site.base}/nohist", "127.0.0.1")],
            "url string, host string",
        )
        plan = conditional_fetch_plan(refetch, captures)
        rows = {r["url"]: r for r in plan.collect()}
        assert rows[f"{site.base}/same"]["if_none_match"] == cur_etag
        assert rows[f"{site.base}/same"]["conditional"]
        assert rows[f"{site.base}/changed"]["if_none_match"] == old_etag
        assert not rows[f"{site.base}/nohist"]["conditional"]
        assert rows[f"{site.base}/nohist"]["if_none_match"] is None

        fetcher = HttpFetcher(CrawlConfig(entry=f"{site.base}/same"),
                              allow_hosts={"127.0.0.1"})
        got = {r["url"]: r
               for r in fetcher.revalidate(plan, round_ts(1)).collect()}
        s = got[f"{site.base}/same"]
        assert s["status"] == 304 and s["not_modified"] and s["html"] is None
        c = got[f"{site.base}/changed"]
        assert c["status"] == 200 and not c["not_modified"]
        assert c["html"] == new
        n = got[f"{site.base}/nohist"]
        assert n["status"] == 200 and not n["not_modified"]
        assert n["html"] == same
        # the wire saw exactly one request per URL; /same's carried the
        # current etag, /nohist's carried no validator at all
        by_path = {p: h for _t, p, h in site.requests}
        assert by_path["/same"]["If-None-Match"] == cur_etag
        assert "If-None-Match" not in by_path["/nohist"]
        assert "If-Modified-Since" not in by_path["/nohist"]
        assert len(site.requests) == 3
    finally:
        site.close()


def test_revalidate_if_modified_since_only(spark):
    """A capture with only Last-Modified revalidates via If-Modified-Since
    (no ETag stored — the validator the origin actually gave us)."""
    from context_crawler_spark.sources.cdx import conditional_fetch_plan

    body = b"<html><body>x</body></html>"
    site = _Site({"/p": body})
    try:
        captures = spark.createDataFrame(
            [(f"{site.base}/p", 1, None, "Mon, 01 Jan 2024 00:00:00 GMT")],
            "url string, ts long, etag string, last_modified string",
        )
        refetch = spark.createDataFrame(
            [(f"{site.base}/p", "127.0.0.1")], "url string, host string")
        plan = conditional_fetch_plan(refetch, captures)
        fetcher = HttpFetcher(CrawlConfig(entry=f"{site.base}/p"),
                              allow_hosts={"127.0.0.1"})
        (row,) = fetcher.revalidate(plan, round_ts(1)).collect()
        assert row["status"] == 304 and row["not_modified"]
        (_t, _p, hdrs), = site.requests
        assert hdrs["If-Modified-Since"] == "Mon, 01 Jan 2024 00:00:00 GMT"
        assert "If-None-Match" not in hdrs
    finally:
        site.close()


def test_robots_live_fetch_parse_and_ttl_cache(spark, tmp_path):
    """Live robots pipeline: one GET per distinct host, RFC 9309 outcome
    semantics (2xx parse / 404 unrestricted / 500 complete-disallow), and
    the 24h-style TTL cache — a host fetched this wave never re-hits the
    wire until its row ages out."""
    from datetime import datetime, timedelta

    from context_crawler_spark.functions.robots import (
        parse_robots_rules_df, split_robots_rules,
    )
    from context_crawler_spark.operators.fetch import refresh_robots_cache

    a = _Site({"/robots.txt":
               b"User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"})
    b = _Site({})                       # no robots.txt -> 404 (unavailable)
    c = _Site({"/robots.txt": b"__BOOM__"})   # 500 (unreachable)
    try:
        hosts = spark.createDataFrame(
            [(f"127.0.0.1:{a.port}",), (f"127.0.0.1:{b.port}",),
             (f"127.0.0.1:{c.port}",)], "host string")
        store = SnapshotStore(str(tmp_path / "robots_store"))
        fetcher = HttpFetcher(CrawlConfig(entry=f"{a.base}/"),
                              allow_hosts={"127.0.0.1"})
        t0 = datetime(2024, 1, 1, 12, 0, 0)
        cache = refresh_robots_cache(spark, store, fetcher, hosts, t0,
                                     ttl_s=3600, scheme="http")
        got = {r["host"]: r for r in cache.collect()}
        assert got[f"127.0.0.1:{a.port}"]["status"] == 200
        assert got[f"127.0.0.1:{b.port}"]["status"] == 404
        assert got[f"127.0.0.1:{c.port}"]["status"] == 500
        parsed = parse_robots_rules_df(cache)
        rules, delays = split_robots_rules(parsed)
        rrows = [(r["host"], r["rule_type"], r["path_prefix"])
                 for r in rules.collect()]
        assert (f"127.0.0.1:{a.port}", "disallow", "/private/") in rrows
        # 404 host: unrestricted, NO rows; 500 host: complete disallow
        assert not any(h == f"127.0.0.1:{b.port}" for h, _t, _p in rrows)
        assert (f"127.0.0.1:{c.port}", "disallow", "/") in rrows
        (drow,) = delays.collect()
        assert drow["host"] == f"127.0.0.1:{a.port}"
        assert drow["crawl_delay_s"] == 2.0
        assert a.paths_hit() == ["/robots.txt"]

        # within TTL: served from the store, zero wire traffic
        refresh_robots_cache(spark, store, fetcher, hosts,
                             t0 + timedelta(minutes=30),
                             ttl_s=3600, scheme="http").collect()
        assert a.paths_hit() == ["/robots.txt"]
        assert b.paths_hit() == ["/robots.txt"]

        # past TTL: every host refetched, cache row replaced
        cache3 = refresh_robots_cache(spark, store, fetcher, hosts,
                                      t0 + timedelta(hours=2),
                                      ttl_s=3600, scheme="http")
        assert a.paths_hit() == ["/robots.txt", "/robots.txt"]
        got3 = {r["host"]: r for r in cache3.collect()}
        assert got3[f"127.0.0.1:{a.port}"]["fetched_at"] \
            == t0 + timedelta(hours=2)
        assert cache3.count() == 3  # one row per host, replaced not appended
    finally:
        a.close(); b.close(); c.close()


def test_robots_oversized_body_truncated_and_parsed(spark, tmp_path):
    """RFC 9309 §2.5 (ADVICE r4): a 2xx robots.txt larger than the byte
    cap is truncated to the cap and the PREFIX parsed — not classified
    unreachable (which would synthetic-disallow-all the host)."""
    from datetime import datetime

    from context_crawler_spark.functions.robots import (
        parse_robots_rules_df, split_robots_rules,
    )
    from context_crawler_spark.operators.fetch import refresh_robots_cache

    body = (b"User-agent: *\nDisallow: /private/\n"
            + b"# padding comment line\n" * 2048)  # ~46 KiB >> 1 KiB cap
    site = _Site({"/robots.txt": body})
    try:
        hosts = spark.createDataFrame(
            [(f"127.0.0.1:{site.port}",)], "host string")
        store = SnapshotStore(str(tmp_path / "robots_big"))
        fetcher = HttpFetcher(CrawlConfig(entry=f"{site.base}/"),
                              allow_hosts={"127.0.0.1"}, max_bytes=1024)
        cache = refresh_robots_cache(
            spark, store, fetcher, hosts, datetime(2024, 1, 1),
            ttl_s=3600, scheme="http")
        (row,) = cache.collect()
        assert row["status"] == 200
        assert row["robots_text"].startswith("User-agent: *")
        assert len(row["robots_text"].encode()) <= 1024
        rules, _delays = split_robots_rules(parse_robots_rules_df(cache))
        rrows = [(r["rule_type"], r["path_prefix"]) for r in rules.collect()]
        assert ("disallow", "/private/") in rrows
        assert ("disallow", "/") not in rrows  # no synthetic disallow-all
    finally:
        site.close()


def test_live_crawl_with_wire_robots(spark, site0_rows, tmp_path):
    """End-to-end: robots rules come FROM THE WIRE (refresh_robots_cache
    -> parse -> split) and drive a live crawl — the disallowed subtree is
    never requested, the robots Crawl-delay feeds the scheduler's delay
    table, and robots.txt itself is fetched exactly once (TTL cache)."""
    from context_crawler_spark.functions.robots import (
        parse_robots_rules_df, split_robots_rules,
    )
    from context_crawler_spark.operators.fetch import refresh_robots_cache

    site = _Site({})
    try:
        rows = _rewrite(site0_rows, site.base)
        site.pages.update(_serve(rows, site.base))
        site.pages["/robots.txt"] = \
            b"User-agent: *\nDisallow: /guide\nCrawl-delay: 1\n"
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article", respect_robots=True)
        fetcher = HttpFetcher(cfg, allow_hosts={"127.0.0.1"})
        # wire fetch keys on host:port (the local server's address); the
        # scheduler's politeness host is the registered host — remap.
        wire_hosts = spark.createDataFrame(
            [(f"127.0.0.1:{site.port}",)], "host string")
        store = SnapshotStore(str(tmp_path / "rstore"))
        from datetime import datetime

        cache = refresh_robots_cache(
            spark, store, fetcher, wire_hosts,
            datetime(2024, 1, 1), ttl_s=86400, scheme="http")
        rules, delays = split_robots_rules(parse_robots_rules_df(cache))
        rules = rules.withColumn("host", F.lit("127.0.0.1"))
        delays = delays.withColumn("host", F.lit("127.0.0.1"))

        store2 = SnapshotStore(str(tmp_path / "crawl"))
        eng = CrawlScheduler(spark, store2, cfg, None, n_buckets=8,
                             fetcher=fetcher, host_delays=delays)
        eng.run(max_rounds=30, robots=rules)
        hit = site.paths_hit()
        assert hit.count("/robots.txt") == 1          # fetched once, cached
        assert not any(p.startswith("/guide") for p in hit)
        assert any(p.startswith("/docs") for p in hit)
        assert len(eng.visit_order()) > 5             # crawl actually ran
    finally:
        site.close()
