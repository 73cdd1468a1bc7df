"""Render-seam conformance family (VERDICT r4 #7).

The reference renders every page in a real browser and WAITS for the
configured selector before extracting (src/core.ts:133-148 waitForXPath /
waitForSelector with ``waitForSelectorTimeout``, default 5000 ms); a wait
that times out THROWS, Crawlee retries the request (maxRequestRetries: 2,
src/core.ts:216), and a page whose selector never appears ends as a failed
request — never emitted. The hook (onVisitPage, src/core.ts:197-199) runs
on the RENDERED page.

Our engine's browser is a seam: ``HttpFetcher(render=...)`` where
``render(url, body) -> bytes`` settles the DOM (doing any selector wait
internally) and RAISES on selector timeout. This file is the conformance
suite a future browser-pool adapter (e.g. one Playwright page pool per
executor) must pass, exercised today with a scripted fake:

  * late-injected selector content within the timeout → success on the
    FIRST attempt, rendered text + renderer-injected links crawled
  * selector never appears → raise per attempt → engine retry/backoff →
    failed row, page never emitted (reference: throw → retries → failed)
  * flaky SPA (timeout once, settle on the retry) → emitted exactly once,
    via the retry machinery, with the rendered text
  * onVisitPage hook observes the RENDERED text, not the static shell
"""

from __future__ import annotations

import os
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.operators.fetch import HttpFetcher
from context_crawler_spark.plans.scheduler import CrawlScheduler
from context_crawler_spark.state import SnapshotStore

from .test_fetch import _Site, _fake_renderer, _spa_page


class SelectorTimeout(RuntimeError):
    """What a conforming adapter raises when the selector wait expires
    (the page.waitForSelector TimeoutError analog)."""


class ScriptedRenderer:
    """A fake browser-pool adapter: per-URL-path script of attempt
    outcomes. ``"settle"`` executes the page's JSON payload (the
    late-injected-content success path — the wait returned within the
    timeout); ``"timeout"`` raises SelectorTimeout (the wait expired).
    Unscripted paths settle immediately. Attempt counters live in files
    under ``state_dir`` so they survive the executor round-trip (the
    instance is pickled into each fetch task) and are visible to test
    assertions."""

    def __init__(self, state_dir: str, scripts: dict[str, list[str]]):
        self.state_dir = state_dir
        self.scripts = scripts

    def _file(self, path: str) -> str:
        return os.path.join(
            self.state_dir, path.strip("/").replace("/", "_") or "_root")

    def attempts(self, path: str) -> int:
        try:
            with open(self._file(path)) as fh:
                return int(fh.read() or 0)
        except FileNotFoundError:
            return 0

    def __call__(self, url: str, body: bytes) -> bytes:
        path = urlsplit(url).path
        steps = self.scripts.get(path)
        if steps is not None:
            n = self.attempts(path)
            f = self._file(path)
            with open(f, "w") as fh:
                fh.write(str(n + 1))
            step = steps[min(n, len(steps) - 1)]
            if step == "timeout":
                raise SelectorTimeout(f"selector wait expired for {url}")
        return _fake_renderer(url, body)


def _run(spark, tmp_path, tag, web, renderer, hook=None, hook_schema=None):
    site = _Site(web)
    try:
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article", auto_discover_nav=False,
                          wait_for_selector_timeout=1000)
        eng = CrawlScheduler(
            spark, SnapshotStore(str(tmp_path / tag)), cfg, None,
            n_buckets=4, frontier_buckets=4,
            fetcher=HttpFetcher(cfg, allow_hosts={"127.0.0.1"},
                                render=renderer),
            visit_hook=hook, hook_schema=hook_schema)
        eng.run(max_rounds=40)
        return eng, site.base
    finally:
        site.close()


def test_late_injected_selector_succeeds_first_attempt(spark, tmp_path):
    """Selector content injected by script but WITHIN the wait timeout:
    one attempt, rendered text emitted, injected links crawled."""
    sdir = str(tmp_path / "att1")
    os.makedirs(sdir)
    web = {"/": _spa_page("late but fine", ["/leaf"]),
           "/leaf": _spa_page("leaf rendered", [])}
    r = ScriptedRenderer(sdir, {"/": ["settle"], "/leaf": ["settle"]})
    eng, base = _run(spark, tmp_path, "late", web, r)
    texts = {row["url"]: row["text"] for row in eng.pages_out().collect()}
    assert texts[f"{base}/"].startswith("late but fine")
    assert texts[f"{base}/leaf"] == "leaf rendered"
    assert r.attempts("/") == 1 and r.attempts("/leaf") == 1
    assert eng.done_frontier().filter("status = 'failed'").count() == 0


def test_selector_timeout_exhausts_retries_never_emits(spark, tmp_path):
    """Selector never appears: every attempt raises; the page must ride
    retry/backoff to exhaustion, end FAILED, and never reach the dataset
    (reference: waitForSelector throw → maxRequestRetries → failed)."""
    sdir = str(tmp_path / "att2")
    os.makedirs(sdir)
    web = {"/": _spa_page("home ok", ["/dead"]),
           "/dead": _spa_page("never shown", [])}
    r = ScriptedRenderer(sdir, {"/dead": ["timeout"]})
    eng, base = _run(spark, tmp_path, "dead", web, r)
    emitted = {row["url"] for row in eng.pages_out().collect()}
    assert f"{base}/dead" not in emitted and f"{base}/" in emitted
    (fail,) = eng.done_frontier().filter("status = 'failed'").collect()
    assert fail["url"] == f"{base}/dead"
    assert fail["error"] == "fetch_miss"
    # retried: more than one render attempt reached the page
    assert r.attempts("/dead") >= 2


def test_flaky_spa_settles_on_retry(spark, tmp_path):
    """Timeout on attempt 1, settle on attempt 2: the retry machinery must
    deliver the page exactly once, with the RENDERED text (reference:
    Crawlee re-enqueues the thrown request; success on retry emits)."""
    sdir = str(tmp_path / "att3")
    os.makedirs(sdir)
    web = {"/": _spa_page("home ok", ["/flaky"]),
           "/flaky": _spa_page("settled on retry", [])}
    r = ScriptedRenderer(sdir, {"/flaky": ["timeout", "settle"]})
    eng, base = _run(spark, tmp_path, "flaky", web, r)
    rows = [row for row in eng.pages_out().collect()
            if row["url"] == f"{base}/flaky"]
    assert len(rows) == 1 and rows[0]["text"] == "settled on retry"
    assert r.attempts("/flaky") == 2
    done = {row["url"]: row["status"]
            for row in eng.done_frontier().collect()}
    assert done[f"{base}/flaky"] == "completed"


def test_hook_sees_rendered_dom_not_static_shell(spark, tmp_path):
    """onVisitPage runs on the RENDERED page (reference src/core.ts:197-199
    executes the hook against the live browser page after the selector
    wait): the hook's view of text must be the renderer's output — the
    static shell's empty article must never leak into hook rows."""
    sdir = str(tmp_path / "att4")
    os.makedirs(sdir)
    web = {"/": _spa_page("rendered home", ["/a"]),
           "/a": _spa_page("rendered a", [])}

    def hook(row):
        return [{"url": row["url"], "seen": row["text"],
                 "title": row["title"]}]

    r = ScriptedRenderer(sdir, {})
    eng, base = _run(spark, tmp_path, "hook", web, r, hook=hook,
                     hook_schema="url string, seen string, title string")
    seen = {row["url"]: row["seen"] for row in eng.hook_out().collect()}
    assert seen[f"{base}/"].startswith("rendered home")
    assert seen[f"{base}/a"] == "rendered a"
    assert all(s != "" for s in seen.values())
    # and the hook never produced rows for pages that were not emitted
    assert set(seen) == {row["url"] for row in eng.pages_out().collect()}


def test_static_fetch_of_spa_shell_stays_empty(spark, tmp_path):
    """Control: the SAME site without the renderer yields the empty shell
    (no links discovered, empty selector text) — pinning that the fixtures
    above genuinely exercise the seam, not static parsing."""
    site = _Site({"/": _spa_page("invisible", ["/a"]),
                  "/a": _spa_page("invisible a", [])})
    try:
        cfg = CrawlConfig(entry=f"{site.base}/", match=[f"{site.base}/**"],
                          selector="article", auto_discover_nav=False)
        eng = CrawlScheduler(
            spark, SnapshotStore(str(tmp_path / "static")), cfg, None,
            n_buckets=4, frontier_buckets=4,
            fetcher=HttpFetcher(cfg, allow_hosts={"127.0.0.1"}))
        eng.run(max_rounds=10)
        (row,) = eng.pages_out().collect()
        assert row["url"] == f"{site.base}/" and row["text"] == ""
        assert eng.url_seen().count() == 1
    finally:
        site.close()
