"""Visit-hook (onVisitPage/pushData analog) and sitemap-seed expansion."""

from __future__ import annotations

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.plans.scheduler import CrawlScheduler
from context_crawler_spark.state import SnapshotStore

from .oracle import run_oracle


def test_visit_hook_pushes_extra_rows(spark, tiny_pages, tmp_path):
    """Hook receives each visited page and may emit extra rows into
    hook_out (reference pushData, src/core.ts:197-199)."""

    def hook(row):
        out = [{"url": row["url"], "kind": "seen", "n": len(row["text"] or "")}]
        if row["url"] == "https://site0.test/":
            out.append({"url": row["url"], "kind": "root", "n": 0})
        return out

    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/docs/**"],
        selector="article",
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(
        spark, store, config, tiny_pages, n_buckets=8,
        visit_hook=hook, hook_schema="url string, kind string, n int",
    )
    eng.run(max_rounds=20)
    hooks = eng.hook_out()
    rows = hooks.collect()
    visited = set(eng.visit_order())
    assert {r["url"] for r in rows} == visited
    assert sum(1 for r in rows if r["kind"] == "root") == 1
    assert sum(1 for r in rows if r["kind"] == "seen") == len(visited)


def test_sitemap_seed_expansion_engine_and_oracle(spark, tmp_path):
    """A seed matching /sitemap.*\\.xml$/ expands to its <loc> URLs in
    document order, scope-filtered (reference src/core.ts:335-352)."""
    from datetime import timedelta

    from context_crawler_spark.sources.synthetic_web import EPOCH

    web = {
        "https://s.test/sitemap-0.xml": (
            "<urlset>"
            "<loc>https://s.test/docs/a</loc>"
            "<loc>https://s.test/docs/b</loc>"
            "<loc>https://s.test/private/x</loc>"  # excluded by globs
            "<loc>https://other.test/docs/c</loc>"  # out of scope
            "</urlset>"
        ),
        "https://s.test/docs/a": "<html><head><title>A</title></head><body>"
                                 "<article><p>alpha</p></article></body></html>",
        "https://s.test/docs/b": "<html><head><title>B</title></head><body>"
                                 '<article><p>beta <a href="https://s.test/docs/a">a</a>'
                                 "</p></article></body></html>",
    }
    cfg = CrawlConfig(
        entry="https://s.test/sitemap-0.xml",
        match=["https://s.test/docs/**"],
        selector="article",
        auto_discover_nav=False,
    )
    rows = [
        (u, EPOCH + timedelta(seconds=i), h.encode(), "", "en")
        for i, (u, h) in enumerate(web.items())
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, cfg, pages, n_buckets=4)
    eng.run(max_rounds=20)
    oracle = run_oracle(cfg, web)
    # sitemap itself is replaced by its expansion; a and b visited in order
    assert oracle.visit_order == ["https://s.test/docs/a", "https://s.test/docs/b"]
    assert eng.visit_order() == oracle.visit_order


def test_sitemapindex_nested_expansion(spark, tmp_path):
    """A <sitemapindex> seed (the standard large-site layout) expands
    through its child sitemaps depth-first in document order, cycle-
    guarded and depth-capped — engine == oracle."""
    from datetime import timedelta

    from context_crawler_spark.sources.synthetic_web import EPOCH

    web = {
        "https://s.test/sitemap.xml": (
            "<sitemapindex>"
            "<sitemap><loc>https://s.test/sitemap-a.xml</loc></sitemap>"
            "<sitemap><loc>https://s.test/sitemap-b.xml</loc></sitemap>"
            "<sitemap><loc>https://s.test/sitemap.xml</loc></sitemap>"  # cycle
            "</sitemapindex>"
        ),
        "https://s.test/sitemap-a.xml": (
            "<urlset><loc>https://s.test/docs/a1</loc>"
            "<loc>https://s.test/docs/a2</loc></urlset>"
        ),
        "https://s.test/sitemap-b.xml": (
            "<urlset><loc>https://s.test/docs/b1</loc></urlset>"
        ),
        "https://s.test/docs/a1": "<html><body><article>a1</article></body></html>",
        "https://s.test/docs/a2": "<html><body><article>a2</article></body></html>",
        "https://s.test/docs/b1": "<html><body><article>b1</article></body></html>",
    }
    cfg = CrawlConfig(
        entry="https://s.test/sitemap.xml",
        match=["https://s.test/docs/**"],
        selector="article",
        auto_discover_nav=False,
    )
    rows = [
        (u, EPOCH + timedelta(seconds=i), h.encode(), "", "en")
        for i, (u, h) in enumerate(web.items())
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, cfg, pages, n_buckets=4)
    eng.run(max_rounds=20)
    oracle = run_oracle(cfg, web)
    want = ["https://s.test/docs/a1", "https://s.test/docs/a2",
            "https://s.test/docs/b1"]
    assert oracle.visit_order == want
    assert eng.visit_order() == want


def test_expand_sitemap_seeds_depth_cap():
    """Index-of-index chains stop at max_depth; the over-deep sitemap URL
    degrades to a plain (scope-filtered) seed rather than recursing."""
    from context_crawler_spark.functions.extract import expand_sitemap_seeds

    web = {
        "https://s.test/sm0.xml": "<loc>https://s.test/sm1.xml</loc>",
        "https://s.test/sm1.xml": "<loc>https://s.test/sm2.xml</loc>",
        "https://s.test/sm2.xml": "<loc>https://s.test/sm3.xml</loc>",
        "https://s.test/sm3.xml": "<loc>https://s.test/page</loc>",
    }
    out = expand_sitemap_seeds(
        ["https://s.test/sm0.xml"],
        fetch=lambda u: web.get(u, ""),
        in_scope=lambda u: not u.endswith(".xml"),
        is_sitemap=lambda u: u.endswith(".xml"),
        max_depth=3,
    )
    assert out == []  # sm3 hit the cap, is .xml, and is scope-filtered out
    out2 = expand_sitemap_seeds(
        ["https://s.test/sm2.xml"],
        fetch=lambda u: web.get(u, ""),
        in_scope=lambda u: True,
        is_sitemap=lambda u: u.endswith(".xml"),
        max_depth=3,
    )
    assert out2 == ["https://s.test/page"]


def test_sitemap_expansion_is_level_batched():
    """VERDICT r3 #9: a nested sitemap tree of many files costs O(depth)
    bulk fetches (one fetch_many per level), not O(files) — with the
    flattened order still the sequential depth-first reader's."""
    from context_crawler_spark.functions.extract import expand_sitemap_seeds

    n_children = 40
    web = {
        "https://s.test/index.xml": "".join(
            f"<loc>https://s.test/sm{i}.xml</loc>" for i in range(n_children)
        ),
    }
    for i in range(n_children):
        web[f"https://s.test/sm{i}.xml"] = (
            f"<loc>https://s.test/p{i}a</loc><loc>https://s.test/p{i}b</loc>"
        )
    calls: list[list[str]] = []

    def fetch_many(urls):
        calls.append(list(urls))
        return {u: web[u] for u in urls if u in web}

    out = expand_sitemap_seeds(
        ["https://s.test/index.xml"],
        in_scope=lambda u: True,
        is_sitemap=lambda u: u.endswith(".xml"),
        fetch_many=fetch_many,
    )
    want = [f"https://s.test/p{i}{s}" for i in range(n_children)
            for s in ("a", "b")]
    assert out == want
    # 41 sitemap files, exactly 2 bulk fetches (index level + leaf level)
    assert len(calls) == 2
    assert calls[0] == ["https://s.test/index.xml"]
    assert len(calls[1]) == n_children


def test_seed_time_spark_job_count_is_per_level(spark, tmp_path):
    """The scheduler wires fetch_many to ONE pages-table join per level:
    seeding over a 2-level tree of 21 sitemap files does 2 bulk lookups,
    not 21 single-url Spark jobs."""
    from datetime import timedelta

    from context_crawler_spark.sources.synthetic_web import EPOCH

    n_sm = 20
    web = {
        "https://s.test/sitemap.xml": "".join(
            f"<loc>https://s.test/sitemap-{i}.xml</loc>" for i in range(n_sm)
        ),
    }
    for i in range(n_sm):
        web[f"https://s.test/sitemap-{i}.xml"] = f"<loc>https://s.test/docs/p{i}</loc>"
    for i in range(n_sm):
        web[f"https://s.test/docs/p{i}"] = (
            "<html><body><article>x</article></body></html>")
    cfg = CrawlConfig(
        entry="https://s.test/sitemap.xml",
        match=["https://s.test/docs/**"],
        selector="article",
        auto_discover_nav=False,
    )
    rows = [
        (u, EPOCH + timedelta(seconds=i), h.encode(), "", "en")
        for i, (u, h) in enumerate(web.items())
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    store = SnapshotStore(str(tmp_path / "s"))
    eng = CrawlScheduler(spark, store, cfg, pages, n_buckets=4)
    calls = []
    orig = eng._lookup_pages_html
    eng._lookup_pages_html = lambda urls: (calls.append(list(urls)),
                                           orig(urls))[1]
    eng.seed()
    assert len(calls) == 2, [len(c) for c in calls]
    assert len(calls[1]) == n_sm
    want = [f"https://s.test/docs/p{i}" for i in range(n_sm)]
    assert [r["url"] for r in eng.live_frontier().orderBy("seq").collect()] \
        == want


def test_batched_visit_hook_matches_row_hook(spark):
    """apply_visit_hook_batched (r6 vectorized escape hatch) emits the
    same extra-row table as the row-at-a-time form for an equivalent
    hook — same output contract, no per-row Python."""
    import pandas as pd

    from context_crawler_spark.operators.hooks import (
        apply_visit_hook, apply_visit_hook_batched)

    pages = spark.createDataFrame(
        [(f"https://h.test/p{i}", f"text {'x' * (i % 7)}") for i in range(50)],
        "url string, text string",
    )
    schema = "url string, n int"

    def row_hook(row):
        if len(row["text"]) % 2 == 0:
            return [{"url": row["url"], "n": len(row["text"])}]
        return []

    def batch_hook(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["text"].str.len()
        keep = (n % 2) == 0
        return pd.DataFrame(
            {"url": pdf["url"][keep], "n": n[keep].astype("int32")})

    a = sorted(map(tuple, apply_visit_hook(pages, row_hook, schema).collect()))
    b = sorted(map(tuple,
                   apply_visit_hook_batched(pages, batch_hook, schema)
                   .collect()))
    assert a == b and len(a) > 0
