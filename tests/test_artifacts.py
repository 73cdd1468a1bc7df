"""End-to-end LLM-artifact stage: crawl → llms.txt/chunks/embeddings →
top-k search, plus the staleness fast path (reference src/llm-service.ts)."""

from __future__ import annotations

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.plans.artifacts import ArtifactService
from context_crawler_spark.plans.scheduler import CrawlScheduler
from context_crawler_spark.state import SnapshotStore


def _crawled(spark, tiny_pages, tmp_path):
    config = CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**"],
        selector="article",
    )
    store = SnapshotStore(str(tmp_path / "store"))
    eng = CrawlScheduler(spark, store, config, tiny_pages, n_buckets=8)
    eng.run(max_rounds=30)
    return eng, store


def test_artifacts_and_search(spark, tiny_pages, tiny_web, tmp_path):
    eng, store = _crawled(spark, tiny_pages, tmp_path)
    svc = ArtifactService(spark, store, chunk_size=400, chunk_overlap=40)
    src_id = store.head_id()
    assert svc.generate(eng.pages_out(), src_id) is True

    # llms.txt: blocks in visit order with the reference framing
    txt = svc.llms_txt_for(eng.config.name)
    assert txt.startswith("---\nTitle: ")
    first_url = eng.visit_order()[0]
    assert f"URL: {first_url}\n---\n" in txt
    assert txt.count("---\nTitle:") == len(eng.visit_order())

    # chunks respect the configured size (UTF-16 length ≤ chunk_size)
    chunks = store.read(spark, "chunks")
    assert chunks.count() >= eng.pages_out().count()
    from pyspark.sql import functions as F

    assert chunks.filter(F.length("chunk") > 400).count() == 0

    # embeddings are unit vectors
    emb = store.read(spark, "embeddings")
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    bad = emb.filter(F.abs(norm - 1.0) > 1e-3).count()
    assert bad == 0

    # search returns chunks containing query vocabulary
    hits = svc.search(eng.config.name, "guide page", k=5)
    assert 1 <= len(hits) <= 5
    assert all("score" in h and "chunk" in h for h in hits)
    formatted = svc.format_results(hits)
    assert formatted.startswith("--- Result 1 ---")

    # staleness: same source snapshot + params → skip
    assert svc.generate(eng.pages_out(), src_id) is False
    # param drift → regenerate
    svc2 = ArtifactService(spark, store, chunk_size=300, chunk_overlap=40)
    assert svc2.is_stale(src_id) is True


def test_artifacts_commit_preserves_crawl_metadata(spark, tiny_pages,
                                                   tmp_path):
    """The artifacts commit becomes HEAD; it must EXTEND the crawl metadata,
    not replace it — a resume (run()/run_round on the same store) reads
    HEAD's metadata and crashed with KeyError 'round' when the artifacts
    snapshot carried only {'artifacts': ...} (r5 verify regression)."""
    eng, store = _crawled(spark, tiny_pages, tmp_path)
    meta_before = dict(store.snapshot().metadata)
    svc = ArtifactService(spark, store, chunk_size=400, chunk_overlap=40)
    assert svc.generate(eng.pages_out(), store.head_id()) is True

    head_meta = store.snapshot().metadata
    for key in ("round", "next_seq", "fetched_total", "finished", "bloom"):
        assert head_meta.get(key) == meta_before.get(key), key
    assert "artifacts" in head_meta

    # and the actual resume path: run() on the same store is a no-op on a
    # finished crawl, not a crash
    eng2 = CrawlScheduler(spark, store, eng.config, tiny_pages, n_buckets=8)
    meta = eng2.run(max_rounds=5)
    assert meta.get("finished") is True


def test_chunker_respects_reference_defaults(spark):
    """Chunk framing parity: 'Title: {t}\\nURL: {u}\\n\\n{text}'
    (src/llm-service.ts:135-144)."""
    from context_crawler_spark.plans.artifacts import build_chunks

    df = spark.createDataFrame(
        [("j", "https://a.test/x", 0, 1, 0, "T", "body text " * 5)],
        "job string, url string, seq long, round int, fetch_order long,"
        " title string, text string",
    )
    rows = build_chunks(df).collect()
    assert rows[0]["chunk"].startswith("Title: T\nURL: https://a.test/x")
    assert rows[0]["chunk_ix"] == 0
