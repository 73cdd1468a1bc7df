"""Config validation, path sanitization, name generation, snapshot-store
mechanics (commit/rollback/tags/orphan GC), and multi-config aggregation."""

from __future__ import annotations

import json
import os

import pytest

from context_crawler_spark.config import (
    ConfigError,
    CrawlConfig,
    generate_name_from_url,
    generate_output_file_name,
    sanitize_output_path,
)
from context_crawler_spark.state import SnapshotStore


def test_config_validation_errors():
    with pytest.raises(ConfigError):
        CrawlConfig(entry="not-a-url")
    with pytest.raises(ConfigError):
        CrawlConfig(entry="https://a.test/", selector="")
    with pytest.raises(ConfigError):
        CrawlConfig(entry="https://a.test/", max_pages=0)
    with pytest.raises(ConfigError):
        CrawlConfig(entry="https://a.test/", politeness_budget=-1)


def test_config_roundtrip_and_exclude_expansion():
    cfg = CrawlConfig(
        entry="https://a.test/docs",
        match="https://a.test/docs/**",
        exclude=["https://a.test/docs/v1", "**/*.png"],
        selector="article",
    )
    # dir path expands to p ∪ p/** (reference src/core.ts:58-72)
    assert cfg.exclude_list == [
        "https://a.test/docs/v1", "https://a.test/docs/v1/**", "**/*.png",
    ]
    again = CrawlConfig.from_dict(cfg.to_dict())
    assert again.to_dict() == cfg.to_dict()
    assert cfg.in_scope("https://a.test/docs/guide")
    assert not cfg.in_scope("https://a.test/docs/v1/old")


def test_generate_name_from_url():
    """Parity shapes of generateNameFromUrl (reference src/schema.ts:122-146)."""
    assert generate_name_from_url("https://www.example.com/docs/x") == "example-com-docs"
    assert generate_name_from_url("https://zod.dev/") == "zod-dev"
    assert generate_name_from_url("https://api.example.co.uk/v2") == "api-example-co-uk-v2"
    assert generate_output_file_name("zod-dev") == "output/jobs/zod-dev.json"


def test_sanitize_output_path():
    """Reference src/core.ts:520-527: relatives confined under output/jobs,
    absolutes allowed."""
    assert sanitize_output_path("foo.json") == "output/jobs/foo.json"
    assert sanitize_output_path("../../etc/passwd") == "output/jobs/etc/passwd"
    assert sanitize_output_path("output/jobs/x.json") == "output/jobs/x.json"
    assert sanitize_output_path("/abs/path/x.json") == "/abs/path/x.json"
    assert sanitize_output_path("a/../b.json") == "output/jobs/b.json"


def test_snapshot_store_mechanics(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    df1 = spark.range(5).toDF("x")
    s0 = store.commit({"t": df1}, metadata={"round": 0}, tag="seed")
    assert s0.snapshot_id == 0 and store.head_id() == 0

    df2 = spark.range(10).toDF("x")
    s1 = store.commit({"t": df2, "u": df1}, metadata={"round": 1}, tag="round-1")
    assert s1.parent_id == 0
    assert store.read(spark, "t").count() == 10
    # time travel to the parent
    assert store.read(spark, "t", snapshot_id=0).count() == 5
    # carry-forward: u not rewritten in a later commit
    s2 = store.commit({"t": df1}, tag="round-2")
    assert store.read(spark, "u").count() == 5
    # tags and rollback
    assert store.find_tag("round-1").snapshot_id == 1
    store.rollback(1)
    assert store.read(spark, "t").count() == 10
    with pytest.raises(ValueError):
        store.rollback(99)

    # orphan GC only removes dirs unreachable from ANY manifest
    removed = store.expire_orphans()
    assert removed == 0  # everything is referenced by some snapshot
    # fabricate an orphan
    os.makedirs(os.path.join(str(tmp_path), "data", "t", "vzz-dead"))
    assert store.expire_orphans() == 1


def test_commit_crash_safety(spark, tmp_path):
    """A manifest written without the HEAD flip must be invisible (the
    commit point is the atomic HEAD rename)."""
    store = SnapshotStore(str(tmp_path))
    store.commit({"t": spark.range(3).toDF("x")})
    head_before = store.head_id()
    # simulate a crash mid-commit: orphan manifest, HEAD untouched
    with open(store._manifest_path(99), "w") as f:
        json.dump({"snapshot_id": 99, "tables": {}, "metadata": {}}, f)
    assert store.head_id() == head_before
    assert store.read(spark, "t").count() == 3


def test_aggregate_job_outputs(tmp_path):
    import pandas as pd

    from context_crawler_spark.operators.output import aggregate_job_outputs

    a = pd.DataFrame({
        "title": ["A1", "A0"], "url": ["u1", "u0"],
        "text": ["ta1", "ta0"], "round": [1, 1], "fetch_order": [1, 0],
    })
    b = pd.DataFrame({
        "title": ["B0"], "url": ["u2"], "text": ["tb0"],
        "round": [1], "fetch_order": [0],
    })
    paths = aggregate_job_outputs([a, b], str(tmp_path), "job")
    assert [p.rsplit("/", 1)[-1] for p in paths] == ["job.json"]
    rows = json.load(open(paths[0]))
    # config order first, then per-config visit order
    assert [r["title"] for r in rows] == ["A0", "A1", "B0"]


def test_fetch_layer_fields_accepted_and_roundtrip():
    """VERDICT r1 #7: a real reference job config carrying fetch-layer
    fields (cookie / resourceExclusions / waitForSelectorTimeout,
    reference src/schema.ts:80-96) must load, validate, and round-trip —
    accepted-and-ignored by the dataflow, never a TypeError."""
    import pytest as _pytest

    from context_crawler_spark.config import ConfigError, CrawlConfig

    ref_job = {  # shape of a reference configurations/jobs/*.ts default export
        "entry": "https://docs.example.test/start",
        "match": ["https://docs.example.test/**"],
        "exclude": ["**/changelog"],
        "selector": "article",
        "autoDiscoverNav": True,
        "discoverySelector": "nav, aside",
        "maxPagesToCrawl": "unlimited",
        "maxTokens": "unlimited",
        "maxFileSize": 5,
        "waitForSelectorTimeout": 3000,
        "resourceExclusions": ["png", "jpg", "woff2"],
        "cookie": {"name": "CookieConsent", "value": "accepted"},
    }
    cfg = CrawlConfig.from_dict(ref_job)
    assert cfg.max_pages is None and cfg.max_tokens is None
    assert cfg.max_file_size_mb == 5
    assert cfg.wait_for_selector_timeout == 3000
    assert cfg.resource_exclusions == ["png", "jpg", "woff2"]
    assert cfg.cookie == {"name": "CookieConsent", "value": "accepted"}
    rt = CrawlConfig.from_dict(cfg.to_dict())
    assert rt.cookie == cfg.cookie
    assert rt.resource_exclusions == cfg.resource_exclusions
    assert rt.wait_for_selector_timeout == cfg.wait_for_selector_timeout

    # cookie list form + validation parity
    CrawlConfig.from_dict({**ref_job, "cookie": [
        {"name": "a", "value": "1"}, {"name": "b", "value": "2"}]})
    with _pytest.raises(ConfigError):
        CrawlConfig.from_dict({**ref_job, "cookie": {"name": "x"}})
    with _pytest.raises(ConfigError):
        CrawlConfig.from_dict({**ref_job, "waitForSelectorTimeout": -1})
    with _pytest.raises(ConfigError):
        CrawlConfig.from_dict({**ref_job, "resourceExclusions": "png"})
