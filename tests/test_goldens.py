"""Frozen golden crawls (reference-style checked-in outputs, SURVEY.md §5).

The engine↔oracle parity suite proves the two implementations agree, but
both could drift TOGETHER if the pinned semantics were accidentally
changed. These goldens (tests/goldens/golden_crawls.json, generated once
from the oracle and checked in) anchor the semantics themselves: visit
order, seen-set hash, and byte-exact extraction hashes per URL.

If a deliberate semantic change is made, regenerate via the snippet in the
file's git history and document why in the commit.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.sources.synthetic_web import generate_pages

from .oracle import run_oracle

GOLDENS = json.load(
    open(os.path.join(os.path.dirname(__file__), "goldens", "golden_crawls.json"))
)

SCENARIOS = {
    "basic_bfs": CrawlConfig(
        entry="https://site0.test/", match=["https://site0.test/**"],
        exclude=["https://site0.test/support", "**/blog"], selector="article"),
    "polite_capped": CrawlConfig(
        entry="https://site0.test/",
        match=["https://site0.test/**", "https://site1.test/**",
               "https://site2.test/**"],
        selector="article", politeness_budget=3, max_pages=40),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_oracle_matches_frozen_golden(name):
    rows = generate_pages(seed=42, n_hosts=3, pages_per_section=4)
    web = {r["url"]: r["html"].decode() for r in rows}
    res = run_oracle(SCENARIOS[name], web)
    g = GOLDENS[name]
    assert res.visit_order == g["visit_order"]
    assert res.rounds == g["rounds"]
    assert hashlib.sha256(
        "\n".join(sorted(res.seen)).encode()).hexdigest() == g["seen_sha256"]
    got = {u: hashlib.sha256(t.encode()).hexdigest()
           for u, t in sorted(res.extracted.items())}
    assert got == g["extracted_sha256"]
