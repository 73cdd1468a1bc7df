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


REF_JOBS_DIR = "/root/reference/output/jobs"


@pytest.mark.parametrize("job_file", [
    "zod.json", "prisma.json", "react-19.json", "trpc.json",
    "ai-sdk.json", "next-js-16.json", "polar-sh.json",
])
def test_reference_corpus_roundtrip_byte_identical(tmp_path, job_file):
    """VERDICT r1 #5: the cheapest available format-parity proof — parse the
    reference's actual shipped job output, run it back through
    content_string + split_plan + write_job_json, and require byte-identical
    re-emission (incl. the single-file plain-naming rule,
    reference src/core.ts:394-395,459-474)."""
    import json as _json
    import os

    import pandas as pd

    from context_crawler_spark.operators.output import write_job_json

    src = os.path.join(REF_JOBS_DIR, job_file)
    if not os.path.exists(src):
        pytest.skip("reference corpus not present")
    with open(src, "rb") as f:
        raw = f.read()
    rows = _json.loads(raw)
    pdf = pd.DataFrame({
        "title": [r["title"] for r in rows],
        "url": [r["url"] for r in rows],
        "text": [r["html"] for r in rows],
        "round": [1] * len(rows),
        "fetch_order": list(range(len(rows))),
    })
    base = job_file[:-len(".json")]
    # the reference's shipped artifacts are single files → whatever budget
    # produced them did not split; an unlimited budget must reproduce that
    paths = write_job_json(pdf, str(tmp_path), base,
                           max_tokens=None, max_bytes_mb=None)
    assert [os.path.basename(p) for p in paths] == [job_file]
    with open(paths[0], "rb") as f:
        out = f.read()
    assert out == raw
