"""Output-split parity tests (reference src/core.ts:360-477): the pinned
flush-reset state machine including the halving rule, the oversize-drop
quirk, the byte-flush-without-token-reset quirk, and file naming."""

from __future__ import annotations

import json

from context_crawler_spark.operators.output import (
    assign_file_ids_exact,
    assign_buckets_scalable,
    content_string,
    finalize_file_names,
    split_plan,
    write_job_json,
)


def test_split_plan_basic_token_budget():
    """budget 100, 40-token items: 40+40=80; +40 → flush; the halving rule
    restarts the estimate at floor(40/2)=20, so file2 then fits THREE items
    (20+40=60, 60+40=100 ≤ 100) — not the naive two."""
    items = [(40, 10)] * 5
    assert split_plan(items, 100, None) == [1, 1, 2, 2, 2]


def test_split_plan_halving_rule():
    """After a flush triggered by an item, estimatedTokens restarts at
    floor(tok/2) (reference src/core.ts:434) — so a 90-token item followed
    by 50-token items packs differently than a naive reset-to-tok."""
    # 90 → file1 (est 90); +50 > 100 → flush, est = 25, file2 gets 50;
    # +50 = 75 ≤ 100 → file2; +50 = 125 > 100 → flush, est 25, file3
    assert split_plan([(90, 1), (50, 1), (50, 1), (50, 1)], 100, None) == [1, 2, 2, 3]


def test_split_plan_oversize_item_dropped_but_bytes_count():
    """An item alone exceeding maxTokens is silently dropped
    (isWithinTokenLimit → false) yet its bytes still accrue."""
    items = [(10, 50), (500, 201), (10, 50)]
    # max_bytes 250: the dropped item's bytes push 50+201 > 250 → flush
    # right after it, so item3 lands in file 2
    assert split_plan(items, 100, 250) == [1, -1, 2]


def test_split_plan_byte_flush_does_not_reset_tokens():
    """A byte-triggered flush leaves estimatedTokens untouched (reference
    quirk: writeBatchToFile resets size/results only)."""
    # tokens: 60 then 60 — without reset, second triggers token-flush too
    out = split_plan([(60, 300), (60, 10)], 100, 250)
    # item1 → file1; bytes 300 > 250 → flush (counter→2); item2: est 60+60
    # > 100 → token flush of EMPTY batch (no counter bump since empty),
    # halving → est 30, item2 → file2
    assert out == [1, 2]


def test_finalize_names_single_vs_multi():
    assert finalize_file_names([1, 1, 1], "job") == {1: "job.json"}
    assert finalize_file_names([1, 2], "job") == {1: "job-1.json", 2: "job-2.json"}


def test_content_string_matches_js_stringify():
    s = content_string("T", "https://a.test/x", "line1\nline2 é")
    assert s == '{"title":"T","url":"https://a.test/x","html":"line1\\nline2 é"}'
    assert json.loads(s) == {"title": "T", "url": "https://a.test/x",
                             "html": "line1\nline2 é"}


def test_write_job_json_golden(tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "title": [f"T{i}" for i in range(6)],
            "url": [f"https://a.test/{i}" for i in range(6)],
            "text": ["word " * 50 for _ in range(6)],
            "round": [1] * 6,
            "fetch_order": list(range(6)),
        }
    )
    paths = write_job_json(pdf, str(tmp_path), "job", max_tokens=150)
    names = sorted(p.rsplit("/", 1)[-1] for p in paths)
    assert len(names) > 1 and names[0] == "job-1.json"
    total = 0
    for p in paths:
        rows = json.load(open(p))
        assert all(set(r) == {"title", "url", "html"} for r in rows)
        total += len(rows)
    assert total == 6


def test_assign_file_ids_exact_spark_matches_pure(spark):
    rows = [
        ("j", f"T{i}", f"https://a.test/{i}", "tok " * (20 * (i % 3 + 1)), 1, i)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "job string, title string, url string, text string, round int,"
        " fetch_order long"
    )
    out = {
        r["url"]: r["file_id"]
        for r in assign_file_ids_exact(df, max_tokens=120, max_bytes_mb=None).collect()
    }
    from context_crawler_spark.functions.tokens import count_tokens

    sizes = [
        (count_tokens(content_string(t, u, x)), len(content_string(t, u, x).encode()))
        for (_, t, u, x, _, _) in rows
    ]
    expected = split_plan(sizes, 120, None)
    assert [out[f"https://a.test/{i}"] for i in range(20)] == expected


def test_scalable_buckets_monotone(spark):
    df = spark.createDataFrame(
        [("j", 1, i, 30) for i in range(50)],
        "job string, round int, fetch_order long, n_tokens int",
    )
    out = assign_buckets_scalable(df, max_tokens=100).orderBy("fetch_order").collect()
    buckets = [r["bucket"] for r in out]
    assert buckets == sorted(buckets)
    assert buckets[0] == 0 and buckets[-1] == (30 * 49) // 100


def test_finalize_names_empty_byte_flush_parity():
    """ADVICE r1 edge: a byte-triggered flush of an empty batch (all items
    token-dropped) advances fileCounter — the reference then writes an
    empty '-1.json', and any later batch gets '-2.json'; the plain name is
    used ONLY when no flush ever happened (final counter == 1)."""
    from context_crawler_spark.operators.output import split_plan_full

    # two oversize items (token-dropped) whose bytes trip the byte budget
    assignment, counter = split_plan_full([(500, 300), (500, 300)], 100, 250)
    assert assignment == [-1, -1] and counter == 3
    names = finalize_file_names(assignment, "job", counter)
    assert names == {1: "job-1.json", 2: "job-2.json"}  # both empty, no final

    # dropped-then-kept: flush file 1 is empty, final batch non-empty → -2
    assignment, counter = split_plan_full([(500, 300), (50, 10)], 100, 250)
    assert assignment == [-1, 2] and counter == 2
    assert finalize_file_names(assignment, "job", counter) == {
        1: "job-1.json", 2: "job-2.json"}

    # no flush at all → plain name
    assignment, counter = split_plan_full([(50, 10), (20, 10)], 100, None)
    assert counter == 1
    assert finalize_file_names(assignment, "job", counter) == {1: "job.json"}


def test_write_job_json_emits_empty_flush_files(tmp_path):
    """End-to-end naming parity: an oversize token-dropped item whose bytes
    trip the 1 MB budget produces an EMPTY job-1.json; the following kept
    item lands in job-2.json (never a plain-named single file)."""
    import json as _json
    import os

    import pandas as pd

    from context_crawler_spark.operators.output import write_job_json

    big = "x" * (1_100_000)  # content bytes > 1 MB → byte flush
    pdf = pd.DataFrame({
        "title": ["T1", "T2"], "url": ["u1", "u2"], "text": [big, "short"],
        "round": [1, 1], "fetch_order": [0, 1],
    })
    paths = write_job_json(pdf, str(tmp_path), "job", max_tokens=1000,
                           max_bytes_mb=1)
    assert sorted(os.path.basename(p) for p in paths) == [
        "job-1.json", "job-2.json"]
    by_name = {os.path.basename(p): p for p in paths}
    with open(by_name["job-1.json"]) as f:
        assert _json.load(f) == []  # the empty byte-flush file
    with open(by_name["job-2.json"]) as f:
        rows = _json.load(f)
    assert [r["url"] for r in rows] == ["u2"]
