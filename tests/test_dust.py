"""DUST parameter-rule mining (operators/dust.py): instance detection,
support thresholding, degenerate-group pruning, and the broadcast
rule-application rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from context_crawler_spark.operators.dust import apply_dust_rules, dust_rules

PAGES = [
    # site0: sid irrelevant, evidenced in two digest groups
    ("https://s0.test/a?x=1", "d1"),
    ("https://s0.test/a?sid=111&x=1", "d1"),
    ("https://s0.test/b", "d2"),
    ("https://s0.test/b?sid=222", "d2"),
    # same digest, TWO extra params -> not an instance
    ("https://s0.test/c?x=1", "d3"),
    ("https://s0.test/c?x=1&y=2&z=3", "d3"),
    # one-group coincidence -> below min_support
    ("https://s1.test/a", "d4"),
    ("https://s1.test/a?ref=home", "d4"),
    # different digests -> no pair at all
    ("https://s0.test/d?sid=5", "d5"),
    ("https://s0.test/d", "d6"),
]


def _pages(spark, rows=PAGES):
    return spark.createDataFrame(rows, "url string, digest string")


def test_dust_rules_mining(spark):
    rules = dust_rules(_pages(spark), min_support=2).collect()
    assert [(r["host"], r["param"], r["support"], r["n_pairs"])
            for r in rules] == [("s0.test", "sid", 2, 2)]
    # at min_support=1 the s1 coincidence appears too
    got = {(r["host"], r["param"])
           for r in dust_rules(_pages(spark), min_support=1).collect()}
    assert got == {("s0.test", "sid"), ("s1.test", "ref")}


def test_dust_max_group_prunes_degenerate_family(spark):
    # 70 URLs all serving the same (error-template) digest: above
    # max_group=64 the family is dropped, so no sid rule is minted
    rows = [(f"https://big.test/p{i}?sid={i}" if i % 2 else
             f"https://big.test/p{i - 1}", "dd") for i in range(70)]
    assert dust_rules(_pages(spark, rows), min_support=1).count() == 0
    # same shape below the cap yields the rule
    rows = rows[:8]
    got = dust_rules(_pages(spark, rows), min_support=1).collect()
    assert [(r["host"], r["param"]) for r in got] == [("big.test", "sid")]


def test_apply_dust_rules(spark):
    rules = dust_rules(_pages(spark), min_support=2)
    urls = spark.createDataFrame(
        [("https://s0.test/p?sid=9&x=2",), ("https://s0.test/p?sid=9",),
         ("https://s1.test/p?sid=9",), ("https://s0.test/bare",)],
        "url string")
    out = apply_dust_rules(urls, rules)
    got = {r["url"]: r["dust_url"] for r in out.collect()}
    assert got == {
        "https://s0.test/p?sid=9&x=2": "https://s0.test/p?x=2",
        "https://s0.test/p?sid=9": "https://s0.test/p",
        "https://s1.test/p?sid=9": "https://s1.test/p?sid=9",
        "https://s0.test/bare": "https://s0.test/bare",
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan     # rules never shuffle the batch
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
