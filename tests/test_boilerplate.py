"""jusText boilerplate classifier (operators/boilerplate.py) and the
focused-crawl frontier scorer (ranking.focused_priority): class
transitions of the context pass, the link-density / copyright / empty
rules, and the plan shapes (zero-shuffle classifier; evidence-filtered
single-exchange scorer with a broadcast parent join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from context_crawler_spark.operators.boilerplate import (
    BAD, GOOD, NEARGOOD, SHORT, justext_classify,
)
from context_crawler_spark.operators.ranking import focused_priority

GOOD_TXT = (
    "the data is on the table and it is a good long paragraph of the "
    "corpus that has many of the stopwords in it and keeps going on "
    "and on with the content of the page for a while longer here. " * 2
)
BAD_TXT = "key agg row scan slow fast hash merge batch window spark col " * 8
SHORT_TXT = "tiny block"
# stopword-rich but too short for GOOD-by-length at length_high=120
NEAR_TXT = "the table is a fast scan of the data in it " * 2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _classify(spark, rows, links=False):
    schema = "doc_id string, blocks array<string>" + (
        ", links array<int>" if links else "")
    df = spark.createDataFrame(rows, schema)
    return justext_classify(
        df, "blocks", link_words_col="links" if links else None,
        length_low=40, length_high=120,
        stopwords_low_pct=20, stopwords_high_pct=30,
    )


def _classes(out):
    return {r["doc_id"]: (list(r["jt_cf"]), list(r["jt_class"]))
            for r in out.collect()}


def test_context_free_classes(spark):
    out = _classify(spark, [
        ("good", [GOOD_TXT]), ("bad", [BAD_TXT]),
        ("short", [SHORT_TXT]), ("near", [NEAR_TXT]),
        ("empty", ["", "   "]),
        ("copy", ["© 2020 somecorp all the rights of it reserved now ok"]),
    ])
    cls = _classes(out)
    assert cls["good"][0] == [GOOD]
    assert cls["bad"][0] == [BAD]
    assert cls["short"][0] == [SHORT]
    assert cls["near"][0] == [NEARGOOD]
    assert cls["empty"][0] == [BAD, BAD]
    assert cls["copy"][0] == [BAD]


def test_context_pass_transitions(spark):
    out = _classify(spark, [
        # SHORT between two GOODs -> GOOD; between BADs -> BAD
        ("s_gg", [GOOD_TXT, SHORT_TXT, GOOD_TXT]),
        ("s_bb", [BAD_TXT, SHORT_TXT, BAD_TXT]),
        ("s_gb", [GOOD_TXT, SHORT_TXT, BAD_TXT]),
        # NEARGOOD next to one GOOD -> GOOD; isolated -> BAD
        ("n_g", [GOOD_TXT, NEAR_TXT, BAD_TXT]),
        ("n_b", [BAD_TXT, NEAR_TXT, BAD_TXT]),
        # page edge counts as BAD
        ("edge", [NEAR_TXT]),
    ])
    cls = _classes(out)
    assert cls["s_gg"][1] == [GOOD, GOOD, GOOD]
    assert cls["s_bb"][1] == [BAD, BAD, BAD]
    assert cls["s_gb"][1] == [GOOD, BAD, BAD]
    assert cls["n_g"][1] == [GOOD, GOOD, BAD]
    assert cls["n_b"][1] == [BAD, BAD, BAD]
    assert cls["edge"][1] == [BAD]
    # the scan skips over undecided blocks: NEARGOOD two steps from a
    # GOOD (separated only by a SHORT) still sees it
    out2 = _classify(spark, [("skip", [GOOD_TXT, SHORT_TXT, NEAR_TXT])])
    assert _classes(out2)["skip"][1][2] == GOOD


def test_link_density_and_content_text(spark):
    out = _classify(spark, [
        ("d", [GOOD_TXT, "click here home about contact " * 10, GOOD_TXT],
         [0, 40, 0]),
    ], links=True)
    r = out.collect()[0]
    assert list(r["jt_cf"]) == [GOOD, BAD, GOOD]
    assert r["n_good"] == 2 and r["n_blocks"] == 3
    assert r["content_text"] == GOOD_TXT + "\n\n" + GOOD_TXT


def test_justext_zero_shuffle_no_python(spark):
    df = spark.createDataFrame(
        [("d", [GOOD_TXT, SHORT_TXT])], "doc_id string, blocks array<string>")
    plan = _plan(justext_classify(df, "blocks"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_focused_priority_values_and_plan(spark):
    edges = spark.createDataFrame([
        ("p1", "p2", "fast spark join tips"),
        ("p1", "p3", "about us"),
        ("p4", "p2", "spark spark SQL window"),
        ("p5", "p3", "contact"),
    ], "src string, dst string, anchor string")
    parents = spark.createDataFrame(
        [("p1", 3), ("p5", 0)], "src string, hits int")
    out = focused_priority(edges, "spark sql window join",
                           parent_hits=parents)
    rows = {r["dst"]: r for r in out.collect()}
    # p2: {spark,join}=2 + {spark,sql,window}=3 anchors; p1 parent adds 3
    assert rows["p2"]["anchor_hits"] == 5
    assert rows["p2"]["src_hits"] == 3
    assert rows["p2"]["priority"] == 2 * 5 + 3
    # p3 kept only through its topical parent; zero-evidence edge dropped
    assert rows["p3"]["anchor_hits"] == 0 and rows["p3"]["n_links"] == 1
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan          # parent_hits never shuffles
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the evidence filter sits under the aggregation's exchange: the only
    # wide exchanges are the dst groupBy's partial/final pair
    assert plan.count("Exchange hashpartitioning") <= 2


def test_focused_priority_anchor_only(spark):
    edges = spark.createDataFrame(
        [("a", "b", "spark tuning guide"), ("a", "c", "imprint")],
        "src string, dst string, anchor string")
    out = focused_priority(edges, "spark").collect()
    assert len(out) == 1 and out[0]["dst"] == "b"
    assert out[0]["priority"] == 2
