"""Crawler-trap detection: per-host URL-space-explosion signals."""

from __future__ import annotations

from pyspark.sql import functions as F

from context_crawler_spark.operators.traps import url_trap_signals


def test_trap_signals_classes(spark):
    """Calendar hosts trip the template ratio, cyclic paths trip the
    segment-repeat signal, a normal slugged site passes."""
    urls = (
        [f"https://cal.test/events/2024/{m}/{d}"
         for m in range(1, 5) for d in range(1, 11)]            # 40, 1 tpl
        + [f"https://loop.test/a/b/a/b/{w}" for w in
           ("x", "y", "z")]                                      # repeats
        + ["https://ok.test/about", "https://ok.test/contact",
           "https://ok.test/team/alice", "https://ok.test/team/bob"]
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["host"]: r for r in url_trap_signals(df).collect()}

    cal = got["cal.test"]
    assert cal["n_templates"] == 1 and cal["urls_per_template"] == 40.0
    assert cal["trap"]

    loop = got["loop.test"]
    assert loop["avg_seg_repeat"] == 2.0   # a,b each repeat once → 2/url
    assert loop["trap"]

    ok = got["ok.test"]
    assert not ok["trap"]
    assert ok["urls_per_template"] < 2.0 and ok["avg_seg_repeat"] == 0.0


def test_trap_signals_single_shuffle(spark):
    """All signals fold into ONE host-keyed aggregation — the physical
    plan carries no second data-sized exchange and no Python."""
    df = spark.createDataFrame(
        [("https://a.test/x/1",)], "url string")
    out = url_trap_signals(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # hashpartitioning on host appears; no SinglePartition exchange
    assert "SinglePartition" not in plan


def test_trap_signals_query_and_fragment_excluded_from_path(spark):
    df = spark.createDataFrame(
        [("https://h.test/p/1?s=9",), ("https://h.test/p/2#frag",)],
        "url string")
    got = url_trap_signals(df).collect()[0]
    assert got["frac_query"] == 0.5
    assert got["n_templates"] == 1  # both /p/N


def test_apply_trap_budgets_freezes_and_probes(spark):
    """Flagged hosts get the trap budget (0 = frozen, N = slow probe);
    clean hosts keep the full budget; the flag join is a broadcast."""
    from context_crawler_spark.operators.politeness import apply_trap_budgets

    rows = [(f"https://{h}/p{i}", h, 10 - (i % 10), i)
            for h in ("trap.test", "ok.test") for i in range(20)]
    frontier = spark.createDataFrame(
        rows, "url string, host string, priority int, seq long")
    traps = spark.createDataFrame(
        [("trap.test", True), ("ok.test", False)], "host string, trap boolean")

    frozen = apply_trap_budgets(frontier, traps, trap_budget=0,
                                budget_per_host=8)
    by_host = {r["host"]: r["n"] for r in
               frozen.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert by_host == {"ok.test": 8}

    probed = apply_trap_budgets(frontier, traps, trap_budget=2,
                                budget_per_host=8)
    by_host = {r["host"]: r["n"] for r in
               probed.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert by_host == {"ok.test": 8, "trap.test": 2}
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_soft_404_signals(spark):
    """Soft-404 flags: 200s with error bodies flagged; hard 404s, long
    legit pages (even ones mentioning '404 error' late), and small-but-
    clean pages are not. Zero shuffle, zero Python."""
    from context_crawler_spark.operators.traps import soft_404_signals

    long_ok = "All about HTTP status codes. " * 20 + "The 404 error code."
    rows = [
        ("u1", 200, "Page Not Found", long_ok),        # title hit alone
        ("u2", 200, "My 404 collection", long_ok),     # bare-404 title
        ("u3", 200, "Welcome", "Error 404 - page does not exist"),  # tiny+head
        ("u4", 200, "Welcome", ""),                    # empty body
        ("u5", 200, "Welcome", long_ok),               # clean long page
        ("u6", 404, "Page Not Found", ""),             # hard miss: not soft
        ("u7", 200, "Welcome", "short but fine page"), # tiny but clean
        ("u8", 200, "v4042 release notes", long_ok),   # digit-flanked 404
    ]
    df = spark.createDataFrame(rows, "url string, status int, title string, text string")
    out = soft_404_signals(df)
    got = {r["url"]: r["soft_404"] for r in out.collect()}
    assert got == {"u1": True, "u2": True, "u3": True, "u4": True,
                   "u5": False, "u6": False, "u7": False, "u8": False}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
