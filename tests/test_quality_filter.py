"""Gopher-rule quality gate (Rae et al. 2021 A1.1): hand-built documents
exercising each rule's pass/fail edge, all evaluated through the pure
built-in expression path."""

from __future__ import annotations

import pytest

from context_crawler_spark.operators.quality_filter import (
    gopher_filter,
    gopher_flags,
)

GOOD = (
    "This is a perfectly reasonable document that we have written to be "
    "long enough. " * 5
    + "It talks about the world and includes plenty of ordinary words "
    "with sensible lengths. " * 3
)


def _flags(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = gopher_filter(df, keep_flags=True).collect()[0]
    return row.asDict()


def test_good_document_passes(spark):
    r = _flags(spark, GOOD)
    assert r["gopher_pass"], r


def test_too_short_fails_word_count(spark):
    r = _flags(spark, "Just a handful of the words here with that.")
    assert not r["f_word_count"] and not r["gopher_pass"]
    # other rules still satisfied — failure is attributed precisely
    assert r["f_stopwords"] and r["f_alpha_words"]


def test_symbol_ratio(spark):
    r = _flags(spark, GOOD + " #### " * 20)
    assert not r["f_symbol_ratio"]
    assert _flags(spark, GOOD)["f_symbol_ratio"]
    # unicode ellipsis and ... both count
    r2 = _flags(spark, GOOD + " … " * 60)
    assert not r2["f_symbol_ratio"]


def test_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item %d" % i for i in range(20)])
    r = _flags(spark, GOOD + "\n" + bullets)
    assert not r["f_bullet_lines"]
    dots = "\n".join(["to be continued..." for _ in range(20)])
    r2 = _flags(spark, GOOD + "\n" + dots)
    assert not r2["f_ellipsis_lines"]


def test_alpha_words_rule(spark):
    numbers = " ".join(str(i) for i in range(200))
    r = _flags(spark, GOOD + " " + numbers)
    assert not r["f_alpha_words"]


def test_stopword_rule(spark):
    # >=50 words, good lengths, but no Gopher stopwords at all
    text = " ".join(["zebra quokka lorikeet wombat dingo kookaburra"] * 12)
    r = _flags(spark, text)
    assert r["f_word_count"] and not r["f_stopwords"] and not r["gopher_pass"]


def test_filter_drops_failures(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, "too short"), (3, GOOD + " #### " * 30)],
        "doc_id long, text string",
    )
    kept = [r["doc_id"] for r in gopher_filter(df).select("doc_id").collect()]
    assert kept == [1]


def test_flag_names_stable():
    ks = set(gopher_flags().keys())
    assert {"f_word_count", "f_mean_word_len", "f_symbol_ratio",
            "f_bullet_lines", "f_ellipsis_lines", "f_alpha_words",
            "f_stopwords"} <= ks


def test_repetition_duplicate_lines(spark):
    from context_crawler_spark.operators.quality_filter import gopher_repetition

    # every word unique — no repeated lines OR repeated 2-grams
    clean = "\n".join(f"alpha{i} bravo{i} charlie{i} delta{i}"
                      for i in range(10))
    spam = "\n".join(["buy cheap widgets now"] * 10)
    df = spark.createDataFrame(
        [(1, clean), (2, spam)], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in gopher_repetition(df).collect()}
    assert rows[1]["f_dup_lines"] and rows[1]["f_dup_line_chars"]
    assert not rows[2]["f_dup_lines"] and not rows[2]["f_dup_line_chars"]
    assert rows[2]["line_dup"] == 9  # 10 copies → 9 beyond the first
    assert not rows[2]["repetition_pass"] and rows[1]["repetition_pass"]


def test_repetition_top2gram(spark):
    from context_crawler_spark.operators.quality_filter import gopher_repetition

    # one 2-gram dominates the character mass
    spam = "click here " * 50 + "other words appear once"
    varied = " ".join(f"w{i} x{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, varied), (2, spam)], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in gopher_repetition(df).collect()}
    assert rows[1]["f_top2gram"]
    assert not rows[2]["f_top2gram"]
    # "click here" (10 chars) repeated ~50x → top2_chars ≈ 500
    assert rows[2]["top2_chars"] >= 400


def test_repetition_single_word_doc(spark):
    from context_crawler_spark.operators.quality_filter import gopher_repetition

    df = spark.createDataFrame([(1, "lonely")], "doc_id long, text string")
    r = gopher_repetition(df).collect()[0]
    assert r["top2_chars"] == 0 and r["f_top2gram"]


def test_repetition_full_table_ngram_stats(spark):
    """Full Table A1 extension: top-3/4-gram and duplicate-5..10-gram
    character fractions (beyond-the-first convention)."""
    from context_crawler_spark.operators.quality_filter import gopher_repetition

    filler = " ".join(f"w{i}" for i in range(200))
    # "alpha beta gamma" repeated 30x: dominant 3-gram (and its 5-gram
    # windows repeat too)
    tri = ("alpha beta gamma " * 30) + filler
    # a 5-word phrase repeated 3 times, far apart -> dup-5-gram chars > 0
    phrase = "one two three four five"
    spaced = f"{phrase} {filler} {phrase} {' '.join(f'x{i}' for i in range(200))} {phrase}"
    df = spark.createDataFrame(
        [(1, filler), (2, tri), (3, spaced)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    # unique text: every n-gram stat zero-duplicate, all flags pass
    assert rows[1]["dup5_chars"] == 0 and rows[1]["repetition_pass"]
    assert rows[1]["top3_chars"] > 0          # max count*len, count==1
    # tri: "alpha beta gamma" 3-gram occurs 30x -> 16 chars * 30 = 480
    assert rows[2]["top3_chars"] == 480
    assert not rows[2]["f_top3gram"] and not rows[2]["repetition_pass"]
    # spaced: the 5-gram "one two three four five" (23 chars) occurs 3x,
    # 2 occurrences beyond the first
    assert rows[3]["dup5_chars"] == 46
    # 46/word-chars is under 15% here, so the flag still passes
    assert rows[3]["f_dup5gram"]
    # zero shuffle, zero Python
    plan = gopher_repetition(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_unigram_entropy_hand_computed(spark):
    """'a a b b' -> H = ln 2 exactly; a single-word doc -> 0; uniform
    4-distinct doc -> ln 4; empty doc emits no row."""
    import math
    from context_crawler_spark.operators.quality_filter import unigram_entropy

    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "word"), (3, "p q r s"), (4, "!!!")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_entropy(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["entropy"] == pytest.approx(math.log(2), abs=2e-6)
    assert rows[1]["n_words"] == 4 and rows[1]["n_unique"] == 2
    assert rows[1]["unique_frac"] == 0.5
    assert rows[2]["entropy"] == 0.0
    assert rows[3]["entropy"] == pytest.approx(math.log(4), abs=2e-6)
    assert rows[3]["unique_frac"] == 1.0
