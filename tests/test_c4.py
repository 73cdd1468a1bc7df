"""C4 cleaning rules (Raffel et al. 2020 §2.2) — operators/c4.py.

Crafted pages with real line/punctuation structure pin each rule
individually; the corpus-level span dedup is checked against a
hand-computed first-occurrence assignment.
"""

from __future__ import annotations

from context_crawler_spark.operators.c4 import c4_line_clean, c4_span_dedup

GOOD = "this line has five good words."          # kept
SHORT = "too few words."                          # < 5 words
NOPUNCT = "five words but no terminal punct"      # no terminal punctuation
JS = "enable javascript to view this content."    # javascript mention
QUOTE = 'he said the quote ends like this"'       # end-quote counts as terminal
BANG = "five words ending in a bang!"             # kept
ASK = "does this line have enough words?"         # kept


def _clean(spark, pages, **kw):
    df = spark.createDataFrame(pages, "doc_id long, text string")
    rows = c4_line_clean(df, keep_flags=True, **kw).collect()
    return {r["doc_id"]: r for r in rows}


def test_line_rules(spark):
    text = "\n".join([GOOD, SHORT, NOPUNCT, JS, QUOTE, BANG, ASK])
    out = _clean(spark, [(1, text)])
    r = out[1]
    assert r["line_n"] == 7
    assert r["kept_n"] == 4  # GOOD, QUOTE, BANG, ASK
    assert r["clean_text"] == "\n".join([GOOD, QUOTE, BANG, ASK])
    # sentences counted over kept text: GOOD., BANG!, ASK? (QUOTE has none)
    assert r["n_sentences"] == 3
    assert r["c4_keep"]


def test_page_gates(spark):
    two = "\n".join([GOOD, BANG])  # only 2 sentences -> dropped
    lorem = "\n".join([GOOD, BANG, ASK, "some Lorem Ipsum filler text here."])
    brace = "\n".join([GOOD, BANG, ASK]) + "\nvar x = { a; b; c };"
    bad = "\n".join([GOOD, BANG, ASK, "this page mentions forbiddenword sadly."])
    out = _clean(
        spark,
        [(1, two), (2, lorem), (3, brace), (4, bad)],
        badwords=["forbiddenword"],
    )
    assert not out[1]["c4_keep"] and out[1]["n_sentences"] == 2
    assert out[2]["has_lorem"] and not out[2]["c4_keep"]
    assert out[3]["has_brace"] and not out[3]["c4_keep"]
    assert out[4]["has_badword"] and not out[4]["c4_keep"]
    # the badword page's OTHER gates are clean
    assert not out[4]["has_lorem"] and not out[4]["has_brace"]


def test_pipeline_form_filters_and_rewrites(spark):
    keep_text = "\n".join([GOOD, SHORT, BANG, ASK])
    drop_text = "\n".join([GOOD, BANG])  # below min_sentences
    df = spark.createDataFrame(
        [(1, keep_text), (2, drop_text)], "doc_id long, text string"
    )
    out = c4_line_clean(df).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["text"] == "\n".join([GOOD, BANG, ASK])  # SHORT removed


def test_span_dedup_first_occurrence(spark):
    # doc 1: sentences a b c d  -> spans (a b c), (b c d)
    # doc 2: sentences a b c    -> span (a b c)  == duplicate of doc 1 idx 0
    # doc 3: sentences x y      -> no spans
    a, b, c, d, x, y = "aa.", "bb.", "cc.", "dd.", "xx.", "yy."
    df = spark.createDataFrame(
        [
            (1, "\n".join([a, b, c, d])),
            (2, "\n".join([a, b, c])),
            (3, "\n".join([x, y])),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_span_dedup(df).collect()}
    assert (rows[1]["n_spans"], rows[1]["dup_spans"]) == (2, 0)
    assert (rows[2]["n_spans"], rows[2]["dup_spans"]) == (1, 1)
    assert (rows[3]["n_spans"], rows[3]["dup_spans"]) == (0, 0)


def test_span_dedup_within_doc(spark):
    # the same 3-sentence span repeated within ONE doc: second occurrence
    # (larger idx, same doc) is the duplicate
    s = ["p.", "q.", "r.", "p.", "q.", "r."]
    df = spark.createDataFrame(
        [(7, "\n".join(s))], "doc_id long, text string"
    )
    r = c4_span_dedup(df).collect()[0]
    # spans: pqr, qrp, rpq, pqr -> 4 spans, 1 dup (the second pqr)
    assert (r["n_spans"], r["dup_spans"]) == (4, 1)
