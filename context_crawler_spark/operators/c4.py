"""C4-style web-page cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
the other canonical pre-training text gate next to the Gopher rules.

The C4 pipeline has two halves and so does this module:

  * ``c4_line_clean`` — the per-page half: keep only lines that end in a
    terminal punctuation mark, have at least ``min_words_per_line`` words,
    and do not mention "javascript"; then drop the whole page if it has
    fewer than ``min_sentences`` sentences after cleaning, contains any
    listed bad word, the phrase "lorem ipsum", or a curly brace. Every
    rule is a JVM higher-order expression over pre-materialized split
    arrays — one zero-shuffle projection, whole-stage-codegen'd, exactly
    the gopher_filter shape. Thresholds are integer comparisons, so the
    flags replay bit-for-bit in the DuckDB oracle.
  * ``c4_span_dedup`` — the corpus half: C4 discards all but one of any
    three-sentence span occurring more than once in the dataset. Spans
    are built WITHIN the row (zip_with over slices, the
    gopher_repetition gram shape); the only data-sized exchange is the
    groupBy on the span hash that elects the corpus-first occurrence
    (smallest ``(doc_id, span_idx)``), plus the doc_id agg of the
    join-back — the same two-shuffle budget as curation.paragraph_dedup,
    linear in corpus size at 100 TB, never all-pairs.

The reference crawler ships raw extracted text with no cleaning stage
(src/core.ts:265,341); C4 is part of the training-data extension surface
the task brief asks for, next to the Gopher gate (quality_filter.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4 drops a page containing any word on a public blocklist ("List of
# Dirty, Naughty, Obscene..."); the list itself is external, so the
# default here is empty and callers inject their list (tests/queries use
# corpus words so the gate is actually exercised).
TERMINAL_PUNCT = (".", "!", "?", '"')


def _kept_lines(lines: Column, min_words_per_line: int) -> Column:
    """Lines surviving C4's three line rules, as a HOF filter."""
    def keep(ln: Column) -> Column:
        r = F.rtrim(ln)
        ends_ok = (
            r.endswith(TERMINAL_PUNCT[0]) | r.endswith(TERMINAL_PUNCT[1])
            | r.endswith(TERMINAL_PUNCT[2]) | r.endswith(TERMINAL_PUNCT[3])
        )
        enough_words = (
            F.size(F.split(F.trim(ln), r"\s+")) >= min_words_per_line
        )
        no_js = ~F.lower(ln).contains("javascript")
        return ends_ok & enough_words & no_js

    return F.filter(lines, keep)


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    badwords: list[str] | None = None,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    keep_flags: bool = False,
) -> DataFrame:
    """C4 §2.2 page cleaning. Appends:

    ``line_n`` / ``kept_n`` — lines before/after the line rules;
    ``clean_text`` — the kept lines rejoined with ``\\n``;
    ``n_sentences`` — terminal-punctuation count over ``clean_text``;
    ``has_badword`` / ``has_lorem`` / ``has_brace`` — page-drop triggers;
    ``c4_keep`` — the page survives (enough sentences, no trigger).

    ``keep_flags=False`` returns only surviving pages with ``text``
    replaced by ``clean_text`` (the pipeline form); ``True`` keeps every
    row with diagnostics (the audit/oracle form). Zero shuffle either way.
    """
    t = F.col(text_col)
    base = df.withColumns({
        "__lines": F.split(t, r"\n"),
        "__lwords": F.split(F.trim(F.lower(t)), r"\s+"),
    })
    kept = _kept_lines(F.col("__lines"), min_words_per_line)
    base = base.withColumn("__kept", kept)
    clean_text = F.array_join(F.col("__kept"), "\n")
    base = base.withColumn("clean_text", clean_text)
    n_sentences = F.length(
        F.regexp_replace("clean_text", r"[^.!?]", "")
    ).cast("long")
    has_badword = (
        F.arrays_overlap(
            F.col("__lwords"),
            F.array(*[F.lit(w) for w in badwords]),
        )
        if badwords
        else F.lit(False)
    )
    out = base.withColumns({
        "line_n": F.size("__lines").cast("long"),
        "kept_n": F.size("__kept").cast("long"),
        "n_sentences": n_sentences,
        "has_badword": has_badword,
        "has_lorem": F.lower(t).contains("lorem ipsum"),
        "has_brace": t.contains("{"),
    })
    out = out.withColumn(
        "c4_keep",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_badword") & ~F.col("has_lorem") & ~F.col("has_brace"),
    ).drop("__lines", "__lwords", "__kept")
    if keep_flags:
        return out
    return (
        out.filter(F.col("c4_keep"))
        .withColumn(text_col, F.col("clean_text"))
        .drop("clean_text", "line_n", "kept_n", "n_sentences",
              "has_badword", "has_lorem", "has_brace", "c4_keep")
    )


def c4_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_sentences: int = 3,
    sentence_sep: str = r"\n",
) -> DataFrame:
    """C4's corpus-level three-sentence-span dedup, as per-doc statistics:
    one row per document with ``n_spans`` (sliding ``span_sentences``-
    sentence windows) and ``dup_spans`` (windows whose span text occurs
    earlier in the corpus — "earlier" = smaller ``(doc_id, span_idx)``,
    the corpus-first convention shared with curation.paragraph_dedup).

    Sentences are the units of ``text_col`` delimited by the regex
    ``sentence_sep`` (C4's line cleaning leaves one sentence per line, so
    the newline default consumes ``c4_line_clean``'s output directly;
    callers with richer sentence structure pass their own pattern).

    Plan (r6): spans build within the row (zip_with over
    ``span_sentences`` shifted slices — no explode until the span table)
    and are hashed to xxhash64 longs immediately, so the ONE span-keyed
    exchange carries 8-byte keys instead of 3-sentence strings; the
    corpus-first election is an unordered window ``min(struct(id, idx))``
    over the span key — every occurrence reads its span's winner in
    place, where the old groupBy + join-back re-exchanged (or broadcast)
    the span table a second time. Per-doc stats are hash-invariant
    absent 64-bit collisions (the paragraph_dedup convention — the
    oracle replays raw span strings and still hash-matches). Dangling
    docs (fewer sentences than the window) emit zero spans but keep
    their row via the left join onto the doc spine.
    """
    from pyspark.sql import Window

    did = F.col(id_col)
    sents = F.split(F.col(text_col), sentence_sep, -1)
    k = span_sentences

    base = df.select(did.alias("id"), sents.alias("__s"))
    s = F.col("__s")
    n_sent = F.size(s)
    slices = [F.slice(s, i + 1, n_sent - (k - 1)) for i in range(k)]
    spans = slices[0]
    for nxt in slices[1:]:
        spans = F.zip_with(spans, nxt, lambda a, b: F.concat_ws(" ", a, b))
    spans = F.when(n_sent >= k, spans).otherwise(
        F.array().cast("array<string>")
    )
    with_spans = base.select(
        "id", F.posexplode(spans).alias("idx", "span")
    ).select("id", "idx", F.xxhash64("span").alias("__h"))
    first = F.min(F.struct(F.col("id"), F.col("idx"))).over(
        Window.partitionBy("__h"))
    marked = with_spans.select(
        "id",
        F.when(
            (first["id"] != F.col("id")) | (first["idx"] != F.col("idx")),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long").alias("__dup"),
    )
    stats = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("__dup").alias("dup_spans"),
    )
    return (
        base.select("id")
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
        )
    )
