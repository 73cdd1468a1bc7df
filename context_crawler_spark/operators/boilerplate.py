"""jusText-style boilerplate block classification (Pomikálek 2011,
"Removing Boilerplate and Duplicate Content from Web Corpora", ch. 4) —
the canonical block-level content/boilerplate separator used by most web
corpus pipelines ahead of the page-level gates (C4, Gopher).

The page is a sequence of text blocks. Stage 1 (context-free) classifies
each block on its own features — link density, a copyright marker, char
length, stopword density — into BAD / SHORT / NEARGOOD / GOOD. Stage 2
(context-sensitive) resolves the undecided middle classes by their
decided neighbors: a NEARGOOD block becomes GOOD next to a GOOD block, a
SHORT block becomes GOOD only between two GOOD blocks. (jusText's full
context pass also lets a NEARGOOD block conduct GOODness into an
adjacent SHORT one; this implementation simplifies that to
decided-neighbor voting — the nearest *decided* neighbor on each side —
which agrees with jusText everywhere except that one conduction case,
and is what makes both stages exact integer/window logic replayable in
the SQL oracle.)

Execution shape: the whole classifier is ONE zero-shuffle projection.
Blocks, per-block features, the context-free class, and both
nearest-decided-neighbor scans (a forward and a backward ``aggregate``
fold over the class array) are JVM higher-order expressions within the
row — no explode, no window, no Python. Stopword-density and
link-density thresholds compare cross-multiplied integers
(``stop*100 >= words*pct``), so every class replays bit-for-bit in
DuckDB. At 100 TB this costs exactly one pass over the text column.

Link density needs the DOM: the fetch/extract stage sees the anchors and
can emit per-block anchor word counts next to the text (the
``link_words_col`` seam); on plain text inputs pass None and the link
rule is skipped — the remaining rules are text-only, as in jusText's
"stoplist-free" degraded mode.

The reference ships raw ``innerText`` per page with no boilerplate stage
(src/core.ts:265,341); this belongs to the training-data extension
surface of the brief, upstream of quality_filter.py / c4.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class codes — integers so the DuckDB oracle replays them exactly
BAD, SHORT, NEARGOOD, GOOD = 0, 1, 2, 3

# A small, fixed English function-word list (public domain; the head of
# every standard English stoplist). jusText ships per-language lists —
# swap via the `stopwords` parameter.
STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "on", "for", "with", "as", "at", "by", "be", "this", "that",
    "from", "but", "not", "have", "has",
]


def _block_words(block: Column) -> Column:
    """Whitespace words of one block (empty block -> empty array)."""
    trimmed = F.trim(block)
    return F.when(trimmed == "", F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, r"\s+"))


def _decided_scan(cf: Column) -> Column:
    """Running nearest-decided-class scan: element i of the result is the
    last BAD/GOOD value among cf[0..i-1], BAD at the boundary (jusText
    treats the page edge as bad). A fold, not a window — stays inside
    the row."""
    acc0 = F.struct(
        F.array().cast("array<int>").alias("out"),
        F.lit(BAD).alias("last"),
    )
    return F.aggregate(
        cf,
        acc0,
        lambda acc, x: F.struct(
            F.concat(acc["out"], F.array(acc["last"])).alias("out"),
            F.when((x == BAD) | (x == GOOD), x)
             .otherwise(acc["last"]).alias("last"),
        ),
        lambda acc: acc["out"],
    )


def justext_classify(
    df: DataFrame,
    blocks_col: str = "blocks",
    link_words_col: str | None = None,
    stopwords: list[str] | None = None,
    length_low: int = 80,
    length_high: int = 200,
    stopwords_low_pct: int = 30,
    stopwords_high_pct: int = 32,
    max_link_density_pct: int = 20,
) -> DataFrame:
    """Classify each text block of each row. Appends array columns
    aligned with ``blocks_col``:

    ``jt_words`` / ``jt_chars`` / ``jt_stops`` — per-block word count,
    char length, stopword count; ``jt_cf`` — the context-free class;
    ``jt_class`` — the final class after the context pass (codes
    BAD=0, SHORT=1, NEARGOOD=2, GOOD=3; SHORT/NEARGOOD never survive the
    context pass); plus ``content_text`` — the GOOD blocks rejoined with
    a blank line (the cleaned page) — and ``n_blocks`` / ``n_good``.

    ``link_words_col``, when given, is an int-array column (same length
    as the blocks array) of anchor-text word counts per block, produced
    by the DOM-side extract stage. Zero shuffle either way.
    """
    stop_lit = F.array(*[
        F.lit(w) for w in (stopwords if stopwords is not None
                           else STOPWORDS_EN)
    ])
    blocks = F.col(blocks_col)

    words = F.transform(blocks, lambda b: _block_words(b))
    n_words = F.transform(words, F.size)
    n_chars = F.transform(blocks, lambda b: F.length(F.trim(b)))
    stops = F.transform(
        words,
        lambda ws: F.size(F.filter(
            ws, lambda w: F.array_contains(stop_lit, F.lower(w)))),
    )

    df = df.withColumns({
        "jt_words": n_words,
        "jt_chars": n_chars,
        "jt_stops": stops,
    })

    if link_words_col is not None:
        link_bad = F.transform(
            F.arrays_zip(F.col(link_words_col).alias("l"),
                         F.col("jt_words").alias("w")),
            lambda z: z["l"] * 100 > z["w"] * max_link_density_pct,
        )
    else:
        link_bad = F.transform(F.col("jt_words"), lambda _: F.lit(False))

    def cf_one(z: Column) -> Column:
        w, c, s, lb, blk = z["w"], z["c"], z["s"], z["lb"], z["b"]
        has_copy = blk.contains("©") | blk.contains("&copy;")
        return (
            F.when(lb | has_copy, F.lit(BAD))
             .when(w == 0, F.lit(BAD))
             .when(c < length_low, F.lit(SHORT))
             .when(s * 100 >= w * stopwords_high_pct,
                   F.when(c > length_high, F.lit(GOOD))
                    .otherwise(F.lit(NEARGOOD)))
             .when(s * 100 >= w * stopwords_low_pct, F.lit(NEARGOOD))
             .otherwise(F.lit(BAD))
        )

    zipped = F.arrays_zip(
        F.col("jt_words").alias("w"), F.col("jt_chars").alias("c"),
        F.col("jt_stops").alias("s"), link_bad.alias("lb"),
        blocks.alias("b"),
    )
    df = df.withColumn("jt_cf", F.transform(zipped, cf_one))

    prev_dec = _decided_scan(F.col("jt_cf"))
    next_dec = F.reverse(_decided_scan(F.reverse(F.col("jt_cf"))))

    def finalize(z: Column) -> Column:
        cf, p, n = z["cf"], z["p"], z["n"]
        return (
            F.when((cf == BAD) | (cf == GOOD), cf)
             .when(cf == NEARGOOD,
                   F.when((p == GOOD) | (n == GOOD), F.lit(GOOD))
                    .otherwise(F.lit(BAD)))
             # SHORT: good only between two good neighbors
             .otherwise(F.when((p == GOOD) & (n == GOOD), F.lit(GOOD))
                         .otherwise(F.lit(BAD)))
        )

    df = df.withColumn(
        "jt_class",
        F.transform(
            F.arrays_zip(F.col("jt_cf").alias("cf"), prev_dec.alias("p"),
                         next_dec.alias("n")),
            finalize,
        ),
    )
    good_blocks = F.filter(
        F.arrays_zip(blocks.alias("b"), F.col("jt_class").alias("k")),
        lambda z: z["k"] == GOOD,
    )
    return df.withColumns({
        "content_text": F.array_join(
            F.transform(good_blocks, lambda z: z["b"]), "\n\n"),
        "n_blocks": F.size(blocks),
        "n_good": F.size(good_blocks),
    })
