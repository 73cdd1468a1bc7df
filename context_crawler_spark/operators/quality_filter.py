"""Gopher-rule document quality filtering — the standard pre-training
text-quality gate (Rae et al. 2021, "Scaling Language Models: ... Gopher",
appendix A1.1), as pure Spark built-in expressions.

Every rule is evaluated JVM-side (split / transform / filter / aggregate
higher-order functions — whole-stage codegen, zero Python) and every
threshold comparison is INTEGER cross-multiplication (``10*symbols <=
n_words`` instead of ``symbols/n_words <= 0.1``), so the flags are exact
and reproducible bit-for-bit across engines — the DuckDB oracle mirrors
them with list_filter/list_transform.

The reference crawler has no quality gate (it ships raw extracted text);
this is part of the training-data extension surface the task brief asks
for (same family as exact/minhash dedup and langid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the Gopher stop-word presence set (rule: a doc must contain >= 2)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

MIN_WORDS, MAX_WORDS = 50, 100_000
BULLET_PREFIXES = ("-", "*", "•")  # -, *, •


def gopher_flags(text_col: str = "text") -> dict[str, Column]:
    """Named boolean flag per Gopher rule (True = rule satisfied), plus the
    integer features they derive from. Keys prefixed ``f_`` are flags."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words).cast("long")
    # total characters across words (mean-word-length numerator)
    word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # symbol occurrences: '#' plus '...' plus unicode ellipsis
    hashes = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast("long")
    dots3 = ((F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3).cast("long")
    uni_ell = (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))).cast("long")
    symbols = hashes + dots3 + uni_ell
    lines = F.split(t, r"\n")
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(F.filter(
        lines,
        lambda ln: F.trim(ln).startswith(BULLET_PREFIXES[0])
        | F.trim(ln).startswith(BULLET_PREFIXES[1])
        | F.trim(ln).startswith(BULLET_PREFIXES[2]),
    )).cast("long")
    ellipsis_lines = F.size(F.filter(
        lines,
        lambda ln: F.rtrim(ln).endswith("...") | F.rtrim(ln).endswith("…"),
    )).cast("long")
    alpha_words = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]")
    )).cast("long")
    stop_hits = F.aggregate(
        F.array(*[F.array_contains(words, s).cast("long")
                  for s in GOPHER_STOPWORDS]),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return {
        "n_words": n_words,
        "n_lines": n_lines,
        "symbols": symbols,
        "alpha_words": alpha_words,
        "stop_hits": stop_hits,
        # rules — all integer cross-multiplied
        "f_word_count": (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        "f_mean_word_len": (word_chars >= 3 * n_words)
        & (word_chars <= 10 * n_words),
        "f_symbol_ratio": 10 * symbols <= n_words,
        "f_bullet_lines": 10 * bullet_lines <= 9 * n_lines,
        "f_ellipsis_lines": 10 * ellipsis_lines <= 3 * n_lines,
        "f_alpha_words": 5 * alpha_words >= 4 * n_words,
        "f_stopwords": stop_hits >= 2,
    }


def _hof_char_sum(col: Column) -> Column:
    return F.aggregate(
        F.transform(col, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher A1.1 repetition filters: duplicate line / paragraph fraction
    (≤0.30), duplicate line / paragraph CHARACTER fraction (≤0.20, counting
    occurrences beyond the first of each repeated unit — the DataTrove
    convention), and top-2-gram character fraction (≤0.20, the most common
    word 2-gram's count×length over total word characters).

    Shapes: the line/paragraph stats are within-row higher-order functions
    (zero shuffle); the top-2-gram runs the idiomatic distributed kernel —
    explode → groupBy(id, gram) → per-id max — ONE shuffle keyed on the id,
    linear in corpus size (a per-row O(len²) HOF would be the wrong kernel
    at 100 TB). Thresholds are integer cross-multiplied, hash-identical to
    the DuckDB oracle."""
    t = F.col(text_col)
    lines = F.split(t, r"\n")
    paras = F.split(t, r"\n\n")
    words = F.split(F.trim(t), r"\s+")

    def unit_stats(col: Column, prefix: str) -> dict[str, Column]:
        n = F.size(col).cast("long")
        nd = F.size(F.array_distinct(col)).cast("long")
        chars = _hof_char_sum(col)
        dchars = _hof_char_sum(F.array_distinct(col))
        return {
            f"{prefix}_n": n,
            f"{prefix}_dup": n - nd,
            f"{prefix}_chars": chars,
            f"{prefix}_dup_chars": chars - dchars,
        }

    ls = unit_stats(lines, "line")
    ps = unit_stats(paras, "para")
    base = df
    for k, c in {**ls, **ps}.items():
        base = base.withColumn(k, c)
    base = base.withColumn("word_chars", _hof_char_sum(words))

    grams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    top2 = (
        df.select(id_col, F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram").count()
        .groupBy(id_col)
        .agg(F.max(F.col("count") * F.length("gram").cast("long"))
             .alias("top2_chars"))
    )
    out = base.join(top2, id_col, "left").withColumn(
        "top2_chars", F.coalesce(F.col("top2_chars"), F.lit(0)).cast("long")
    )
    return (
        out.withColumn("f_dup_lines",
                       10 * F.col("line_dup") <= 3 * F.col("line_n"))
        .withColumn("f_dup_paras",
                    10 * F.col("para_dup") <= 3 * F.col("para_n"))
        .withColumn("f_dup_line_chars",
                    5 * F.col("line_dup_chars") <= F.col("line_chars"))
        .withColumn("f_dup_para_chars",
                    5 * F.col("para_dup_chars") <= F.col("para_chars"))
        .withColumn("f_top2gram",
                    5 * F.col("top2_chars") <= F.col("word_chars"))
        .withColumn(
            "repetition_pass",
            F.col("f_dup_lines") & F.col("f_dup_paras")
            & F.col("f_dup_line_chars") & F.col("f_dup_para_chars")
            & F.col("f_top2gram"),
        )
    )


def gopher_filter(df: DataFrame, text_col: str = "text",
                  keep_flags: bool = False) -> DataFrame:
    """Rows passing ALL Gopher rules. ``keep_flags=True`` appends the flag
    and feature columns instead of dropping failures' diagnostics."""
    flags = gopher_flags(text_col)
    passed = None
    for k, c in flags.items():
        if k.startswith("f_"):
            passed = c if passed is None else (passed & c)
    if keep_flags:
        out = df
        for k, c in flags.items():
            out = out.withColumn(k, c)
        return out.withColumn("gopher_pass", passed)
    return df.filter(passed)
