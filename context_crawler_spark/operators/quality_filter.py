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


def gopher_flags(text_col: str = "text", words_col: str | None = None,
                 lines_col: str | None = None) -> dict[str, Column]:
    """Named boolean flag per Gopher rule (True = rule satisfied), plus the
    integer features they derive from. Keys prefixed ``f_`` are flags.

    ``words_col``/``lines_col`` name PRE-MATERIALIZED split-array columns
    (``gopher_filter`` provides them): the flags reference each array
    ~a dozen times, and building them from a column alias evaluates the
    split once per row instead of once per referencing expression."""
    t = F.col(text_col)
    words = (F.col(words_col) if words_col
             else F.split(F.trim(t), r"\s+"))
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
    lines = F.col(lines_col) if lines_col else F.split(t, r"\n")
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
    # single fused fold (r6): HOFs are interpreted per lambda call, so the
    # old transform-then-aggregate pair paid two lambda invocations per
    # element for one integer sum
    return F.aggregate(
        col, F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"),
    )


def gopher_repetition(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Gopher A1.1 repetition filters — the FULL Rae et al. Table A1 set
    (r4 late): duplicate line / paragraph fraction (≤0.30), duplicate
    line / paragraph CHARACTER fraction (≤0.20, counting occurrences
    beyond the first of each repeated unit — the DataTrove convention),
    top-{2,3,4}-gram character fraction (≤{0.20,0.18,0.16}, the most
    common word n-gram's count×length over total word characters), and
    duplicate-{5..10}-gram character fraction (≤{0.15..0.10},
    beyond-the-first convention, same as lines/paras).

    Shape (r4): every statistic — including all nine n-gram stats — is computed
    WITHIN the row, so the whole operator is one zero-shuffle projection.
    The 2-gram max is ``array_sort`` + one run-length fold over the sorted
    grams (O(n log n) per row, vs the O(n²) count-each-distinct HOF that
    PLANS.md §8 rejected); at any corpus scale that beats the r3
    explode → groupBy(id, gram) kernel, which shuffled ~8× the corpus
    bytes to compute a per-document statistic. Two plan rules the r3
    profile exposed (7.7 s → ~0.5 s at sf0.1): (a) split arrays are
    MATERIALIZED as columns first — an alias referenced more than once is
    not inlined by CollapseProject, while referencing the raw ``split()``
    expression from inside a lambda re-evaluates the split per element
    (O(n²·len) per row); (b) grams build via ``zip_with`` on two slices,
    never ``element_at(expr, i)`` in a ``transform``. Thresholds are
    integer cross-multiplied, hash-identical to the DuckDB oracle."""
    t = F.col(text_col)
    arrays = {
        "__lines": F.split(t, r"\n"),
        "__paras": F.split(t, r"\n\n"),
        "__words": F.split(F.trim(t), r"\s+"),
    }
    base = df.withColumns(arrays)
    base = base.withColumns({
        "__lines_d": F.array_distinct("__lines"),
        "__paras_d": F.array_distinct("__paras"),
    })

    # materialize the char sums first: {prefix}_chars and the subtraction
    # in {prefix}_dup_chars both reference the fold, and lambda-bearing
    # trees get no codegen CSE — inlined, each unit's fold ran twice (r6)
    base = base.withColumns({
        "__line_chars": _hof_char_sum(F.col("__lines")),
        "__line_dchars": _hof_char_sum(F.col("__lines_d")),
        "__para_chars": _hof_char_sum(F.col("__paras")),
        "__para_dchars": _hof_char_sum(F.col("__paras_d")),
    })

    def unit_stats(col: str, dcol: str, prefix: str) -> dict[str, Column]:
        n = F.size(col).cast("long")
        nd = F.size(dcol).cast("long")
        chars = F.col(f"__{prefix}_chars")
        dchars = F.col(f"__{prefix}_dchars")
        return {
            f"{prefix}_n": n,
            f"{prefix}_dup": n - nd,
            f"{prefix}_chars": chars,
            f"{prefix}_dup_chars": chars - dchars,
        }

    words = F.col("__words")

    # r6 SECOND pass: the nine n-gram statistics never need the gram
    # STRINGS — only (identity, char length) per gram. Identity is a
    # 64-bit rolling hash (h_n[i] = xxhash64(h_{n-1}[i], wh[i+n-1]) —
    # an injective-chain tuple hash, same 2^-64 collision caveat as the
    # hashed-gram containment/c4 kernels); length is exact arithmetic
    # (gram = words joined by one space, so len = Σ word lens + n − 1,
    # i.e. l_n[i] = l_{n-1}[i] + wl[i+n-1] + 1). Each level is ONE
    # zip_with pass of integer ops over materialized columns — O(9·W)
    # per doc total, where the string kernel paid O(Σn·W) allocations
    # (slice + array_join building ~6n-char strings per position) plus
    # string sorts/distincts. Sorting/distincting 12-byte (h, l) structs
    # groups equal grams exactly like sorting the strings did, so every
    # integer statistic is unchanged (absent 64-bit collisions, which the
    # oracle would catch).
    L = F.size(words)
    base = base.withColumns({
        "__wh": F.transform(words, lambda x: F.xxhash64(x)),
        "__wl": F.transform(words, lambda x: F.length(x).cast("long")),
    })
    empty_h = F.array().cast("array<bigint>")
    empty_l = F.array().cast("array<bigint>")
    lvl_cols: dict[str, Column] = {}
    for n in range(2, 11):
        ph = F.col("__wh") if n == 2 else F.col(f"__h{n - 1}")
        pl = F.col("__wl") if n == 2 else F.col(f"__l{n - 1}")
        ln = L - (n - 1)  # number of n-grams
        lvl_cols[f"__h{n}"] = F.when(L >= n, F.zip_with(
            F.slice(ph, 1, ln), F.slice(F.col("__wh"), n, ln),
            lambda a, b: F.xxhash64(a, b))).otherwise(empty_h)
        lvl_cols[f"__l{n}"] = F.when(L >= n, F.zip_with(
            F.slice(pl, 1, ln), F.slice(F.col("__wl"), n, ln),
            lambda a, b: a + b + 1)).otherwise(empty_l)
        # each level feeds the next one — materialize as columns
        # sequentially (CollapseProject keeps multiply-referenced aliases)
        base = base.withColumns({f"__h{n}": lvl_cols[f"__h{n}"],
                                 f"__l{n}": lvl_cols[f"__l{n}"]})

    def hl_structs(n: int) -> Column:
        return F.zip_with(F.col(f"__h{n}"), F.col(f"__l{n}"),
                          lambda h, l: F.struct(h.alias("h"), l.alias("l")))

    # ONE run-length fold over the (h, l)-sorted grams yields the
    # top-n-gram statistic: best = max over runs of count×length
    zero = F.lit(0).cast("long")
    acc0 = F.struct(F.lit(None).cast("bigint").alias("prev"),
                    zero.alias("run"), zero.alias("best"))

    def step(acc, x):
        run = F.when(x["h"] == acc["prev"], acc["run"] + 1) \
            .otherwise(F.lit(1).cast("long"))
        return F.struct(
            x["h"].alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run * x["l"]).alias("best"),
        )

    def lsum(col: Column) -> Column:
        return F.aggregate(col, zero, lambda acc, x: acc + x)

    gram_cols: dict[str, Column] = {}
    for n in (2, 3, 4):
        gram_cols[f"top{n}_chars"] = F.aggregate(
            F.array_sort(hl_structs(n)), acc0, step)["best"]
    for n in (5, 6, 7, 8, 9, 10):
        # beyond-the-first duplicate chars ≡ Σlen(grams) − Σlen(distinct
        # grams): an O(n) hash-distinct instead of the top-gram's
        # O(n log n) sort+fold
        gram_cols[f"dup{n}_chars"] = (
            lsum(F.col(f"__l{n}"))
            - F.aggregate(F.array_distinct(hl_structs(n)), zero,
                          lambda acc, x: acc + x["l"]))

    out = base.withColumns({
        **unit_stats("__lines", "__lines_d", "line"),
        **unit_stats("__paras", "__paras_d", "para"),
        "word_chars": lsum(F.col("__wl")),
        **gram_cols,
    }).drop("__lines", "__paras", "__words", "__lines_d", "__paras_d",
            "__line_chars", "__line_dchars", "__para_chars", "__para_dchars",
            "__wh", "__wl",
            *[f"__h{n}" for n in range(2, 11)],
            *[f"__l{n}" for n in range(2, 11)])
    # full Rae et al. Table A1 thresholds, integer cross-multiplied:
    # top n-gram char fraction ≤ {2: 20%, 3: 18%, 4: 16%}; duplicate
    # n-gram char fraction ≤ {5: 15%, 6: 14%, 7: 13%, 8: 12%, 9: 11%,
    # 10: 10%}
    flag_cols: dict[str, Column] = {
        "f_dup_lines": 10 * F.col("line_dup") <= 3 * F.col("line_n"),
        "f_dup_paras": 10 * F.col("para_dup") <= 3 * F.col("para_n"),
        "f_dup_line_chars":
            5 * F.col("line_dup_chars") <= F.col("line_chars"),
        "f_dup_para_chars":
            5 * F.col("para_dup_chars") <= F.col("para_chars"),
    }
    for n, pct in ((2, 20), (3, 18), (4, 16)):
        flag_cols[f"f_top{n}gram"] = (
            100 * F.col(f"top{n}_chars") <= pct * F.col("word_chars"))
    for n, pct in ((5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10)):
        flag_cols[f"f_dup{n}gram"] = (
            100 * F.col(f"dup{n}_chars") <= pct * F.col("word_chars"))
    out = out.withColumns(flag_cols)
    all_pass = F.lit(True)
    for name in flag_cols:
        all_pass = all_pass & F.col(name)
    return out.withColumn("repetition_pass", all_pass)


def gopher_filter(df: DataFrame, text_col: str = "text",
                  keep_flags: bool = False) -> DataFrame:
    """Rows passing ALL Gopher rules. ``keep_flags=True`` appends the flag
    and feature columns instead of dropping failures' diagnostics.

    The split arrays are materialized once up front (see gopher_flags) —
    still a single zero-shuffle projection, just one split per row."""
    t = F.col(text_col)
    base = df.withColumns({
        "__gwords": F.split(F.trim(t), r"\s+"),
        "__glines": F.split(t, r"\n"),
    })
    flags = gopher_flags(text_col, words_col="__gwords",
                         lines_col="__glines")
    passed = None
    for k, c in flags.items():
        if k.startswith("f_"):
            passed = c if passed is None else (passed & c)
    if keep_flags:
        out = base
        for k, c in flags.items():
            out = out.withColumn(k, c)
        return out.withColumn("gopher_pass", passed) \
            .drop("__gwords", "__glines")
    return base.filter(passed).drop("__gwords", "__glines")


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n_buckets: int = 3,
) -> DataFrame:
    """Corpus-unigram language-model quality score + CCNet-style buckets.

    CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data") buckets web documents head/middle/tail
    by LM perplexity. The trained KenLM is not available here, so the
    deterministic stand-in is the corpus's own unigram LM: score(doc) =
    mean over its tokens of ln(count(w)/total_tokens). Relative ordering
    (repetitive/common-token docs score high, rare-token docs low) is what
    the buckets consume; swap the per-token logprob source for a real LM
    on a cluster without touching the plan.

    Plan shape: one explode→groupBy(word) shuffle builds the vocabulary
    (at 100 TB the vocab table is still tiny relative to the corpus —
    heavy-hitter words partial-aggregate map-side); token logprobs come
    back via a join on word (AQE broadcasts the vocab when it fits); the
    per-doc mean is a groupBy on the doc id. The head/middle/tail split
    needs a global rank — computed with the DISTRIBUTED zipWithIndex
    (ordering.with_global_seq: range-sort + per-partition offsets, one
    shuffle, no single-partition window), then ``ntile`` is pure
    arithmetic on (rank, N): the first N%n buckets take ceil(N/n) rows,
    the rest floor(N/n) — exactly Spark's and DuckDB's ntile contract.
    Ascending-id tie-break keeps bucket assignment engine-independent."""
    from context_crawler_spark.operators.ordering import with_global_seq
    from context_crawler_spark.operators.ranking import alnum_words, term_counts

    did = F.col(id_col)
    # tokenize ONCE (r6): the vocabulary and the scoring branch used to
    # re-run the tokenizer each; the vocab counts now come from the
    # per-row run-length kernel (sum of per-doc tfs ≡ instance count,
    # integer-exact) so its exchange carries distinct (word, tf) pairs.
    # The scoring branch keeps per-INSTANCE rows and the same avg — the
    # per-doc float is bit-unchanged.
    toks_w = df.select(did.alias("id"), alnum_words(text_col).alias("__w")) \
        .localCheckpoint(eager=False)
    vocab = (
        toks_w.select(F.explode(term_counts(F.col("__w"))).alias("__e"))
        .groupBy(F.col("__e.term").alias("w"))
        .agg(F.sum("__e.tf").alias("cnt"))
    )
    toks = toks_w.select("id", F.explode("__w").alias("w"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "w")
        .join(F.broadcast(total))
        .select("id", (F.log(F.col("cnt") / F.col("total"))).alias("__lp"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             # round BEFORE the ntile window: sub-ulp cross-engine sum
             # noise must not reorder near-ties at a bucket boundary
             F.round(F.avg("__lp"), 6).alias("logprob"))
    )
    counts: dict = {}
    ranked = with_global_seq(
        scored, [F.col("logprob").desc(), F.col("id").asc()],
        seq_col="__rank", counts_out=counts,
    )
    total = int(counts.get("total", 0))
    if total == 0:
        return ranked.select(
            F.col("id").alias(id_col), "n_tokens", "logprob",
            F.lit(1).alias("bucket"),
        )
    q, r = divmod(total, n_buckets)
    big = q + 1  # buckets 1..r hold ceil(N/n) rows, the rest floor(N/n)
    k = F.col("__rank")
    if q == 0:  # fewer rows than buckets: one row per bucket
        bucket = (k + 1).cast("int")
    else:
        bucket = F.when(
            k < r * big, F.floor(k / F.lit(big)) + 1
        ).otherwise(
            F.lit(r) + F.floor((k - r * big) / F.lit(q)) + 1
        ).cast("int")
    return ranked.select(
        F.col("id").alias(id_col), "n_tokens", "logprob",
        bucket.alias("bucket"),
    )


def ngram_lm_score(
    df: DataFrame, train: DataFrame | None = None,
    id_col: str = "doc_id", text_col: str = "text", alpha: float = 0.4,
) -> DataFrame:
    """Trigram stupid-backoff LM score per document — the distributed
    form of CCNet's KenLM perplexity gate.

    CCNet (Wenzek et al. 2020) filters web text by the perplexity of a
    5-gram KenLM trained on Wikipedia; the binary KenLM is not available
    here, and Kneser-Ney's normalized discounts need multiple passes.
    Stupid backoff (Brants et al. 2007, "Large Language Models in Machine
    Translation") is the published web-scale answer: unnormalized relative
    frequencies with a fixed backoff multiplier,

        S(w | a b) = C(a b w)/C(a b)   if C(a b w) > 0
                   = alpha * S(w | b)  otherwise
        S(w | b)   = C(b w)/C(b)       if C(b w) > 0
                   = alpha * S(w)      otherwise
        S(w)       = C(w)/N            (OOV: 0.5/N pseudo-count)

    trained on MapReduce precisely because no step needs a global
    normalizer — counts and scoring distribute freely. ``train`` is the
    LM corpus (CCNet: Wikipedia); it defaults to ``df`` itself, which
    scores repetitive common-phrase docs high and rare-token docs low —
    the ordering the head/middle/tail buckets consume.

    Plan shape (3 shuffles total, none O(corpus^2)):
      1. ONE explode -> groupBy(gram) shuffle builds all three count
         orders at once (order-prefixed keys "1|w", "2|a b", "3|a b w");
         heavy hitters partial-aggregate map-side.
      2. Per-position backoff keys (tri/bi/uni + both contexts) are built
         WITHIN-ROW from the word array (zero shuffle), melted to
         (id, pos, role, key) rows, and resolved with ONE shuffle join
         against the counts — Brants' count-sharding by gram key — AQE
         broadcasts the count table when it fits.
      3. One groupBy(id, pos) folds the five roles back into a row, the
         backoff CASE picks the level, and a final groupBy(id) sums.

    Cross-engine determinism: each position's log-score is quantized to
    integer micro-nats (round(ln(S)*1e6) as BIGINT) BEFORE the per-doc
    sum, so the sum is order-independent and the DuckDB oracle replays
    it exactly; IEEE division/multiplication are bit-deterministic and
    ln() agreement holds at 1e-6 (same contract as unigram_logprob).

    Output: (id_col, n_scored, lp_micro, avg_logscore) — one row per doc
    with >= 1 token; avg_logscore = lp_micro / 1e6 / n_scored, rounded 6.
    """
    from context_crawler_spark.operators.ranking import alnum_words

    train = df if train is None else train
    a = float(alpha)

    # -- 1. count table: all orders, one shuffle ------------------------
    # r6: gram keys are order-TAGGED xxhash64 tuples (xxhash64(order, w…))
    # instead of "3|a b w" strings — no per-gram string allocation on
    # either side, and the count exchange plus the 5-roles-per-token
    # melted join below carry 8-byte longs instead of ~20-byte strings.
    # Tokens are alnum (no spaces), so tuple identity ≡ the old joined-
    # string identity and every count is unchanged (64-bit collision
    # caveat as everywhere else hash keys ride the wire).
    # tokenize each corpus ONCE: the count build, the n_total sum and the
    # scoring branch all hang off the same materialized (id, ws) table
    # (r6 — they used to re-run the tokenizer regex per branch)
    toks_df = df.select(F.col(id_col).alias("id"),
                        alnum_words(text_col).alias("ws")) \
        .localCheckpoint(eager=False)
    tw = toks_df.select("ws") if train is df \
        else train.select(alnum_words(text_col).alias("ws")) \
        .localCheckpoint(eager=False)
    n = F.col("ws")

    def gram_keys(size: int) -> Column:
        return F.transform(
            F.slice(n, 1, F.greatest(F.size(n) - size + 1, F.lit(0))),
            lambda _, i: F.xxhash64(
                F.lit(size), *[F.element_at(n, i + j + 1) for j in range(size)]),
        )

    grams = tw.select(F.explode(F.concat(
        gram_keys(1), gram_keys(2), gram_keys(3),
    )).alias("key"))
    counts = grams.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    # n_total = Σ unigram counts = total token count — computable without
    # the (now unhashable) "1|" key-prefix filter, same value
    total = tw.agg(
        F.coalesce(F.sum(F.size("ws")), F.lit(0)).cast("bigint")
        .alias("n_total"))

    # -- 2. per-position backoff keys, resolved by role lookups ---------
    docs = toks_df.filter(F.size("ws") >= 1)
    w = F.col("ws")

    def at(i_off):  # element i+1-off (1-based element_at), None-safe
        return lambda i: F.element_at(w, i + 1 - i_off)

    keyed = docs.select(
        "id",
        F.posexplode(F.transform(w, lambda _, i: F.struct(
            F.xxhash64(F.lit(1), at(0)(i)).alias("uni"),
            F.when(i >= 1, F.xxhash64(
                F.lit(1), at(1)(i))).alias("uni_ctx"),
            F.when(i >= 1, F.xxhash64(
                F.lit(2), at(1)(i), at(0)(i))).alias("bi"),
            F.when(i >= 2, F.xxhash64(
                F.lit(2), at(2)(i), at(1)(i))).alias("bi_ctx"),
            F.when(i >= 2, F.xxhash64(
                F.lit(3), at(2)(i), at(1)(i), at(0)(i))).alias("tri"),
        ))).alias("pos", "k"),
    )
    # r6: the old melt (5 (role, key) rows per position) + count join +
    # groupBy(id, pos) re-pivot pushed ~5 rows per token through an
    # exchange twice. The LM count table is vocabulary-sized — tiny next
    # to the corpus — so resolve each role with its own lookup join
    # against the SAME counts relation instead (AQE broadcasts it when it
    # fits → zero exchange on the token stream and no pivot at all; when
    # it doesn't, the 5 shuffle joins cost what the melt did). NULL role
    # keys (positions without that context) simply miss the left join,
    # exactly the rows the melt used to drop.
    roles = ["uni", "uni_ctx", "bi", "bi_ctx", "tri"]
    resolved = keyed
    for r in roles:
        cr = counts.select(F.col("key").alias(f"__k_{r}"),
                           F.col("cnt").alias(f"c_{r}"))
        resolved = resolved.join(
            cr, F.col(f"k.{r}") == F.col(f"__k_{r}"), "left"
        ).drop(f"__k_{r}")
    resolved = resolved.join(F.broadcast(total))

    # -- 3. backoff CASE + quantized per-doc fold -----------------------
    c = {r: F.col(f"c_{r}") for r in roles}
    lvl1 = F.coalesce(c["uni"].cast("double"), F.lit(0.5)) / F.col("n_total")
    lvl2 = F.when(c["bi"].isNotNull(),
                  c["bi"].cast("double") / c["uni_ctx"])
    lvl3 = F.when(c["tri"].isNotNull(),
                  c["tri"].cast("double") / c["bi_ctx"])
    s = F.when(
        F.col("pos") >= 2, F.coalesce(lvl3, a * F.coalesce(lvl2, a * lvl1)),
    ).when(F.col("pos") == 1, F.coalesce(lvl2, a * lvl1)).otherwise(lvl1)
    return (
        resolved.select(
            "id",
            F.round(F.log(s) * 1e6).cast("bigint").alias("__lp_micro"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_scored"),
             F.sum("__lp_micro").alias("lp_micro"))
        .select(
            F.col("id").alias(id_col), "n_scored", "lp_micro",
            # r6 fix (pre-existing r5 defect surfaced at sf0.1): DuckDB's
            # round(x, 6) computes round(x*1e6)/1e6 in IEEE doubles, and
            # the product can land EXACTLY on a .5 (doc 3444 at sf0.1:
            # -3.4255714999999998 * 1e6 == -3425571.5) where Spark's
            # decimal-string HALF_UP of x at scale 6 sees no tie and
            # rounds the other way. Replaying the oracle's exact op
            # sequence (multiply, scale-0 round, divide) is bit-identical
            # on every double: the scale-0 tie behaviors agree (both half
            # away from zero) and non-ties round identically.
            (F.round(F.col("lp_micro") / 1e6 / F.col("n_scored") * 1e6)
             / 1e6).alias("avg_logscore"),
        )
    )


def unigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Per-document unigram Shannon entropy + unique-word fraction — the
    RedPajama-v2 quality signals ``rps_doc_unigram_entropy`` and unique-
    word ratio (Together 2023; also a Gopher-adjacent repetition signal:
    low entropy == a few tokens dominate the doc).

    H = ln(n) - (sum over distinct words of c*ln(c)) / n, computed from
    per-(doc, word) counts: one explode -> groupBy(doc, word) shuffle
    (partial-aggregates map-side), then a per-doc fold. The per-word
    contribution quantizes to integer micro-nats BEFORE the per-doc sum
    (the ngram_lm contract) so the sum is order-independent and the
    DuckDB oracle replays it exactly.

    Output: (id_col, n_words, n_unique, unique_frac, entropy); docs with
    zero words emit no row."""
    from context_crawler_spark.operators.ranking import alnum_words

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(alnum_words(text_col)).alias("w"))
    wc = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        wc.groupBy("id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.round(F.col("c") * F.log("c") * 1e6).cast("bigint"))
            .alias("__clc_micro"),
        )
        .select(
            F.col("id").alias(id_col), "n_words", "n_unique",
            F.round(F.col("n_unique") / F.col("n_words"), 6)
            .alias("unique_frac"),
            F.round(
                F.log("n_words")
                - F.col("__clc_micro") / 1e6 / F.col("n_words"), 6)
            .alias("entropy"),
        )
    )
