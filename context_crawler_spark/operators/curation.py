"""Corpus-curation operators for LLM training-data pipelines.

The curation stages a 100 TB webtext corpus passes through between crawl
and tokenizer, each expressed as pure DataFrame plans (zero row-at-a-time
Python, shuffles only where the semantics force one):

  * eval-set decontamination — drop/flag training docs sharing word
    n-grams with a held-out benchmark set (Brown et al. 2020, GPT-3
    Appendix C; Dolma's decontamination pass). The eval gram set is tiny
    relative to the corpus, so it BROADCASTS: the 100 TB side is never
    shuffled, each doc is checked map-side.
  * PII redaction — email / IPv4 / phone scrubbing via JVM ``regexp_replace``
    chains (BigScience ROOTS / Dolma style). Zero shuffle, pure projection,
    whole-stage-codegen'd.
  * paragraph-level exact dedup — CCNet's first stage (Wenzek et al. 2020):
    documents are split into fixed word-count blocks, every block that
    appears earlier in the corpus (by ``(doc_id, block_idx)`` order) is
    dropped, survivors are reassembled in order. ONE shuffle on the block
    hash + one on doc_id for reassembly.
  * deterministic stratified sampling — per-stratum Bernoulli keep via an
    md5 hash threshold (CCNet's language rebalancing / quality-bucket
    downsampling). Unlike ``df.sample``, the decision is a pure function
    of the row key: reproducible across retries, resumes, and cluster
    sizes, and expressible in ANSI SQL for cross-engine audits.
  * temperature sampling — language rates DERIVED from corpus counts as
    ``p_l^alpha`` (XLM-R/mT5 rebalancing), then the same hash-threshold
    keep; counts partial-agg to ≤ #languages rows, corpus never shuffled.
  * sequence packing — GPT-style concat-then-chop layout of the tokenized
    corpus into fixed training windows, offsets computed by the
    distributed two-phase prefix scan (``ordering.with_running_sum``).

Reference parity note: the reference engine (temrb/context-crawler) stops
at per-URL dedup + extraction (src/core.ts:265,341); these operators are
the downstream-curation extension the task brief asks for, built on the
same documents schema its dataset sink emits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# PII patterns — the common Java-regex/RE2 subset (no lookaround), so the
# exact same pattern string runs JVM-side here and in the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _word_ngrams(words_col, n: int):
    """Word n-grams as a JVM higher-order expression over an ALIASED word
    array (never the raw split expression — CollapseProject would inline
    and re-evaluate it per gram; see repeated_ngram_spans)."""
    return F.when(
        F.size(words_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words_col) - (n - 1)),
            lambda i: F.array_join(F.slice(words_col, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with the
    evaluation set (GPT-3-style decontamination; their 13-gram window
    scales with tokenizer granularity — ``n`` is the knob).

    Plan shape at 100 TB: the eval side (benchmark suites are at most
    ~10^6 grams) is made distinct and BROADCAST; the training corpus is
    scanned once, grams built as within-row HOFs and deduplicated
    per-row with ``array_distinct`` BEFORE the explode, so the broadcast
    hash join probes distinct (doc, gram) pairs map-side. The only
    exchange is the groupBy on ``id_col`` over the *matched* rows —
    benchmark contamination is rare, so that shuffle is tiny by
    construction. The big side is never shuffled and never collected.

    Returns one row per training doc: total distinct grams, how many hit
    the eval set, and the contaminated flag.
    """
    ws = F.col("__ws")
    words = F.split(F.trim(F.col(text_col)), r"\s+")

    eval_grams = (
        eval_df.select(words.alias("__ws"))
        .select(F.explode(F.array_distinct(_word_ngrams(ws, n))).alias("gram"))
        .distinct()
    )

    # both branches build their gram expression in the projection
    # immediately after the __ws alias — an intermediate single-reference
    # gram-array alias gets inlined into the downstream Generate/Project
    # and re-evaluates per OUTPUT row (the CollapseProject disease; the
    # dsir_weights profile measured the alias-then-explode form 40x slower)
    aliased = train.select(F.col(id_col).alias("id"), words.alias("__ws"))
    totals = aliased.select(
        "id",
        F.size(F.array_distinct(_word_ngrams(ws, n))).cast("long").alias("n_grams"),
    )
    hits = (
        aliased.select(
            "id", F.explode(F.array_distinct(_word_ngrams(ws, n))).alias("gram")
        )
        .join(F.broadcast(eval_grams), "gram", "inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        totals.join(F.broadcast(hits), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Scrub emails, IPv4 addresses, and NANP-style phone numbers, counting
    each kind (counts are taken on the text as it looked when that pattern
    ran, i.e. after the previous redactions — mirrors the replacement
    semantics exactly).

    Pure zero-shuffle projection: three chained JVM ``regexp_replace`` +
    ``regexp_count`` pairs, each intermediate materialized as an aliased
    column so codegen evaluates every regex pass exactly once per row.
    """
    step1 = df.withColumn("__t1", F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"))
    step2 = step1.withColumn("__t2", F.regexp_replace(F.col("__t1"), IPV4_RE, "<IP>"))
    return (
        step2.withColumn(out_col, F.regexp_replace(F.col("__t2"), PHONE_RE, "<PHONE>"))
        .withColumn("n_emails", F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long"))
        .withColumn("n_ips", F.regexp_count(F.col("__t1"), F.lit(IPV4_RE)).cast("long"))
        .withColumn("n_phones", F.regexp_count(F.col("__t2"), F.lit(PHONE_RE)).cast("long"))
        .drop("__t1", "__t2")
    )


def paragraph_dedup(
    df: DataFrame,
    block_words: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_blocks: bool = True,
) -> DataFrame:
    """CCNet-style paragraph-level exact dedup (Wenzek et al. 2020 §3.1):
    split every document into consecutive ``block_words``-word blocks,
    keep only the corpus-FIRST occurrence of each distinct block (first =
    smallest ``(doc_id, block_idx)``), and reassemble each document from
    its surviving blocks in order.

    The corpus here carries no newline structure, so "paragraph" is a
    fixed word window — the dedup mechanics (block key -> first-occurrence
    winner -> in-order reassembly) are the real thing.

    Plan shape: block construction is within-row HOFs; ONE shuffle on the
    block key (xxhash64(block) by default — 8 bytes on the wire instead of
    a ~150-byte string; per-doc output is hash-invariant absent 64-bit
    collisions) to elect winners; one shuffle on ``id_col`` to reassemble.
    Nothing is O(corpus) on the driver.

    Returns one row per input doc: block count, surviving-block count, and
    the deduplicated text (empty string when every block lost).
    """
    B = block_words
    ws = F.col("__ws")
    blocks_arr = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(ws) - 1) / B).cast("int")),
        lambda k: F.array_join(F.slice(ws, k * B + 1, B), " "),
    )
    blocks = (
        df.select(F.col(id_col).alias("id"), F.split(F.trim(F.col(text_col)), r"\s+").alias("__ws"))
        .select("id", F.posexplode(blocks_arr).alias("idx", "block"))
    )
    key = F.xxhash64("block") if hash_blocks else F.col("block")
    keyed = blocks.withColumn("__k", key)
    winners = keyed.groupBy("__k").agg(F.min(F.struct("id", "idx")).alias("__w"))
    kept = (
        keyed.join(winners, "__k")
        .filter((F.col("id") == F.col("__w.id")) & (F.col("idx") == F.col("__w.idx")))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "block"))),
                    lambda s: s["block"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )
    # per-doc block count is pure arithmetic over the word count — this
    # scan never materializes the block strings (the winner/probe passes
    # above are the only ones that do)
    totals = df.select(
        F.col(id_col).alias("id"),
        (
            F.floor(
                (F.size(F.split(F.trim(F.col(text_col)), r"\s+")) - 1) / B
            ) + 1
        ).cast("long").alias("n_blocks"),
    )
    return (
        totals.join(kept, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_blocks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def host_template_removal(
    df: DataFrame,
    block_words: int = 25,
    min_pages: int = 2,
    ratio: float = 0.5,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    hash_blocks: bool = True,
) -> DataFrame:
    """Per-host template/boilerplate removal: a block that appears on at
    least ``min_pages`` DISTINCT pages of the same host AND on at least
    ``ratio`` of that host's pages is site furniture (nav, footer, cookie
    banner — the cross-page repetition signal of Gibson, Punera & Tomkins
    2005, "The Volume and Evolution of Web Page Templates"; the same
    per-site frequent-unit cut ships in Dolma's frequent-line filter) and
    is removed from EVERY page of that host.

    Complements ``paragraph_dedup`` (corpus-wide keep-FIRST): templates
    must vanish from the first page too, and a block shared across
    DIFFERENT hosts (a quote, a license header) is not a template and is
    kept everywhere. ``ratio`` gates hapax-pair coincidences on large
    sites; ``min_pages`` gates tiny sites where one repeat already
    clears any ratio.

    Plan shape (100 TB-safe): block construction is within-row HOFs; the
    (host, key, page) distinct and the (host, key) page-frequency agg ride
    ONE shuffle on the block key (xxhash64 by default — 8 bytes on the
    wire); per-host page totals are a separate tiny agg joined in (AQE
    broadcasts it); the template set anti-joins back on the SAME
    (host, key) partitioning; one final shuffle on ``id_col`` reassembles
    surviving blocks in order. Nothing is O(corpus) on the driver.

    Returns one row per input doc: host, block count, surviving count,
    and the cleaned text ('' when every block was template).
    """
    B = block_words
    ws = F.col("__ws")
    blocks_arr = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(ws) - 1) / B).cast("int")),
        lambda k: F.array_join(F.slice(ws, k * B + 1, B), " "),
    )
    blocks = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(host_col).alias("host"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__ws"),
        )
        .select("id", "host", F.posexplode(blocks_arr).alias("idx", "block"))
    )
    key = F.xxhash64("block") if hash_blocks else F.col("block")
    keyed = blocks.withColumn("__k", key)
    # distinct pages carrying each (host, block): a block repeated WITHIN
    # one page counts once — template-ness is a cross-page signal
    page_df = (
        keyed.select("host", "__k", "id")
        .distinct()
        .groupBy("host", "__k")
        .agg(F.count(F.lit(1)).alias("page_df"))
    )
    pages = (
        df.select(F.col(host_col).alias("host"), F.col(id_col).alias("id"))
        .distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    templates = (
        page_df.join(pages, "host")
        .filter(
            (F.col("page_df") >= F.lit(int(min_pages)))
            & (F.col("page_df").cast("double") / F.col("n_pages")
               >= F.lit(float(ratio)))
        )
        .select("host", "__k")
    )
    kept = (
        keyed.join(templates, ["host", "__k"], "left_anti")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "block"))),
                    lambda s: s["block"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.col(host_col).alias(host_col),
        (
            F.floor(
                (F.size(F.split(F.trim(F.col(text_col)), r"\s+")) - 1) / B
            ) + 1
        ).cast("long").alias("n_blocks"),
    )
    return (
        totals.join(kept, "id", "left")
        .select(
            F.col("id").alias(id_col),
            host_col,
            "n_blocks",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


def rate_threshold_hex(rate: float) -> str:
    """8-hex-digit keep threshold for a rate in [0, 1]: a row survives iff
    the first 8 md5 hex chars of its sampling key compare BELOW this
    string. Lowercase-hex strings of equal length order lexicographically
    exactly as their numeric values, so the comparison stays a plain
    VARCHAR ``<`` in any engine. rate >= 1.0 maps to 'zzzzzzzz' (above
    every hex string -> keep all)."""
    if rate >= 1.0:
        return "zzzzzzzz"
    if rate <= 0.0:
        return "00000000"
    return format(int(rate * 16**8), "08x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling: keep a row iff
    ``substr(md5(stratum || ':' || key), 1, 8) < threshold(stratum)``.

    This is CCNet's language/quality rebalancing as a pure filter: md5 of
    the row key is uniform, so each stratum keeps ~rate of its rows, and —
    unlike ``df.sample(fraction)`` / ``rand()`` — the kept SET is a pure
    function of the data: identical across task retries, resumes, AQE
    re-plans, and cluster sizes, and replayable in ANSI SQL for audits.
    Zero shuffle; the rates map is a plan-time literal.

    Returns the kept rows with their hex ``sample_key`` appended.
    """
    pairs: list = []
    for stratum, rate in sorted(rates.items()):
        pairs.extend([F.lit(stratum), F.lit(rate_threshold_hex(rate))])
    thr_map = F.create_map(*pairs) if pairs else F.create_map()
    hexkey = F.substring(
        F.md5(F.concat_ws(":", F.col(stratum_col), F.col(key_col).cast("string"))), 1, 8
    )
    thr = F.coalesce(
        thr_map[F.col(stratum_col)], F.lit(rate_threshold_hex(default_rate))
    )
    return (
        df.withColumn("sample_key", hexkey)
        .filter(F.col("sample_key") < thr)
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based multilingual rebalancing (Conneau et al. 2020
    XLM-R §3.1; mT5): with per-language corpus shares ``p_l``, sample
    languages proportionally to ``p_l^alpha`` — ``alpha < 1`` flattens the
    distribution so head languages are downsampled and tail languages keep
    (up to) everything. Target output size is ``budget_frac * N`` docs;
    each language's keep rate is ``min(1, T·q_l / n_l)`` with
    ``q_l = p_l^alpha / Σ p_m^alpha`` (a filter cannot upsample, so rates
    clamp at 1 and the realized total can undershoot the budget when tail
    languages saturate — the paper's regime too).

    Unlike :func:`stratified_sample` (caller supplies fixed rates), the
    rates here are DERIVED from the corpus counts inside the plan, so the
    whole stage — counts → pow/normalize → per-row hash threshold — is
    replayable in ANSI SQL. Keep decision is the same deterministic
    ``substr(md5(lang:key),1,8) < threshold`` filter: a pure function of
    the data, stable across retries/resumes/cluster sizes.

    Cross-engine exactness: rates round to 9 decimals BEFORE the
    threshold derivation (the ``change_rate`` contract — absorbs last-ulp
    ``pow`` differences), and the threshold is built from the rounded
    value by exact integer/hex steps (``floor(r·2^32)`` → 8-digit
    lower-hex, ``>= 1`` → ``'zzzzzzzz'`` which outsorts every hex key).

    Plan at 100 TB: the counts agg partial-aggregates map-side to
    ≤ #languages rows; two metadata-sized cross joins derive the rates;
    the corpus itself is NEVER shuffled — the ≤ #languages rate table
    broadcast-joins back onto the unshuffled scan (the ``domain_prior``
    shape).

    Output: kept rows' ``(key, stratum)`` + ``sample_key`` (hex) +
    ``keep_rate`` (the 9dp rate, for audit).
    """
    from pyspark.sql.functions import broadcast
    from pyspark.sql.window import Window

    # NULL strata (undetected language) are a real stratum, not rows to
    # drop: coalesce to a sentinel BEFORE both the counts agg and the
    # rates join (an equi-join never matches NULL==NULL, which would
    # silently vanish those docs — inconsistent with stratified_sample's
    # default_rate handling). The sentinel also feeds the hash key, so
    # the keep decision stays a pure function of (stratum, key).
    s = F.coalesce(F.col(stratum_col).cast("string"), F.lit("__null__"))
    counts = df.groupBy(s.alias("__s")).agg(
        F.count(F.lit(1)).cast("double").alias("__n"))
    # the unpartitioned windows below run over the COUNTS frame only
    # (≤ #languages rows — metadata-sized); the corpus never sees them
    everything = Window.partitionBy()
    w = counts.withColumn(
        "__tot", F.sum("__n").over(everything)
    ).withColumn(
        "__w", F.pow(F.col("__n") / F.col("__tot"), F.lit(float(alpha))))
    rates = (
        w.withColumn("__wsum", F.sum("__w").over(everything))
        .withColumn(
            "keep_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(budget_frac)) * F.col("__tot")
                    * (F.col("__w") / F.col("__wsum")) / F.col("__n")),
                9))
        .withColumn(
            "__thr",
            F.when(F.col("keep_rate") >= 1.0, F.lit("zzzzzzzz")).otherwise(
                F.lpad(
                    F.lower(F.hex(F.floor(
                        F.col("keep_rate") * F.lit(4294967296.0))
                        .cast("bigint"))),
                    8, "0")))
        .select("__s", "keep_rate", "__thr")
    )
    hexkey = F.substring(
        F.md5(F.concat_ws(":", s, F.col(key_col).cast("string"))), 1, 8)
    return (
        df.withColumn("sample_key", hexkey)
        .join(broadcast(rates), s == F.col("__s"))
        .filter(F.col("sample_key") < F.col("__thr"))
        .drop("__s", "__thr")
    )


def pack_sequences(
    df: DataFrame,
    window_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-then-chop sequence packing: documents are laid out
    end-to-end in deterministic ``id_col`` order and chopped into fixed
    ``window_tokens`` training sequences. Per doc, emits its whitespace
    token count, its global token offset, the training sequence its first
    token lands in, and whether it straddles a window boundary (the rows a
    boundary-aware loader would re-pack or mask).

    The global offset is the distributed two-phase prefix scan
    (``ordering.with_running_sum``): range-partition on the order key, one
    per-partition subtotal to the driver (a handful of longs), then a
    per-partition cumsum — NEVER a single-partition global window, so the
    layout of a 10^10-doc corpus is still computed at full parallelism.
    Offsets stay < 2^53 (one quadrillion tokens) so the floor-divisions
    below are exact in both engines.
    """
    from .ordering import with_running_sum

    toks = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("n_tokens"),
    )
    laid = with_running_sum(toks, ["id"], "n_tokens", out_col="offset")
    W = window_tokens
    first_w = F.floor(F.col("offset") / W)
    last_w = F.floor((F.col("offset") + F.col("n_tokens") - 1) / W)
    return laid.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "offset",
        first_w.cast("long").alias("seq_id"),
        (last_w > first_w).alias("crosses_boundary"),
    )


def host_suffixes(host_col):
    """All dot-suffix domains of a host as a JVM array expression:
    ``a.b.example.com`` -> [a.b.example.com, b.example.com, example.com,
    com]. Built with sequence+slice HOFs — no explode, no Python."""
    host = F.col(host_col) if isinstance(host_col, str) else host_col
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels) - i + 1), "."),
    )


def url_filter(
    df: DataFrame,
    blocked_domains: list[str],
    word_weights: dict[str, float],
    threshold: float = 1.0,
    url_col: str = "url",
) -> DataFrame:
    """RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1; Dolma's
    URL taggers): drop a page if its host falls under any blocked domain
    (suffix match, so ``ads.example.com`` is caught by ``example.com``)
    or if the weighted sum of banned words appearing in the URL reaches
    ``threshold``.

    Plan shape at 100 TB: everything is a zero-shuffle projection.
    The blocklist and word weights are plan-time literals — RefinedWeb's
    real blocklist (4.6M domains) would instead broadcast-semi-join the
    exploded ``host_suffixes`` against a blocklist table (same semantics,
    one broadcast, still no corpus shuffle); this literal path is the
    config-sized variant the tests and oracle replay exactly. Matching is
    on the lowercased URL, as in the reference implementations.

    Output: one row per input URL with ``host``, ``domain_blocked``,
    ``word_score`` (rounded 4 dp), and the final ``keep`` verdict.
    """
    url = F.lower(F.col(url_col))
    host = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    blocked_lit = F.array(*[F.lit(d.lower()) for d in sorted(blocked_domains)])
    domain_blocked = F.arrays_overlap(host_suffixes(host), blocked_lit)
    score = None
    for w, wt in sorted(word_weights.items()):
        term = F.when(url.contains(w.lower()), F.lit(float(wt))).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    if score is None:
        score = F.lit(0.0)
    word_score = F.round(score, 4)
    return df.select(
        "*",
        host.alias("host"),
        domain_blocked.alias("domain_blocked"),
        word_score.alias("word_score"),
        (~domain_blocked & (word_score < F.lit(float(threshold)))).alias("keep"),
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023: Data Selection
    for Language Models via Importance Resampling): score every corpus
    document by how much more likely its hashed n-gram features are under
    a small in-domain *target* sample than under the raw corpus, i.e.
    ``sum_g [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]`` over the
    doc's unigrams+bigrams. High-weight docs are then kept by the
    deterministic sampler (``stratified_sample``) — DSIR's resampling
    step — so the pair reproduces the paper's pipeline end to end.

    Feature hashing: bucket(g) = first 3 hex chars of md5(g) — 4096
    uniform buckets with NO modulo, so the identical bucketing runs in
    any engine that has md5 (the DuckDB oracle replays it verbatim).
    Laplace smoothing ``alpha`` over the full 4096-bucket space keeps
    unseen buckets finite.

    Plan shape at 100 TB: the two distribution estimates partial-aggregate
    map-side down to <=4096 rows each (a groupBy whose exchange carries
    kilobytes); the per-bucket log-ratio table is tiny and BROADCAST back
    onto the exploded corpus grams; the only data-sized exchange is the
    final groupBy on ``id_col``. The corpus is scanned twice (once for the
    raw distribution, once for scoring) — at 10^10 docs you'd persist the
    gram projection or estimate p_raw on a hash-sample; both knobs are
    orthogonal to this plan.

    Output: one row per corpus doc — ``n_feats`` (gram occurrences,
    counted WITH multiplicity per the paper's bag-of-ngrams model) and
    ``dsir_weight`` rounded 6 dp (sub-ulp cross-engine ln/sum noise is
    below that; same rounding contract as unigram_logprob).
    """
    B = 4096

    def grams_of(df: DataFrame, keep_id: bool) -> DataFrame:
        # explode in the projection immediately after the words alias: an
        # intermediate single-reference `grams` alias gets inlined into the
        # Generate and profiled 40x slower (85 us/gram) — the CollapseProject
        # re-evaluation disease, third sighting (see repeated_ngram_spans)
        words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        base = df.select(
            (F.col(id_col) if keep_id else F.lit(0)).alias("id"),
            words.alias("words"),
        )
        w = F.col("words")
        return base.select(
            "id",
            F.explode(F.concat(_word_ngrams(w, 1), _word_ngrams(w, 2))).alias("gram"),
        ).select("id", F.substring(F.md5("gram"), 1, 3).alias("bucket"))

    # The two distributions collapse to <=4096 rows each — collect them and
    # finish the ratio table driver-side (metadata-sized, like the bloom
    # bucket ids and IVF partials elsewhere). Building it as a lazy
    # dists->totals->ratio DataFrame chain instead re-executes the whole
    # gram pipeline once per downstream reference (no persist in a pure
    # operator), which profiled ~5 redundant corpus scans.
    import math

    raw_cnt = {
        r["bucket"]: r["cnt"]
        for r in grams_of(corpus, keep_id=False)
        .groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    tgt_cnt = {
        r["bucket"]: r["cnt"]
        for r in grams_of(target, keep_id=False)
        .groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    a = float(alpha)
    raw_tot = float(sum(raw_cnt.values()))
    tgt_tot = float(sum(tgt_cnt.values()))
    spark = corpus.sparkSession
    ratio = spark.createDataFrame(
        [
            (
                b,
                math.log((tgt_cnt.get(b, 0) + a) / (tgt_tot + a * B))
                - math.log((raw_cnt.get(b, 0) + a) / (raw_tot + a * B)),
            )
            for b in sorted(set(raw_cnt) | set(tgt_cnt))
        ],
        "bucket string, lr double",
    )
    doc_grams = grams_of(corpus, keep_id=True)
    return (
        doc_grams.join(F.broadcast(ratio), "bucket", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.round(F.sum("lr"), 6).alias("dsir_weight"),
        )
        .select(F.col("id").alias(id_col), "n_feats", "dsir_weight")
    )


def domain_prior(
    docs: DataFrame,
    host_col: str = "host",
    score_col: str = "score",
    min_docs: int = 3,
    keep_threshold: float = 0.0,
) -> DataFrame:
    """Domain-level quality prior + filter (RefinedWeb §3.1 / DCLM domain
    curation): a host whose documents are on average junk is junk — per
    registered host, aggregate its docs' quality scores, then join the
    prior back onto every doc and keep docs whose host clears
    ``keep_threshold`` (hosts with fewer than ``min_docs`` docs keep a
    neutral NULL prior and pass — too little evidence to damn a domain).

    Output: every input row + ``host_docs``, ``host_prior`` (mean score,
    6dp; NULL below min_docs), ``keep``.

    Plan at 100 TB: the per-host agg partial-aggregates map-side to ≤
    #hosts rows (~10^7 for the web — broadcastable), so the corpus itself
    is NEVER shuffled: one small agg exchange, then a broadcast hash join
    back onto the unshuffled corpus scan."""
    from pyspark.sql.functions import broadcast

    host = F.col(host_col)
    agg = (
        docs.groupBy(host.alias("__h"))
        .agg(
            F.count(F.lit(1)).alias("host_docs"),
            F.round(F.avg(F.col(score_col).cast("double")), 6)
            .alias("__prior"),
        )
        .withColumn(
            "host_prior",
            F.when(F.col("host_docs") >= min_docs, F.col("__prior")),
        )
        .drop("__prior")
    )
    joined = docs.join(broadcast(agg), host == F.col("__h")).drop("__h")
    return joined.withColumn(
        "keep",
        F.col("host_prior").isNull()
        | (F.col("host_prior") >= keep_threshold),
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, int],
    total_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture assembly (the Pile / Dolma "data mixture" stage):
    split a token budget across sources by relative weight, then take each
    source's documents in deterministic ``id_col`` order until its share
    fills. A document is selected only if it fits ENTIRELY within its
    source's remaining budget (no mid-document cuts — sequence packing
    handles intra-doc layout downstream).

    ``weights`` are relative INTEGER parts (how mixes are configured in
    practice), so each source's budget is exact integer arithmetic —
    ``total_tokens * w // Σw`` — and bit-identical in the SQL oracle.
    Sources absent from ``weights`` get budget 0.

    Plan shape at 100 TB: ONE distributed prefix scan ordered by
    ``(source, id)`` (ordering.with_running_sum — range-sort + per-
    partition offsets, parallelism scales with the cluster), NEVER a
    per-source window: ``Window.partitionBy(source)`` would funnel each
    source — and a 90%-weight source is the common case — through one
    task. Per-source start offsets come from a metadata-sized agg
    (≤ #sources rows) collected and re-injected as a plan-time literal
    map, so the corpus-sized side is touched exactly twice (totals agg +
    scan), shuffled once.

    Returns one row per doc: ``n_tokens``, ``cum_before`` (tokens of
    earlier same-source docs), ``budget`` (the source's share), and
    ``selected``.
    """
    from .ordering import with_running_sum

    wsum = sum(int(w) for w in weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive integer")
    budgets = {s: (int(total_tokens) * int(w)) // wsum
               for s, w in weights.items()}

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long").alias("n_tokens"),
    )
    totals = {
        r["source"]: int(r["t"] or 0)
        for r in base.groupBy("source")
        .agg(F.sum("n_tokens").alias("t")).collect()
    }
    starts: dict[str, int] = {}
    acc = 0
    for s in sorted(totals):  # lexicographic == the scan's string order
        starts[s] = acc
        acc += totals[s]

    scanned = with_running_sum(
        base, [F.col("source"), F.col("id")], "n_tokens", "__g_before"
    )
    start_map = F.create_map(
        *[F.lit(x) for s in sorted(starts) for x in (s, starts[s])]
    )
    budget_map = F.create_map(
        *[F.lit(x) for s in sorted(budgets) for x in (s, int(budgets[s]))]
    )
    cum_before = (F.col("__g_before") - start_map[F.col("source")]).cast("long")
    budget = F.coalesce(budget_map[F.col("source")], F.lit(0)).cast("long")
    return scanned.select(
        F.col("id").alias(id_col),
        "source",
        "n_tokens",
        cum_before.alias("cum_before"),
        budget.alias("budget"),
        (cum_before + F.col("n_tokens") <= budget).alias("selected"),
    )


def shuffle_shard(
    df: DataFrame,
    seed: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle + contiguous sharding.

    Training pipelines need the corpus in a SHUFFLED but REPRODUCIBLE
    order (T5 / GPT-3 data loaders shuffle once at preparation time, and
    every rerun — retry, resume, different cluster size — must yield the
    same order or experiments aren't comparable). ``df.orderBy(rand())``
    fails that; this is the standard keyed shuffle: order by
    ``md5(seed:id)``, which is uniform, so the induced permutation is
    pseudorandom yet a pure function of (seed, data).

    The global position comes from the distributed two-phase scan
    (``ordering.with_global_seq``): range-partition on the hash key, one
    metadata-sized per-partition count to the driver, then a narrow
    JVM-side stamp — NEVER a single-partition ``row_number() OVER ()``,
    so a 10^10-doc corpus is laid out at full parallelism. Shards are
    contiguous position chunks, ``shard = pos * n_shards // total``:
    balanced to ±1 row by construction with zero extra shuffle (the
    range layout already clusters positions), unlike ``pmod(hash)``
    sharding which needs a second exchange to make shards contiguous
    files. Reference parity: the reference has no trainer-facing layout
    step (its dataset sink stops at insertion order, src/core.ts:341);
    this is downstream-pipeline surface the brief asks for.
    """
    from .ordering import with_global_seq

    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    counts: dict = {}
    laid = with_global_seq(
        df.withColumn("shuffle_key", key),
        [F.col("shuffle_key"), F.col(id_col)],
        seq_col="pos",
        counts_out=counts,
    )
    total = int(counts.get("total", 0))
    if total == 0:
        return laid.withColumn("shard", F.lit(0))
    # exact integer math, replayable in ANSI SQL: pos*n < 2^63 for any
    # corpus below ~5*10^17 docs
    return laid.withColumn(
        "shard", (F.col("pos") * n_shards / F.lit(total)).cast("long")
    )


# fasttext-style hashed-linear quality classifier ---------------------------
#
# DCLM (Li et al. 2024) and FineWeb-Edu (Penedo et al. 2024) both gate the
# corpus with a cheap linear text classifier: hash each token into a fixed
# bucket space, average the bucket weights, squash. The MODEL here is a
# deterministic hash-derived weight table (a stand-in — real deployments
# drop in trained weights as a plan-time array literal, same plan shape);
# the PLAN is the real thing: tokenize -> hash -> lookup -> mean -> sigmoid
# as pure JVM higher-order expressions, zero Python, zero shuffle.

CLASSIFIER_BUCKETS = 256
_HEX = "0123456789abcdef"


def _bucket_expr(word):
    """Bucket id 0..255 from the first two md5 hex digits of the word —
    pure instr/substr arithmetic so the DuckDB oracle replays it
    byte-for-byte (no hex->int cast portability trap)."""
    h = F.md5(word)
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return d1 * 16 + d2


def classifier_score(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality gate (DCLM / FineWeb-Edu stage): per document,
    hashed-bag-of-words linear score ``sigmoid(mean_w weight[bucket(w)])``
    and a keep flag at ``threshold``.

    weight[b] = ((b*2654435761) mod 1001)/500 - 1  — a fixed pseudo-random
    table in [-1, 1] (Knuth multiplicative constant), integer-exact in any
    engine; swapping in trained weights is a one-literal change. The fold
    accumulates the INTEGER table values (order-independent, exact in any
    engine) and converts to float in one final expression; mean and score
    are rounded to 6 dp before comparison/output so a last-ulp ``exp``
    difference can't flip the hash or the keep decision.
    """
    # array_remove instead of an interpreted filter() lambda (r6, the
    # alnum_words rationale): a run-pattern split can only produce empty
    # fragments at the two ends
    df = df.withColumn(
        "__words",
        F.array_remove(
            F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9']+"), ""),
    )
    wsum = F.aggregate(
        F.col("__words"),
        F.lit(0).cast("long"),
        lambda acc, w: acc + (_bucket_expr(w) * F.lit(2654435761)) % 1001,
    )
    # materialize the md5-per-word fold and its derived mean/score as
    # COLUMNS before fanning out to mean_weight/score/keep: an alias
    # referenced more than once is not inlined by CollapseProject, while
    # referencing the raw fold expression from three output columns
    # re-ran the whole per-word md5 fold 3× per row — codegen
    # subexpression elimination skips trees containing lambda variables
    # (the gopher_repetition rule (a); r6, measured ~3× on this operator)
    n = F.size("__words")
    df = df.withColumn("__n", n)
    # the n>0 guard lives INSIDE the materialized column (If branches are
    # lazily evaluated) so empty docs don't hit ANSI DIVIDE_BY_ZERO; the
    # null then propagates through __score and is coalesced in `keep`
    df = df.withColumn(
        "__mean",
        F.when(
            F.col("__n") > 0,
            F.round(wsum.cast("double") / (500.0 * F.col("__n")) - 1.0, 6)))
    df = df.withColumn(
        "__score",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__mean"))), 6))
    return df.select(
        F.col(id_col),
        F.col("__n").alias("n_words"),
        F.col("__mean").alias("mean_weight"),
        F.col("__score").alias("score"),
        F.coalesce(F.col("__score") >= threshold, F.lit(False)).alias("keep"),
    )


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode + whitespace normalization — the cleaning pass CCNet/Dolma
    run before any hashing or dedup, because 'café' composed and 'café'
    with a combining accent are different byte strings to every
    fingerprint downstream.

    Steps (order matters, each a pure projection — zero shuffle):
      1. NFC composition (Arrow-batched pandas UDF — Spark has no JVM
         normalizer built-in; one Python crossing per batch, vectorized);
      2. strip C0/DEL control chars except \\n and \\t (JVM regex);
      3. collapse 3+ newlines to a paragraph break, runs of spaces/tabs
         to one space; trim.

    Patterns use the Java-regex/RE2 common subset so the DuckDB oracle
    runs the identical strings (with its 'g' flag).
    """
    from ..functions.udfs import nfc_normalize_udf

    nfc = nfc_normalize_udf(F.col(text_col))
    cleaned = F.regexp_replace(
        nfc, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
    )
    cleaned = F.regexp_replace(cleaned, "\\n{3,}", "\n\n")
    cleaned = F.regexp_replace(cleaned, "[ \\t]+", " ")
    cleaned = F.trim(cleaned)
    return df.select(
        "*",
        cleaned.alias("text_norm"),
        (cleaned != F.col(text_col)).alias("changed"),
        F.length(text_col).alias("n_chars_before"),
        F.length(cleaned).alias("n_chars_after"),
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    host_col: str = "host",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Per-domain document cap — keep at most ``cap`` docs per host,
    preferring high ``order_col`` (id ascending on ties).

    The FineWeb/Dolma balance step: after global dedup a handful of hosts
    (forums, wikis, doc mirrors) still dominate the token count; capping
    per registered domain bounds any single host's contribution before
    mixture assembly (RefinedWeb §3.4 caps URLs per domain the same way).

    Plan shape — skew-safe two-phase top-k, NOT one global window: a
    single ``row_number() OVER (PARTITION BY host)`` drags every row of a
    10^8-doc megahost through ONE task. Phase 1 ranks within
    (host, salt = pmod(xxhash64(id), n_salts)) and keeps ``cap`` rows per
    salt — after this no host holds more than n_salts*cap rows. Phase 2
    re-ranks the survivors per host exactly. Both phases shuffle only
    (host,salt)-bounded groups; the phase-2 input is O(#hosts * cap).

    Output: the kept rows with ``domain_rank`` (1-based within host).
    The result is EXACTLY what the naive one-window form produces —
    phase 1 can only evict rows ranked > cap within their salt, which
    are ranked > cap within the whole host a fortiori.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    salted = docs.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
    w1 = Window.partitionBy(host_col, "__salt").orderBy(*order)
    pre = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= cap).drop("__r1")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        pre.withColumn("domain_rank", F.row_number().over(w2))
        .filter(F.col("domain_rank") <= cap)
        .drop("__salt")
    )


def quantile_gate(
    docs: DataFrame,
    keep_frac: float,
    score_col: str = "score",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    k: int | None = None,
) -> DataFrame:
    """Keep EXACTLY the global top ``ceil(keep_frac * n)`` rows by
    ``(score desc, id asc)`` — the corpus-selection step of DCLM /
    FineWeb-Edu ("keep the top X% by classifier score"), computed without
    a global sort of the corpus.

    A naive ``row_number() OVER (ORDER BY score DESC)`` is a
    SinglePartition global window — every row of a 100 TB corpus through
    one task. The percentile-threshold shortcut (``score >=
    approx_percentile(...)``) is neither exact nor deterministic. This is
    the exact distributed selection plan instead:

      1. one agg → (n, min, max): three driver scalars.
      2. one partial-agg histogram over ``n_buckets`` equal-width score
         buckets → ≤ n_buckets rows to the driver (metadata-sized, same
         audited-collect class as dsir_weights' 4096-row dists). Walking
         it from the top finds the boundary bucket: everything in higher
         buckets is kept outright (bucketing is monotone in score, so
         higher bucket ⇒ strictly higher score), and only the boundary
         bucket — expected n / n_buckets rows — needs exact ranking.
      3. the boundary bucket alone goes through the distributed
         range-sort rank (``ordering.with_global_seq``: repartitionByRange
         + in-partition sort + JVM seq stamping, no SinglePartition), and
         the top ``k - |kept outright|`` of it by (score desc, id asc)
         join the keep set.

    Degenerate corpora (all scores equal, or pathological ties flooding
    one bucket) degrade gracefully: the boundary set grows up to n and
    the plan becomes one full range-sort — the same cost the naive exact
    form pays ALWAYS.

    Output: the kept input rows, original columns, exactly k of them.
    Ties at the cut are broken by ``id asc`` — a total order, so the
    result is bit-stable across retries, partitionings, and cluster
    sizes, and replayable as ANSI SQL (the contract oracle's
    ``row_number() OVER (ORDER BY score DESC, id ASC) <= ceil(f*n)``).
    """
    import math

    from .ordering import with_global_seq

    score = F.col(score_col).cast("double")
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(score).alias("lo"),
        F.max(score).alias("hi"),
    ).collect()[0]
    n, lo, hi = int(stats["n"]), stats["lo"], stats["hi"]
    # explicit k (exact_sample's path) sidesteps ceil(frac*n) float slop
    k = min(max(int(math.ceil(keep_frac * n)) if k is None else k, 0), n)
    if n == 0 or k == 0:
        return docs.limit(0)
    if k >= n:
        return docs

    if lo == hi:
        # all scores tied — the boundary IS the corpus; pure id-rank.
        ranked = with_global_seq(docs, [F.col(id_col).asc()], seq_col="__seq")
        return ranked.filter(F.col("__seq") < k).drop("__seq")

    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.floor((score - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_buckets - 1),
    )
    hist = {
        int(r["b"]): int(r["cnt"])
        for r in docs.groupBy(bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    cum = 0
    tb = 0
    for b in sorted(hist, reverse=True):
        if cum + hist[b] >= k:
            tb = b
            break
        cum += hist[b]
    need = k - cum

    above = docs.filter(bucket > tb)
    boundary = docs.filter(bucket == tb)
    picked = (
        with_global_seq(
            boundary,
            [score.desc(), F.col(id_col).asc()],
            seq_col="__seq",
        )
        .filter(F.col("__seq") < need)
        .drop("__seq")
    )
    return above.unionByName(picked)


def stratified_quantile_gate(
    docs: DataFrame,
    keep_frac: float,
    stratum_col: str = "lang",
    score_col: str = "score",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-stratum exact top-``ceil(keep_frac * n_s)`` selection by
    ``(score desc, id asc)`` — the CCNet / FineWeb per-LANGUAGE quality
    cut (one threshold per language, not one global threshold, so
    low-resource languages aren't wiped out by a quality model biased
    toward English).

    Same exact-selection guarantee as ``quantile_gate``, same refusal to
    use stratum-partitioned global windows (a `PARTITION BY lang ORDER BY
    score` window drags ALL of English through one task). Plan:

      1. per-stratum (n, lo, hi): one groupBy → #strata rows (driver;
         strata are languages/buckets — bounded, the same audited-collect
         class as temperature_sample's rate table).
      2. per-stratum equal-width histogram: one groupBy(stratum, bucket)
         → ≤ #strata × n_buckets rows; walked per stratum for the
         boundary bucket.
      3. rows above their stratum's boundary keep outright (broadcast
         join on the #strata threshold table); ONLY the union of boundary
         buckets goes through ONE ``with_global_seq`` ordered by
         (stratum, score desc, id asc) — per-stratum rank is then
         ``seq − min(seq) over the stratum`` via one more #strata-row
         agg, so no window ever sees a whole stratum.

    NULL strata select at their own rate under the ``__null__`` sentinel
    (the temperature_sample NULL-vanish fix, applied from day one here).

    Output: kept rows, original columns. Deterministic: the per-stratum
    (score desc, id asc) order is total.
    """
    import math

    from .ordering import with_global_seq

    score = F.col(score_col).cast("double")
    skey = F.coalesce(F.col(stratum_col).cast("string"), F.lit("__null__"))
    d = docs.withColumn("__s", skey)

    stats = {
        r["__s"]: (int(r["n"]), r["lo"], r["hi"])
        for r in d.groupBy("__s")
        .agg(F.count(F.lit(1)).alias("n"),
             F.min(score).alias("lo"), F.max(score).alias("hi"))
        .collect()
    }
    spark = docs.sparkSession
    k = {s: min(max(int(math.ceil(keep_frac * n)), 0), n)
         for s, (n, _, _) in stats.items()}
    # strata where everything (or nothing) is kept never need ranking
    full = [s for s in stats if k[s] >= stats[s][0]]
    none = [s for s in stats if k[s] == 0]
    active = [s for s in stats
              if s not in set(full) | set(none)]
    if not active:
        if not full:
            return d.limit(0).drop("__s")
        return d.filter(F.col("__s").isin(full)).drop("__s")

    # per-stratum bucket edges; all-tied strata get width=None → the
    # whole stratum is its own boundary bucket 0
    edges = [(s, float(stats[s][1]),
              (stats[s][2] - stats[s][1]) / n_buckets
              if stats[s][2] > stats[s][1] else None)
             for s in active]
    edge_df = F.broadcast(spark.createDataFrame(
        [(s, lo, w) for s, lo, w in edges], "__s string, __lo double, __w double"))
    act = d.join(edge_df, "__s")
    bucket = F.when(
        F.col("__w").isNull(), F.lit(0)
    ).otherwise(
        F.least(F.floor((score - F.col("__lo")) / F.col("__w")).cast("int"),
                F.lit(n_buckets - 1)))
    hist: dict[str, dict[int, int]] = {}
    for r in (act.groupBy("__s", bucket.alias("b"))
              .agg(F.count(F.lit(1)).alias("cnt")).collect()):
        hist.setdefault(r["__s"], {})[int(r["b"])] = int(r["cnt"])
    thr = []  # (stratum, boundary bucket, rows still needed from it)
    for s in active:
        cum = 0
        tb = 0
        for b in sorted(hist[s], reverse=True):
            if cum + hist[s][b] >= k[s]:
                tb = b
                break
            cum += hist[s][b]
        thr.append((s, tb, k[s] - cum))
    thr_df = F.broadcast(spark.createDataFrame(
        thr, "__s string, __tb int, __need long"))
    actb = act.join(thr_df, "__s").withColumn("__b", bucket)
    above = actb.filter(F.col("__b") > F.col("__tb"))
    boundary = actb.filter(F.col("__b") == F.col("__tb"))
    seqd = with_global_seq(
        boundary,
        [F.col("__s").asc(), score.desc(), F.col(id_col).asc()],
        seq_col="__seq",
    )
    base = F.broadcast(
        seqd.groupBy("__s").agg(F.min("__seq").alias("__base")))
    picked = (
        seqd.join(base, "__s")
        .filter(F.col("__seq") - F.col("__base") < F.col("__need"))
    )
    drop = ["__s", "__lo", "__w", "__tb", "__need", "__b", "__seq", "__base"]
    out = above.drop(*drop).unionByName(picked.drop(*drop))
    if full:
        out = out.unionByName(d.filter(F.col("__s").isin(full)).drop("__s"))
    return out


def exact_sample(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    seed: int = 0,
    score: Column | None = None,
) -> DataFrame:
    """EXACTLY ``n`` rows, uniformly and deterministically: rank rows by
    ``xxhash64(id, seed)`` and keep the smallest n via the same
    histogram-prune selection as ``quantile_gate`` (hash scores are
    uniform, so the boundary bucket is provably ~n_rows/n_buckets — the
    degenerate tie-flood case cannot occur absent 64-bit collisions).

    ``df.sample(fraction)`` returns a BINOMIAL row count and changes
    membership with partitioning; this is the audit-sample/holdout
    primitive: same n, same rows, any cluster size, any retry.

    ``score`` overrides the ranking key (rows with the LARGEST score are
    kept; ties break by ``id_col`` asc). The default xxhash64 key has no
    DuckDB twin, so the ``exact_sample`` contract query passes an
    md5-derived 52-bit numeric key both engines compute bit-identically
    — the selection machinery itself is value-hash-oracled there, while
    the shipped xxhash64 default is pinned by pytest determinism/size/
    disjointness tests.
    """
    if n <= 0:
        return docs.limit(0)
    if score is None:
        score = -F.xxhash64(F.col(id_col), F.lit(seed)).cast("double")
    scored = docs.withColumn("__hs", score.cast("double"))
    total = docs.count()
    if n >= total:
        return docs
    return quantile_gate(
        scored, 0.0, score_col="__hs", id_col=id_col, k=n
    ).drop("__hs")
