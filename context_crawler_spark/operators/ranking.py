"""Lexical ranking and link-graph scoring: BM25 top-k and PageRank.

The reference's search endpoint is vector-only (reference
src/llm-service.ts:216-239 — HNSW similaritySearch over the artifact
chunks); production retrieval stacks pair that dense leg with a lexical
BM25 leg (hybrid retrieval). ``bm25_topk`` is that leg, expressed so the
expensive parts never materialize: the posting explode is filtered to the
query's terms BEFORE the shuffle, so the exchanged rows are
O(docs_containing_query_terms), not O(total_tokens) — at 100 TB the
shuffle carries only the postings of a handful of terms, and the
df/corpus-stat sides are scalar/broadcast joins.

``pagerank`` scores the crawl link graph for frontier prioritization
(classic crawl-ordering signal — Page et al. 1999; Cho/Garcia-Molina/Page
"Efficient crawling through URL ordering", WWW 1998). Fixed-iteration
synchronous power method: each iteration is ONE shuffle keyed on dst plus
a broadcast-size agg; lineage is cut per iteration exactly like
connected_components (operators/text_dedup.py) so 10+ iterations don't
stack an unbounded plan. Dangling-node mass is NOT redistributed (ranks
sum to < 1 when sinks exist); that choice is documented here and mirrored
exactly by the DuckDB oracle.

Both operators tokenize/aggregate with pure JVM built-ins — no Python in
the per-row path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def alnum_words(col: Column | str) -> Column:
    """Lowercased alphanumeric word array — the shared, SQL-replicable
    tokenizer for ranking/quality/span operators (DuckDB mirror:
    ``list_filter(string_split(lower(regexp_replace(t,'[^A-Za-z0-9]+',
    ' ','g')),' '), w -> w != '')``)."""
    t = F.col(col) if isinstance(col, str) else col
    # r6 form — same token array for EVERY input, ~3x faster (profiled
    # 2.1 s -> 0.7 s over 50k docs at sf1.0). Two effects:
    # (a) Java regex evaluates the 3-range class [^A-Za-z0-9]+ ~7x
    #     slower than the 2-range [^a-z0-9]+; replacing non-ASCII with
    #     spaces FIRST (1-range class, fast) makes lower() operate on
    #     pure ASCII, where lowercasing commutes with the class swap —
    #     every non-ASCII char is non-alnum under the original class, so
    #     per-char spacing before run-collapse splits identically.
    # (b) array_remove replaces the interpreted filter() lambda: the
    #     collapse leaves empty fragments only at the two ends (and
    #     split("") == [""]), and array_remove drops exactly those while
    #     keeping the projection codegen'd. NULL propagates either way.
    return F.array_remove(
        F.split(
            F.regexp_replace(
                F.lower(F.regexp_replace(t, r"[^\x00-\x7F]", " ")),
                r"[^a-z0-9]+", " "),
            " "),
        "")


def tokenize_query(query: str) -> list[str]:
    """Driver-side twin of :func:`alnum_words` for the (tiny) query string."""
    return sorted({w for w in re.sub(r"[^A-Za-z0-9]+", " ", query.lower()).split() if w})


def let1(expr: Column, fn) -> Column:
    """Poor-man's ``let``: evaluate ``expr`` ONCE per row and bind the
    value as a higher-order-function lambda variable —
    ``transform(array(expr), fn)[1]``.

    Why this exists: two Catalyst rewrites substitute an alias's
    DEFINITION into its references — CollapseProject (when the alias is
    referenced once, the winnowing case) and predicate/expression
    pushdown (which substitutes regardless of cost, the phrase-search
    case: the ``phrase_tf > 0`` filter pushed below the tokenize
    projection). Common-subexpression elimination does NOT reach inside
    HOF lambdas, so once the expensive expression (a tokenizer regex, a
    gram-hash array) lands inside a ``filter(sequence(...))`` fold it
    re-executes once PER ELEMENT per row. Binding through a 1-element
    array makes the inner references hit the lambda variable instead.
    Measured on the phrase-search scan: 13.7 s → 0.5 s at sf0.1 (the
    regex was running ~2×windows times per document)."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def term_counts(ws: Column) -> Column:
    """Per-row ``array<struct<term,tf>>`` — one entry per DISTINCT word of
    the (already let1-bound / materialized) word-array column ``ws``, with
    its occurrence count. Zero shuffle, zero Python: ``sort_array`` + one
    boundary scan (O(n log n) per row, the gopher_repetition run-length
    idiom). Exploding this is row-for-row identical to the classic
    ``explode(words) → groupBy(id, term).count()`` kernel but skips that
    kernel's full-token exchange — at corpus scale the difference between
    shuffling every token and shuffling nothing (r6)."""
    def from_sorted(sw: Column) -> Column:
        n = F.size(sw)
        starts_expr = F.filter(
            F.sequence(F.lit(1), n),
            lambda i: (i == 1)
            | (F.element_at(sw, i) != F.element_at(sw, i - 1)),
        )

        def entries(starts: Column) -> Column:
            ends = F.concat(
                F.slice(starts, 2, F.size(starts) - 1), F.array(n + 1)
            )
            return F.zip_with(
                starts, ends,
                lambda s, e: F.struct(
                    F.element_at(sw, s).alias("term"),
                    (e - s).cast("long").alias("tf"),
                ),
            )

        return F.when(n >= 1, let1(starts_expr, entries)).otherwise(
            F.array().cast("array<struct<term:string,tf:bigint>>")
        )

    return let1(F.sort_array(ws), from_sorted)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones probabilistic relevance) top-k over a
    document table.

    Plan shape (r6 rewrite — the part that matters at 100 TB):

    1. ONE tokenize pass: per doc, ``dl`` and the per-query-term tf
       vector are computed WITHIN the row (``size(filter(words, w ==
       term))`` per term — the query has a handful of terms), and the
       narrow (id, dl, tfs) projection is localCheckpoint'd so the
       corpus text is read and tokenized exactly once.
    2. corpus stats (N, avgdl) AND per-term document frequencies come
       out of a SINGLE 1-row aggregate over that narrow table
       (``sum(tfs[i] > 0)`` per term) — no postings explode, no
       (doc, term) exchange at all.
    3. docs containing no query term are dropped array-side
       (``exists(tfs, t > 0)`` — exactly the rows the old postings path
       produced); the per-doc score folds the fixed, term-ascending sum
       of idf·tfq — same idf/tfq expressions as before.
    4. global top-k via orderBy+limit (TakeOrderedAndProject —
       per-partition heaps, no sort shuffle).

    Net: zero full-width shuffles (the old plan exchanged the query-term
    postings twice — groupBy and df join). Ties broken by ascending id
    for cross-engine determinism; oracle-pinned result-identical.
    """
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("empty query")
    did = F.col(id_col)

    def eq(t: str):
        return lambda x: x == F.lit(t)

    def row_of(w: Column) -> Column:
        return F.struct(
            F.size(w).alias("dl"),
            F.array(*[
                F.size(F.filter(w, eq(t))) for t in terms
            ]).alias("tfs"),
        )

    narrow = docs.select(
        did.alias("id"), let1(alnum_words(text_col), row_of).alias("__s")
    ).select("id", F.col("__s.dl").alias("dl"),
             F.col("__s.tfs").alias("tfs")).localCheckpoint(eager=False)
    stats = narrow.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"),
        *[F.sum(F.when(F.element_at("tfs", i + 1) > 0, 1).otherwise(0))
          .alias(f"df_{i}") for i in range(len(terms))],
    )

    def idf_i(i: int) -> Column:
        return F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5)) + F.lit(1.0)
        )

    def tfq_i(i: int) -> Column:
        tf = F.element_at("tfs", i + 1)
        return tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )

    score = idf_i(0) * tfq_i(0)
    for i in range(1, len(terms)):
        score = score + idf_i(i) * tfq_i(i)
    scored = (
        narrow.filter(F.exists("tfs", lambda t: t > 0))
        .join(F.broadcast(stats))
        .select("id", score.alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )


def build_postings_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_buckets: int = 256,
) -> tuple[DataFrame, DataFrame]:
    """Persistable BM25 postings index: ``(postings, stats)``.

    ``bm25_topk`` re-tokenizes the whole corpus per query — right for a
    one-off, wrong for a search SERVICE over a 100 TB corpus. This is the
    classic inverted-index split: build once, query many (the
    ``minhash_index`` pattern applied to lexical search).

    * ``postings``: one row per (term, doc) — ``(term, term_bucket, id,
      tf, dl)``. Write it partitioned/bucketed by ``term_bucket``
      (``pmod(xxhash64(term), B)``; Iceberg bucket transform on a
      cluster) so a query's scan prunes to ≤ len(query) buckets of the
      index instead of the corpus.
    * ``stats``: the single-row ``(n_docs, avgdl)`` BM25 needs — frozen
      at build time so every query scores against the same collection
      statistics.

    Build cost (r6): one tokenize pass, ZERO shuffle — the (term, doc, tf)
    rows come from the per-row :func:`term_counts` run-length kernel
    (every token of a doc lives in its own row already, so the old
    ``explode → groupBy(term, id, dl)`` exchange only ever regrouped rows
    that were co-located to begin with; at corpus scale it shuffled every
    token). Row set is identical; the sink's clustering (bucket by
    ``term_bucket``) owns whatever exchange the layout needs.
    """
    did = F.col(id_col)
    # ONE tokenize + run-length pass, materialized narrow (id, dl,
    # entries) — the stats aggregate and the postings explode both read
    # it; un-checkpointed, each output re-ran the tokenizer (r6)
    toks = docs.select(
        did.alias("id"), alnum_words(text_col).alias("__w")
    ).select("id", F.size("__w").alias("dl"),
             term_counts(F.col("__w")).alias("__e")) \
        .localCheckpoint(eager=False)
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    postings = (
        toks.select("id", "dl", F.explode("__e").alias("__e"))
        .select("id", "dl", F.col("__e.term").alias("term"),
                F.col("__e.tf").alias("tf"))
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(int(term_buckets)))
            .cast("int"))
        .select("term", "term_bucket", "id", "tf", "dl")
    )
    return postings, stats


def bm25_topk_indexed(
    postings: DataFrame,
    stats: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    term_buckets: int = 256,
) -> DataFrame:
    """BM25 top-k against a persisted ``build_postings_index`` —
    result-identical to ``bm25_topk`` over the same corpus (pinned by
    tests/test_ranking.py) but the query never touches document text:

    1. the query's term-bucket set (≤ len(query) values, hashed by a
       metadata-sized Spark job — the ANN driver-side-query-hashing
       pattern) prunes the index scan to those partitions;
    2. the exact term filter runs inside the pruned scan;
    3. per-term document frequency aggregates over the pruned postings
       (≤ len(query) rows, broadcast back);
    4. score + global top-k via TakeOrderedAndProject.

    Zero full-width shuffles: everything downstream of the pruned scan is
    broadcast-sized except the per-doc score groupBy over matched
    postings."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("empty query")
    spark = postings.sparkSession
    buckets = sorted({
        r["b"] for r in spark.createDataFrame(
            [(t,) for t in terms], "term string"
        ).select(
            F.pmod(F.xxhash64("term"), F.lit(int(term_buckets)))
            .cast("int").alias("b")
        ).collect()
    })
    tf = postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
    df_t = tf.groupBy("term").agg(F.count_distinct("id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    tfq = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .select("id", (idf * tfq).alias("__s"))
        .groupBy("id")
        .agg(F.sum("__s").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "score")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge table (crawl-frontier
    prioritization signal).

    Synchronous power method, ``iters`` rounds of
    ``rank(v) = (1-d)/N + d * Σ_{u→v} rank(u)/outdeg(u)``.
    Per iteration: one join of ranks onto edges (shuffle keyed on src —
    AQE picks broadcast when ranks fit) and one groupBy dst (the real
    shuffle) plus a left join back onto the node set; the out-degrees are
    folded into the edge table ONCE before the loop (r5 — one fewer join
    per iteration). Dangling nodes contribute nothing (no mass
    redistribution) — the oracle replays the identical recurrence.

    Lineage is cut every ``checkpoint_every`` iterations rather than every
    iteration (r5): each ``localCheckpoint`` plans its subtree eagerly and
    inserts an RDD boundary that blocks whole-plan exchange reuse —
    profiling showed the per-iteration cut cost ~20% on wall time at the
    default 5 iterations while buying nothing (5-deep plans are well
    inside Catalyst's comfort zone). Every-8 keeps 100+-iteration runs
    bounded, the connected_components concern, without taxing the common
    case.

    ``N`` (node count) is the one driver-side scalar; it is metadata-sized
    and computed once.
    """
    # r6: e / nodes / w are MATERIALIZED (lazy localCheckpoint), not just
    # built outside the loop — nodes and w are re-referenced every
    # iteration, and across lineage cuts each reference re-ran the
    # edge-scan+distinct subtree (ReusedExchange cannot span jobs). The
    # cuts also keep the loop plan linear in `iters` instead of carrying
    # `iters` copies of the scan subtree through Catalyst.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # weighted adjacency, built ONCE outside the loop (r5): folding outdeg
    # into the edge table up front removes one join per iteration — the
    # loop's only exchanges are the ranks join (AQE broadcasts when ranks
    # fit) and the dst groupBy. Standard at 10^10 edges too: the
    # transition matrix is materialized once, the rank vector iterates.
    w = e.join(outdeg, "src").select(
        "src", "dst", "outdeg").localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(iters):
        contribs = (
            w.join(ranks, w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                # rank/outdeg by DIVISION, not *(1/outdeg): the DuckDB
                # oracle divides, and the two round differently in the
                # last ULP — compounded over iterations that can cross a
                # 6dp rounding boundary
                (F.col("rank") / F.col("outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + damping * F.coalesce(F.col("__in"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def trustrank(
    edges: DataFrame,
    trusted: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    checkpoint_every: int = 8,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina, Pedersen, VLDB 2004) — spam
    demotion for frontier scheduling: PageRank whose teleport mass lands
    ONLY on a hand-vetted trusted seed set, so trust flows outward from
    good sites and link farms (which inflate plain PageRank through
    reciprocal spam links) receive almost none. Rank a frontier by
    ``trustrank`` instead of ``pagerank`` and spam neighborhoods sink to
    the back of the crawl.

        rank₀(v)     = d(v)
        rank_{t+1}(v) = (1-β)·d(v) + β·Σ_{u→v} rank_t(u)/outdeg(u)

    with ``d(v) = 1/|S|`` on the trusted set, 0 elsewhere (their §4.3
    biased PageRank; β = ``damping``). Same plan shape per iteration as
    :func:`pagerank` — one src-keyed join, one dst-keyed groupBy shuffle,
    lineage cut — plus the teleport column, a broadcast-sized join (seed
    sets are hand-curated: hundreds, not millions). Seeds with no edges
    still hold teleport mass (they join the node set), exactly as the
    recurrence demands."""
    # r6: materialize e / nd / w once (pagerank rationale) — w and nd are
    # the per-iteration references
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    seeds = trusted.select(F.col(node_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(seeds.select("node"))
        .distinct()
    )
    s = seeds.count()
    if s == 0:
        raise ValueError("trusted seed set is empty")
    nd = (
        nodes.join(
            F.broadcast(seeds.withColumn("__t", F.lit(True))), "node", "left")
        .select(
            "node",
            F.when(F.col("__t"), F.lit(1.0 / s)).otherwise(F.lit(0.0))
            .alias("__d"),
        )
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # weighted adjacency folded once outside the loop — the pagerank r5
    # pattern (one fewer join per iteration; division kept oracle-exact)
    w = e.join(outdeg, "src").select(
        "src", "dst", "outdeg").localCheckpoint(eager=False)
    ranks = nd.select("node", F.col("__d").alias("rank"))
    for i in range(iters):
        contribs = (
            w.join(ranks, w["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nd.join(contribs, "node", "left").select(
            "node",
            ((1.0 - damping) * F.col("__d")
             + damping * F.coalesce(F.col("__in"), F.lit(0.0)))
            .alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def opic_importance(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda, Cobéna, WWW 2003): the crawl-native importance estimator. Where
    PageRank needs the whole link graph up front, OPIC converges WHILE the
    crawl runs: every page holds *cash*; visiting a page banks its cash
    into *history* and hands it in equal shares to its outlinks; a page's
    importance estimate is the fraction of all distributed cash that ever
    flowed through it. The reference's queue-driven loop (src/core.ts
    enqueueLinks cycle) is exactly the visit procedure OPIC piggybacks on.

    This is the bulk-synchronous variant — each round visits EVERY page
    (their §5 "crawling the whole graph per cycle" regime, the shape a
    per-round Spark scheduler has anyway):

        cash₀(v) = 1/N,  hist₀(v) = 0
        D_t      = Σ_{dangling u} cash_t(u)          (virtual-node intake)
        cash_{t+1}(v) = Σ_{u→v} cash_t(u)/outdeg(u) + D_t/N
        hist_{t+1}(v) = hist_t(v) + cash_t(v)
        importance(v) = (hist_T(v) + cash_T(v)) / (T + 1)

    Dangling pages route their cash through the paper's *virtual node*,
    which redistributes uniformly — total cash stays exactly 1 per round,
    so Σ importance = 1 (test-pinned). Plan shape per iteration is the
    :func:`pagerank` twin plus one broadcast scalar: outdeg folded into
    the edge table ONCE before the loop, then one src-keyed ranks join,
    one dst-keyed groupBy shuffle, and the dangling-cash sum as a 1-row
    aggregate crossJoin-broadcast back onto the state (never a driver
    collect, never an action inside the loop). Unlike pagerank — whose
    loop body references its state ONCE, so lineage can run uncut for 8
    rounds — each OPIC round reads the state THREE times (contributions,
    dangling sum, history carry): left uncut the logical plan grows
    3^iters, so ``checkpoint_every`` defaults to 1 here and the three
    references collapse onto one checkpointed node per round (linear
    plan, state materialized once per iteration). N is the single driver
    scalar, as in pagerank. The DuckDB oracle replays the identical
    recurrence unrolled, division-by-outdeg kept textually identical for
    ULP parity.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("importance", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # r6: w and dangling are read EVERY round, and the per-round lineage
    # cuts (checkpoint_every=1 here) put each round in its own job —
    # without a materialization the edge-scan+distinct+outdeg subtree
    # re-ran once per round per reference (pagerank rationale)
    w = e.join(outdeg, "src").select(
        "src", "dst", "outdeg").localCheckpoint(eager=False)
    # the dangling set is static (nodes with no outedges) — resolve once
    dangling = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti",
    ).localCheckpoint(eager=False)
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist"))
    for i in range(iters):
        contribs = (
            w.join(state, w["src"] == state["node"])
            .select(
                F.col("dst").alias("node"),
                # division, not *(1/outdeg) — ULP parity with the oracle
                (F.col("cash") / F.col("outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        dang = (
            state.join(F.broadcast(dangling), "node", "semi")
            .agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("__d"))
        )
        state = (
            state.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (F.coalesce(F.col("__in"), F.lit(0.0))
                 + F.col("__d") / F.lit(float(n))).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=False)
    return state.select(
        "node",
        ((F.col("hist") + F.col("cash")) / F.lit(float(iters + 1)))
        .alias("importance"),
    )


def host_graph(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Page-level link edges → registered-domain-level weighted graph —
    the standard web-scale reduction (Common Crawl publishes exactly this
    as its host-/domain-level webgraph) that makes graph algorithms
    tractable at 10^10 pages: TrustRank seed propagation, harmonic
    centrality, and spam-neighborhood detection all run on the ~10^7-node
    domain graph instead of the page graph, then join back.

    Each (src_url, dst_url) edge maps to (registered_domain(src),
    registered_domain(dst)) via the same PSL-shortcut election the
    politeness scheduler partitions by (functions/urlnorm.py:86 — one
    grouping rule for budgets AND the graph, so a domain's politeness unit
    and its graph node coincide). Intra-domain edges are dropped (they are
    navigation, not endorsement — the Common Crawl convention), NULL hosts
    (unparseable URLs) are dropped, and the result carries both edge
    weights that downstream consumers want: ``n_links`` (raw link count)
    and ``n_src_pages`` (distinct linking pages — the dampened weight
    TrustRank-style propagation prefers, one page spamming 10k links
    counts once).

    Plan: host election is the Arrow-vectorized
    ``registered_domain_udf`` projection (zero shuffle), then the
    standard two-phase distinct aggregation (verified ``.explain``):
    exchange 1 on (src_dom, dst_dom, src_url) carrying map-side partial
    counts — so the shuffle is bounded by DISTINCT (dom-pair, page)
    triples, not raw edges — and exchange 2 on (src_dom, dst_dom)
    merging the pair totals. No window, no driver collect.
    """
    from ..functions.udfs import registered_domain_udf

    # guide §4.4 (r6): the NULL-host filter below references these UDF
    # columns, and the optimizer pushes it (UDF eval in tow) below any
    # upstream exchange — on a one-split scan that serializes the whole
    # host election into a single task. The UDF is pure; the
    # nondeterministic marking only pins its evaluation where it is
    # written (after the caller's repartition), results unchanged.
    rd = registered_domain_udf.asNondeterministic()
    doms = edges.select(
        rd(F.col(src_col)).alias("src_dom"),
        rd(F.col(dst_col)).alias("dst_dom"),
        F.col(src_col).alias("__src_url"),
    )
    return (
        doms.filter(
            F.col("src_dom").isNotNull()
            & F.col("dst_dom").isNotNull()
            & (F.col("src_dom") != F.col("dst_dom"))
        )
        .groupBy("src_dom", "dst_dom")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("__src_url").alias("n_src_pages"),
        )
    )


def anchor_text_agg(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Anchor-text aggregation per link target — the classic web signal
    that a page is described by the text of the links pointing AT it
    (Brin & Page 1998 §2.2; the reference's enqueueLinks discards anchor
    text, but its WAT-style link metadata carries it and ranking/training
    pipelines consume it).

    Output per dst: ``indegree`` (total in-links), ``n_src`` (distinct
    linking pages), ``top_anchors`` (top-``k`` anchor strings by count
    DESC then anchor ASC, '|'-joined), ``top_count``.

    Plan, sized for a 10^10-edge link graph: anchors are trimmed JVM-side;
    (dst, anchor) counts partial-aggregate map-side before their ONE
    exchange, so the shuffle carries distinct pairs, not raw edges; the
    top-k window partitions by dst over each dst's few distinct anchors
    (never a global window); dst-level indegree/n_src is one more keyed
    agg. No Python anywhere."""
    from pyspark.sql import Window

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.trim(F.col(anchor_col)).alias("anchor"),
    )
    pair = e.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("anchor"))
    top = (
        pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("dst")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "anchor"))),
                    lambda s: s["anchor"],
                ),
                "|",
            ).alias("top_anchors"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt"))).alias("top_count"),
        )
    )
    stats = e.groupBy("dst").agg(
        F.count(F.lit(1)).alias("indegree"),
        F.countDistinct("src").alias("n_src"),
    )
    return stats.join(top, "dst").select(
        "dst", "indegree", "n_src", "top_anchors", "top_count"
    )


def leg_ranks(
    leg: DataFrame, id_col: str = "doc_id", score_col: str = "score"
) -> DataFrame:
    """1-based dense positions (score DESC, id ASC tie-break) for ONE
    retrieval leg — computed as a self-join count instead of a global
    window, keeping the engine's zero-single-partition-window invariant.
    The input is a top-k leg (≤ k rows by construction), so the non-equi
    join is a trivial broadcast nested loop over k² comparisons."""
    m = leg.select(F.col(id_col).alias("id"), F.col(score_col).alias("s"))
    o = m.select(F.col("id").alias("oid"), F.col("s").alias("os"))
    better = (F.col("os") > F.col("s")) | (
        (F.col("os") == F.col("s")) & (F.col("oid") < F.col("id"))
    )
    return (
        m.join(F.broadcast(o), better, "left")
        .groupBy("id", "s")
        .agg((F.count("oid") + 1).cast("long").alias("rank"))
        .select("id", "rank")
    )


def rrf_fuse(
    legs: list[DataFrame],
    k_rrf: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    ``rrf(d) = Σ_legs 1 / (k_rrf + rank_leg(d))`` over the docs each leg
    returned; docs absent from a leg contribute nothing for it. Rank
    positions are integers, so the fused score is an exact rational —
    bit-identical across engines regardless of the legs' float scores.

    Every input here is ≤ k rows (the legs are top-k results), so fusion
    is a driver-scale plan tail on top of arbitrarily large legs — the
    100 TB work happened inside each leg."""
    ranked = [leg_ranks(leg, id_col, score_col) for leg in legs]
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy("id")
        .agg(
            F.round(F.sum(1.0 / (F.lit(float(k_rrf)) + F.col("rank"))), 6).alias(
                "rrf_score"
            ),
            F.count(F.lit(1)).cast("long").alias("n_legs"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(topk)
        .select(F.col("id").alias(id_col), "rrf_score", "n_legs")
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec: list[float],
    k: int = 10,
    k_leg: int = 20,
    k_rrf: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical leg + brute cosine dense leg, fused
    with RRF. The reference's search is dense-only (src/llm-service.ts:
    216-259); pairing it with the lexical leg is the standard production
    upgrade (missing-keyword queries, exact identifiers, rare terms).
    Each leg is the already-scale-shaped operator (term-filtered postings
    shuffle / TakeOrdered cosine scan); fusion is O(k_leg) rows."""
    from .search import cosine_score_col

    lex = bm25_topk(docs, query_text, k=k_leg, id_col=id_col, text_col=text_col)
    dense = (
        embeddings.withColumn("score", cosine_score_col(emb_col, query_vec))
        .orderBy(F.desc("score"), F.asc(vec_id_col))
        .limit(k_leg)
        .select(F.col(vec_id_col).alias(id_col), "score")
    )
    return rrf_fuse([lex, dense], k_rrf=k_rrf, topk=k, id_col=id_col)


def harmonic_centrality(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Exact bounded-radius harmonic centrality over a directed link
    graph: ``H_R(v) = Σ_{u ≠ v, d(v,u) ≤ R} 1/d(v,u)`` following
    out-edges (Boldi & Vigna 2014, "Axioms for centrality" — the
    centrality they recommend for web/host graphs; the bounded radius is
    the standard crawl-scheduling variant).

    BFS by iterated joins: the frontier at depth k joins the edge table
    (shuffle keyed on the join column), new pairs are anti-joined against
    everything already seen at a smaller depth, lineage cut every
    ``checkpoint_every`` depths — default 1 (every depth): unlike the
    power-method loops, the BFS's frontier/seen self-reference duplicates
    the distinct+anti-join chains without a cut (measured ~20% SLOWER at
    cadence 4 — the opposite of pagerank, where cadence 8 wins ~10%; both
    A/B'd best-of-3 at r5). Shortest paths
    never revisit a node, so seeding "seen" with (v, v, 0) both excludes
    self-distances and prunes cycles for free.

    SCALE NOTE: this enumerates every (origin, node ≤ R hops) pair —
    linear in the size of the radius-R neighborhoods, which is fine for
    sparse host graphs and small radii but quadratic on dense graphs as
    R grows. At 10^10-node web scale use ``hyperball`` below (the
    sketch-based estimator this operator is the exact oracle for).

    Returns one row per node: ``n_d1..n_dR`` (count of nodes first
    reached at each depth) and ``harmonic`` — computed as the fixed-order
    sum ``n_d1/1.0 + n_d2/2.0 + ... `` rounded to 6dp, so the float is
    bit-identical across engines (each term is one IEEE divide of exact
    integers, summed left-to-right).
    """
    # r6: e is joined at EVERY depth, and this loop cuts lineage every
    # depth (checkpoint_every=1) — uncheckpointed, each depth's job re-ran
    # the edge-scan+distinct subtree (ReusedExchange cannot span jobs)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    frontier = e.select(
        F.col("src").alias("origin"), F.col("dst").alias("node"),
        F.lit(1).alias("d"),
    ).distinct()
    self_rows = nodes.select(
        F.col("node").alias("origin"), "node", F.lit(0).alias("d")
    )
    frontier = frontier.join(
        self_rows.select("origin", "node"), ["origin", "node"], "left_anti"
    )
    seen = self_rows.union(frontier)
    for k in range(2, radius + 1):
        frontier = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("origin", F.col("dst").alias("node"), F.lit(k).alias("d"))
            .distinct()
            .join(seen.select("origin", "node"), ["origin", "node"],
                  "left_anti")
        )
        if k % checkpoint_every == 0:
            frontier = frontier.localCheckpoint(eager=False)
        seen = seen.union(frontier)
        if k % checkpoint_every == 0:
            seen = seen.localCheckpoint(eager=False)
    aggs = [
        F.sum(F.when(F.col("d") == k, 1).otherwise(0)).cast("long")
        .alias(f"n_d{k}")
        for k in range(1, radius + 1)
    ]
    counts = seen.filter(F.col("d") > 0).groupBy("origin").agg(*aggs)
    out = nodes.join(
        counts, nodes["node"] == counts["origin"], "left"
    ).select(
        "node",
        *[F.coalesce(f"n_d{k}", F.lit(0)).cast("long").alias(f"n_d{k}")
          for k in range(1, radius + 1)],
    )
    harmonic = F.col("n_d1") / F.lit(1.0)
    for k in range(2, radius + 1):
        harmonic = harmonic + F.col(f"n_d{k}") / F.lit(float(k))
    return out.withColumn("harmonic", F.round(harmonic, 6))


def hyperball(
    edges: DataFrame,
    radius: int = 3,
    lg_k: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013, "In-core computation of geometric
    centralities with HyperBall") — the 10^10-node path for neighborhood
    functions and harmonic centrality, estimating ball sizes with
    HyperLogLog counters instead of enumerating pairs.

    ``B_k(v) = B_{k-1}(v) ∪ ⋃_{v→w} B_{k-1}(w)`` where every B is an HLL
    sketch: per iteration ONE shuffle keyed on src carrying fixed-size
    sketches (2^lg_k registers each, ~KB — per-round traffic is O(edges ×
    sketch_bytes) regardless of ball sizes, vs the exact operator's
    O(Σ|B_k|) blowup). Sketch ops are Spark's built-in DataSketches
    aggregates (hll_sketch_agg / hll_union_agg / hll_union) — all
    JVM-side, zero Python in the loop.

    Returns per node the estimated neighborhood sizes ``nf_1..nf_R``
    (|B_k(v)| − 1, i.e. excluding self) and ``harmonic_est =
    Σ_k (nf_k − nf_{k-1})/k``, the HyperBall harmonic estimator.
    Estimates carry standard HLL error (~1.04/√2^lg_k, ≈1.6% at the
    default lg_k=12); tests pin them against ``harmonic_centrality`` on
    small graphs. Not SQL-replayable by design — the sketch encoding is
    engine-specific (DataSketches), so this operator is pytest-pinned
    rather than DuckDB-oracled.
    """
    # r6: e rides every round's union-shuffle; materialize it once
    # (harmonic_centrality rationale)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    balls = nodes.groupBy("node").agg(
        F.hll_sketch_agg(F.col("node"), F.lit(lg_k)).alias("sk")
    )
    ests = []
    for k in range(1, radius + 1):
        nb = (
            e.join(balls, e["dst"] == balls["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.hll_union_agg(F.col("sk"), True).alias("nb_sk"))
        )
        balls = balls.join(nb, "node", "left").select(
            "node",
            F.when(
                F.col("nb_sk").isNull(), F.col("sk")
            ).otherwise(F.hll_union("sk", "nb_sk")).alias("sk"),
            *[F.col(c) for c in balls.columns if c.startswith("nf_")],
        )
        # lineage cut every checkpoint_every rounds (the pagerank r5
        # rationale): per-round cuts blocked exchange reuse and cost ~20%
        # at small radii; large-radius runs stay bounded
        if k % checkpoint_every == 0:
            balls = balls.localCheckpoint(eager=False)
        balls = balls.withColumn(
            f"nf_{k}",
            (F.hll_sketch_estimate("sk") - 1).cast("double"),
        )
        ests.append(f"nf_{k}")
    harmonic = F.col("nf_1") / F.lit(1.0)
    for k in range(2, radius + 1):
        harmonic = harmonic + (
            F.col(f"nf_{k}") - F.col(f"nf_{k-1}")
        ) / F.lit(float(k))
    return balls.select(
        "node", *ests, F.round(harmonic, 6).alias("harmonic_est")
    )


def focused_priority(
    edges: DataFrame,
    topic: str,
    parent_hits: DataFrame | None = None,
    anchor_weight: int = 2,
) -> DataFrame:
    """Focused-crawl frontier prioritization (Chakrabarti, van den Berg &
    Dom, WWW 1999 "Focused crawling: a new approach to topic-specific Web
    resource discovery"): score each unvisited link TARGET by the topic
    evidence around the links that point at it — the anchor text (the
    strongest signal, weighted ``anchor_weight``) plus, optionally, the
    relevance of the PAGES the links come from (``parent_hits``:
    (src, hits) integer scores, e.g. topic-term counts over the parent's
    extracted text). The result feeds the frontier's ``priority`` column,
    turning the BFS scheduler into a best-first topical crawler — the
    fourth priority source next to config priority, PageRank, and the
    indegree blend (q:frontier_priority).

    Plan shape: per-edge anchor hits are a JVM projection
    (``array_intersect`` of the distinct anchor words with the topic
    terms — integer counts, oracle-exact); edges with zero evidence are
    FILTERED BEFORE the one dst-keyed shuffle, so the exchange carries
    only topical edges (the bm25 postings-filter shape — on a 100 TB
    link graph with a narrow topic that is orders of magnitude less than
    the full edge set); ``parent_hits`` joins the filtered edges on src.
    No window, no Python, no driver collect.

    Returns (dst, anchor_hits, src_hits, n_links, priority) with
    ``priority = anchor_weight*anchor_hits + src_hits``; ties are
    resolved downstream by the frontier's deterministic (priority DESC,
    seq) claim order.
    """
    terms = tokenize_query(topic)
    if not terms:
        raise ValueError("empty topic")
    terms_lit = F.array(*[F.lit(t) for t in terms])
    per_edge = edges.select(
        "src", "dst",
        F.size(F.array_intersect(
            F.array_distinct(alnum_words("anchor")), terms_lit,
        )).alias("__hits"),
    )
    if parent_hits is not None:
        ph = parent_hits.select(
            "src", F.col("hits").cast("long").alias("__ph"))
        per_edge = per_edge.join(F.broadcast(ph), "src", "left") \
            .withColumn("__ph", F.coalesce("__ph", F.lit(0)))
    else:
        per_edge = per_edge.withColumn("__ph", F.lit(0))
    topical = per_edge.filter((F.col("__hits") > 0) | (F.col("__ph") > 0))
    out = topical.groupBy("dst").agg(
        F.sum("__hits").alias("anchor_hits"),
        F.sum("__ph").alias("src_hits"),
        F.count(F.lit(1)).alias("n_links"),
    )
    return out.select(
        "dst", "anchor_hits", "src_hits", "n_links",
        (F.lit(anchor_weight) * F.col("anchor_hits")
         + F.col("src_hits")).alias("priority"),
    )


def tokenize_phrase(phrase: str) -> list[str]:
    """Order-preserving, duplicate-preserving tokenization of a phrase
    query — unlike :func:`tokenize_query` (bag-of-words), position
    matters: ``"table table"`` is a 2-term phrase."""
    return [w for w in re.sub(r"[^A-Za-z0-9]+", " ", phrase.lower()).split() if w]


def phrase_search(
    docs: DataFrame,
    phrase: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search, scan path: top-k docs by occurrence count of
    the token sequence ``phrase`` (overlapping occurrences counted —
    ``"a a a"`` contains ``"a a"`` twice).

    Reference parity: the reference's artifact search is substring
    ILIKE over stored markdown (src/server.ts:412-436 `%query%`);
    phrase-over-tokens is the IR-correct form of the same need, immune
    to whitespace/markup noise, and the natural companion to
    ``bm25_topk`` (which ignores adjacency).

    Plan: ZERO shuffle before the final top-k. The phrase is a driver
    constant, so each doc answers locally: tokenize JVM-side, then count
    window starts ``j`` where every ``tokens[j+i] == terms[i]`` — one
    ``filter(sequence(...))`` higher-order fold inside whole-stage
    codegen. Global top-k is TakeOrderedAndProject (no sort shuffle).
    On 100 TB this is a single pruned scan — the same shape as
    gopher_repetition."""
    terms = tokenize_phrase(phrase)
    if not terms:
        raise ValueError("empty phrase")
    m = len(terms)

    # let1-bind the tokenized array: CollapseProject would otherwise
    # inline the tokenizer regex into every element_at below, re-running
    # it ~2×windows times per document (see let1 docstring)
    def tf_of(w: Column) -> Column:
        def window_matches(j: Column) -> Column:
            cond = F.lit(True)
            for i, t in enumerate(terms):
                cond = cond & (F.element_at(w, j + F.lit(i + 1)) == F.lit(t))
            return cond

        return F.when(
            F.size(w) >= m,
            F.size(F.filter(F.sequence(F.lit(0), F.size(w) - F.lit(m)),
                            window_matches)),
        ).otherwise(F.lit(0))

    tf = let1(alnum_words(text_col), tf_of)
    out = (
        docs.select(F.col(id_col), tf.alias("phrase_tf"))
        .filter(F.col("phrase_tf") > 0)
    )
    return out.orderBy(F.desc("phrase_tf"), F.asc(id_col)).limit(k)


def build_positional_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_buckets: int = 256,
) -> DataFrame:
    """Positional postings: one row per (term, doc) with the SORTED
    position list — ``(term, term_bucket, id, positions, dl)``. The
    positional twin of :func:`build_postings_index` (same bucket scheme,
    same write/prune contract); ``size(positions)`` is the plain tf, so
    this index also serves ``bm25_topk_indexed`` via a projection.

    Build cost: one tokenize pass + ONE shuffle on (term, id); positions
    aggregate as a collect_list of ints (positions within one doc — the
    per-row state is bounded by doc length, never by corpus size)."""
    did = F.col(id_col)
    toks = docs.select(did.alias("id"), alnum_words(text_col).alias("__w"))
    # posexplode_OUTER (r6): the inner generate injects an implicit
    # `size(__w) > 0 AND isnotnull(__w)` filter BELOW the projection, and
    # Catalyst substitutes the full tokenize chain into both conjuncts —
    # the tokenizer ran 3x per row. Outer generate has no implicit
    # filter; empty-token docs surface as one NULL row and the cheap
    # column filter drops them — same index rows, tokenize once.
    return (
        toks.select(
            "id", F.size("__w").alias("dl"),
            F.posexplode_outer("__w").alias("pos", "term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term", "id", "dl")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(int(term_buckets))).cast("int"))
        .select("term", "term_bucket", "id", "positions", "dl")
    )


def phrase_search_indexed(
    postings: DataFrame,
    phrase: str,
    k: int = 10,
    id_col: str = "doc_id",
    term_buckets: int = 256,
) -> DataFrame:
    """Exact phrase search against a persisted
    :func:`build_positional_index` — result-identical to
    :func:`phrase_search` over the same corpus (pinned by
    tests/test_ranking.py) without touching document text.

    The classic positional-intersection algorithm, vectorized:

    1. the phrase's term-bucket set prunes the index scan to
       ≤ len(phrase) partitions (the ``bm25_topk_indexed`` pattern);
    2. each (term, phrase-offset) pair shifts its position list by the
       offset (``transform(positions, p -> p - off)``) — a phrase start
       is a position present in EVERY shifted list;
    3. per doc: require all len(phrase) pairs matched, then fold
       ``array_intersect`` over the shifted lists; ``size`` of the
       intersection is the occurrence count (overlaps included, exactly
       as the scan path counts them).

    One broadcast join (the ≤ m-row query-pair table) + one id-keyed
    groupBy over postings rows of MATCHED TERMS ONLY — on a 100 TB
    corpus the exchange carries len(phrase) rows per candidate doc, not
    the corpus."""
    terms = tokenize_phrase(phrase)
    if not terms:
        raise ValueError("empty phrase")
    n_pairs = len(terms)
    spark = postings.sparkSession
    qdf = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, off int")
    buckets = sorted({
        r["b"] for r in qdf.select(
            F.pmod(F.xxhash64("term"), F.lit(int(term_buckets)))
            .cast("int").alias("b")).collect()
    })
    matched = (
        postings
        .filter(F.col("term_bucket").isin(buckets)
                & F.col("term").isin(list(set(terms))))
        .join(F.broadcast(qdf), "term")
        .select(
            "id",
            F.filter(
                F.transform("positions", lambda p: p - F.col("off")),
                lambda p: p >= 0,
            ).alias("__shift"),
        )
    )
    arrs = F.col("__arrs")
    starts = F.aggregate(
        F.slice(arrs, 2, F.size(arrs) - 1),
        F.element_at(arrs, 1),
        lambda acc, x: F.array_intersect(acc, x),
    )
    out = (
        matched.groupBy("id")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.collect_list("__shift").alias("__arrs"))
        .filter(F.col("__n") == n_pairs)
        .select("id", F.size(starts).alias("phrase_tf"))
        .filter(F.col("phrase_tf") > 0)
    )
    return (
        out.orderBy(F.desc("phrase_tf"), F.asc("id"))
        .limit(k)
        .select(F.col("id").alias(id_col), "phrase_tf")
    )


def hits(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999 / SODA 1998) — the
    query-independent form over a link graph: a good *hub* links to good
    *authorities*, a good authority is linked from good hubs. The crawl
    use is twofold: authority complements PageRank as a frontier-priority
    signal (pages many strong hubs point at are worth fetching early),
    and hub scores surface directory/index pages whose outlinks are the
    cheapest high-yield frontier expansions (the focused-crawling seed
    heuristic of Chakrabarti et al. 1999).

    Kleinberg's recurrence normalizes after every half-step:

        a_{t+1}(v) = Σ_{u→v} h_t(u)   then  a ← a / ‖a‖₂
        h_{t+1}(u) = Σ_{u→v} a_{t+1}(v)  then  h ← h / ‖h‖₂

    but the maps are linear and each norm is a positive scalar, so the
    per-step norms commute out: iterating UNNORMALIZED and L2-normalizing
    only the two final vectors yields the identical result in exact
    arithmetic (and agrees to ~1 ULP in floats). That deferral is the
    whole plan story: the in-loop recurrence becomes single-reference
    (each state feeds exactly one downstream step), so the plan grows
    LINEARLY in ``iters`` and lineage cuts follow :func:`pagerank`'s
    batched every-8 policy — whereas a per-step norm reads its input
    subtree twice (1-row aggregate + main branch) and DOUBLES the uncut
    plan per half-step, forcing a lineage cut (a full materialization)
    every iteration. Measured at the contract scale the deferred form is
    ~3× faster end-to-end.

    Per iteration: two rank-onto-edges joins + two groupBy shuffles (one
    per direction — HITS is pagerank's bill for running both directions),
    each followed by a left join onto the node set. The final norms are
    1-row aggregates crossJoin-broadcast onto the vectors — never a
    driver collect, never an action in the loop. No driver scalars at
    all; at 10^10 edges the per-iteration traffic is the two keyed
    exchanges, identical to running pagerank twice. Magnitude growth is
    bounded by max-degree^(2·iters) — overflow-safe in doubles for any
    realistic depth (degree 10^6 × 20 iterations ≈ 1e120 « DBL_MAX);
    re-introduce a mid-loop rescale only past that.

    The DuckDB oracle unrolls the identical deferred recurrence; norms
    divide (not multiply by a reciprocal) for ULP parity, per the
    pagerank precedent.
    """
    # r6 note: materializing e/nodes here (the pagerank/opic localCheckpoint
    # fix) was tried and measured 2.4x SLOWER — hits runs its whole
    # 5-iteration recurrence as ONE query, where ReusedExchange already
    # dedupes the repeated scan subtrees, and the checkpointed RDD leaf
    # loses the size statistics that let the planner broadcast the
    # rank-vector joins (10 joins fell back to sort-merge). The win only
    # exists for loops that cut lineage per round (opic, harmonic).
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.withColumn("h", F.lit(1.0))

    if iters < 1:
        # auth is only defined by the loop body; iters=0 used to surface
        # as an AttributeError in _norm (ADVICE r5 #3)
        raise ValueError("hits() needs iters >= 1")
    auth = None
    for i in range(iters):
        a_raw = (
            e.join(hubs, e["src"] == hubs["node"])
            .select(F.col("dst").alias("node"), F.col("h").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        auth = nodes.join(a_raw, "node", "left").select(
            "node", F.coalesce(F.col("__in"), F.lit(0.0)).alias("a")
        )
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .select(F.col("src").alias("node"), F.col("a").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        hubs = nodes.join(h_raw, "node", "left").select(
            "node", F.coalesce(F.col("__in"), F.lit(0.0)).alias("h")
        )
        if (i + 1) % checkpoint_every == 0:
            auth = auth.localCheckpoint(eager=False)
            hubs = hubs.localCheckpoint(eager=False)

    def _norm(df: DataFrame, col: str) -> DataFrame:
        nrm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("__n"))
        return df.crossJoin(F.broadcast(nrm)).select(
            "node", (F.col(col) / F.col("__n")).alias(col)
        )

    # no cut before the final norms: each _norm reads its vector twice
    # (1-row agg + main branch), but Spark's exchange reuse dedupes the
    # repeated subtrees — measured, an explicit checkpoint here costs
    # more than it saves
    return _norm(auth, "a").join(_norm(hubs, "h"), "node").select(
        "node", "a", "h"
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara, Phys. Rev. E 2007) over the UNDIRECTED view of a
    link graph — the crawl use is host-community discovery: link farms,
    mirror clusters, and topically-cohesive site groups surface as
    communities, feeding the trap/politeness budgets with a
    cluster-level knob (Gyöngyi's spam neighborhoods are communities
    before they are rankings).

    The paper's asynchronous random-order sweep is neither deterministic
    nor parallel; this is the standard BSP determinization: every node
    simultaneously adopts the most frequent label among its neighbors,
    ties broken by the SMALLEST label, labels initialized to the node id.
    Deterministic by construction — same input, same communities, any
    partitioning — which is what lets a DuckDB oracle replay it exactly
    (row_number over (count DESC, label ASC) ≡ the max-struct fold).

    Plan shape per iteration: one labels-onto-edges join (AQE broadcasts
    when the label table fits), one (node, label) count groupBy, then the
    argmax as a second groupBy folding ``max(struct(cnt, -label))`` —
    never a window over the full node set. The recurrence is
    single-reference, so lineage cuts follow :func:`pagerank`'s batched
    every-8 policy and the plan grows linearly in ``iters``. At 10^10
    edges the per-iteration traffic is the two keyed exchanges on
    (node, label) — label skew inside mega-communities is absorbed by
    the partial (map-side) count aggregation.

    Returns (node, label); nodes sharing a label share a community.
    """
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = fwd.union(
        fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for i in range(iters):
        cnt = (
            und.join(labels, und["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # most-frequent label, SMALLEST label on ties, as
        # min(struct(-count, label)): negating the (always numeric) count
        # instead of the label keeps the one-aggregation argmax while
        # working for string node ids too — the old max(struct(c, -label))
        # negated the label and threw CAST_INVALID_INPUT on the host-graph
        # use case this operator advertises (ADVICE r5 #2; fixed r6,
        # numeric-label results unchanged)
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("__m")
            )
            .select("node", F.col("__m.label").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction by tf-idf (Sparck Jones 1972) —
    the zero-model topic tagger a curation pipeline hangs mixture
    weights, domain caps, and dedup-cluster summaries on when no
    classifier is available. ``score = tf · ln(N/df)``, top-``k`` terms
    per doc, ties by term ascending — a total order, deterministic
    across partitionings.

    Plan shape: tokenize JVM-side with per-row ``array_distinct``-free
    full counting; shuffle #1 the (id, term) tf groupBy (map-side
    combine); df per term is a second groupBy REUSING the term key of
    the postings; the corpus size N is a 1-row aggregate attached by
    broadcast cross-join (no collect). The top-k is a row_number window
    partitioned BY DOC — each doc's posting list hashes to one
    partition, so the window never sees a global sort, and the exchange
    it rides is the same id-keyed shuffle the tf groupBy produced. At
    100 TB the vocabulary join (postings ⋈ df) is term-keyed — AQE
    broadcasts df only when a curated vocabulary fits.

    Empty/short docs simply contribute no rows. Returns
    (id, term, tf, score) with ≤ k rows per doc.
    """
    from pyspark.sql import Window

    did = F.col(id_col)
    toks = docs.select(did.alias("id"), alnum_words(text_col).alias("__w"))
    n_docs = toks.agg(F.count(F.lit(1)).alias("__n"))
    # r6: (id, term, tf) comes straight from the per-row term_counts
    # run-length kernel — every token of a doc is already co-located, so
    # the old explode → groupBy(id, term) exchange (the full tf table on
    # the wire) only regrouped co-located rows; the df groupBy's term
    # exchange is shared with the join below (same subtree →
    # ReusedExchange), leaving 2 exchanges on the tf table where the old
    # plan paid 3
    tf = (
        toks.select("id", F.explode(term_counts(F.col("__w"))).alias("__e"))
        .select("id", F.col("__e.term").alias("term"),
                F.col("__e.tf").alias("tf"))
        # materialized once: both the df aggregate and the score join
        # read tf; exchange reuse does not always dedupe the two
        # subtrees, and re-running them means re-tokenizing the corpus
        .localCheckpoint(eager=False)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id", "term", "tf",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "score")
    )


def cocitation_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_outdeg: int = 1000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Co-citation similarity (Small 1973; Bharat & Henzinger SIGIR'98
    related-pages): two pages are related when many pages link to BOTH.
    The crawl uses: related-page discovery for focused frontier
    expansion, and duplicate-host corroboration next to
    :func:`~context_crawler_spark.operators.text_dedup.mirror_hosts`
    (mirrored pages are co-cited by the same referrers).

    Pairs form INSIDE per-source outlink lists only — the posting-list
    pattern shared with winnow_pairs/mirror_hosts, never an all-pairs
    product over pages: a source with outdegree d contributes d(d-1)/2
    pairs, so mega-hubs (link farms, sitemaps-as-pages) are cut by the
    ``max_outdeg`` stop-list FIRST (the max_df analog; the dropped
    sources are exactly the ones whose co-citations are least
    discriminative, Bharat-Henzinger's own pruning argument). Plan:
    one outdeg groupBy, the hub filter, one src-keyed self-join (the
    pair explosion, bounded by max_outdeg²/2 per source), one pair
    groupBy with map-side combine. Output (a, b, n_common), a < b,
    n_common ≥ min_common.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__d"))
    small = e.join(
        outdeg.filter(F.col("__d") <= max_outdeg).select("src"), "src"
    )
    x = small.select("src", F.col("dst").alias("a"))
    y = small.select("src", F.col("dst").alias("b"))
    return (
        x.join(y, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
