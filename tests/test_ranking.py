"""BM25 / PageRank / unigram-LM quality / repeated-span operators: small
hand-built inputs with independently computed expected values, plus plan
guards pinning the scale-critical shapes (term filter before the shuffle,
broadcast sides, JVM-only n-gram construction)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from context_crawler_spark.operators.quality_filter import unigram_logprob
from context_crawler_spark.operators.ranking import (
    alnum_words,
    bm25_topk,
    pagerank,
    tokenize_query,
)
from context_crawler_spark.operators.text_dedup import repeated_ngram_spans


def test_tokenize_query_normalizes_and_dedups():
    assert tokenize_query("Spark, spark HASH-join!") == ["hash", "join", "spark"]
    assert tokenize_query("...") == []


def test_alnum_words_drops_empty_pieces(spark):
    df = spark.createDataFrame([(1, "  Hello, WORLD!! 42 ")], "id long, text string")
    assert df.select(alnum_words("text").alias("w")).head()[0] == [
        "hello", "world", "42",
    ]


def _bm25_expected(docs, terms, k1=1.2, b=0.75):
    """Independent driver-side BM25 (plain Python, no Spark)."""
    toks = {i: [w for w in tokenize_all(t)] for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for ws in toks.values() if t in ws) for t in terms
    }
    out = {}
    for i, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if s:
            out[i] = s
    return out


def tokenize_all(text):
    import re

    return [w for w in re.sub(r"[^A-Za-z0-9]+", " ", text.lower()).split() if w]


def test_bm25_matches_reference_formula(spark):
    docs = [
        (1, "spark joins tables with hash join strategies"),
        (2, "the cat sat on the mat"),
        (3, "hash hash hash everywhere hash"),
        (4, "spark spark spark streaming"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, "spark hash", k=4).collect()}
    want = _bm25_expected(docs, ["hash", "spark"])
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_bm25_orders_desc_and_limits(spark):
    docs = [(i, "common word " + "match " * i) for i in range(1, 8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bm25_topk(df, "match", k=3).collect()
    assert len(rows) == 3
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_plan_no_fullwidth_shuffle(spark):
    """r6 plan guard: the single-pass bm25 has NO hash-partitioned
    exchange at all — per-term tfs are computed within the row, stats+df
    come from one 1-row aggregate (its exchange is the partial-agg
    SinglePartition merge, one row per partition), the top-k is
    TakeOrderedAndProject. The old guard (postings filtered before the
    exchange) is subsumed: the token stream never crosses the wire
    because no full-width exchange exists."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = bm25_topk(df, "b", k=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_pagerank_two_node_cycle(spark):
    """A↔B cycle: stationary ranks are exactly 0.5 each at every iteration."""
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    rows = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert rows[1] == pytest.approx(0.5) and rows[2] == pytest.approx(0.5)


def test_pagerank_star_and_dangling(spark):
    """1→3, 2→3; 3 dangles. One iteration from uniform:
    rank(3) = 0.15/3 + 0.85*(1/3 + 1/3); rank(1)=rank(2)=0.15/3.
    Dangling mass is dropped by design (module docstring)."""
    e = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    rows = {r["node"]: r["rank"] for r in pagerank(e, iters=1).collect()}
    assert rows[1] == pytest.approx(0.05)
    assert rows[3] == pytest.approx(0.15 / 3 + 0.85 * (2.0 / 3))
    assert sum(rows.values()) < 1.0  # sinks leak mass, documented


def test_pagerank_iterations_converge(spark):
    """Chain 1→2→3 + restart edges: later iterations change ranks less."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    e = spark.createDataFrame(edges, "src long, dst long")
    r5 = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    r9 = {r["node"]: r["rank"] for r in pagerank(e, iters=9).collect()}
    for k in r5:
        assert r9[k] == pytest.approx(r5[k], abs=2e-2)
    assert sum(r9.values()) == pytest.approx(1.0, abs=1e-6)  # no sinks here


def test_unigram_logprob_scores_and_buckets(spark):
    """'common common' docs outrank a rare-word doc; buckets follow rank."""
    docs = [
        (1, "common common common common"),
        (2, "common common rare1 rare2"),
        (3, "unique1 unique2 unique3 unique4"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert rows[1]["logprob"] > rows[2]["logprob"] > rows[3]["logprob"]
    assert (rows[1]["bucket"], rows[2]["bucket"], rows[3]["bucket"]) == (1, 2, 3)
    assert rows[1]["n_tokens"] == 4
    # doc1: every token is 'common' with corpus count 6 of 12 total
    assert rows[1]["logprob"] == pytest.approx(round(math.log(6 / 12), 6))


def test_repeated_spans_counts(spark):
    """Two docs share one 3-gram window; a third is unique; a doc shorter
    than n contributes no rows."""
    shared = "alpha beta gamma"
    docs = [
        (1, f"{shared} one two"),
        (2, f"zero {shared} nine"),
        (3, "p q r s t"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repeated_ngram_spans(df, n=3).collect()}
    assert 4 not in rows  # below n words → no n-grams → no row
    # doc1 grams: 'alpha beta gamma','beta gamma one','gamma one two'
    assert rows[1]["n_grams"] == 3 and rows[1]["n_dup_grams"] == 1
    # doc2 grams: 'zero alpha beta','alpha beta gamma','beta gamma nine'
    assert rows[2]["n_grams"] == 3 and rows[2]["n_dup_grams"] == 1
    assert rows[3]["n_dup_grams"] == 0
    assert rows[1]["dup_frac"] == pytest.approx(round(1 / 3, 6))


def test_repeated_spans_within_doc_repeat(spark):
    """A gram occurring twice in the SAME doc counts as duplicated."""
    df = spark.createDataFrame(
        [(1, "x y z x y z")], "doc_id long, text string"
    )
    r = repeated_ngram_spans(df, n=3).head()
    # grams: xyz, yzx, zxy, xyz → 4 grams, 2 dup (the two xyz occurrences)
    assert r["n_grams"] == 4 and r["n_dup_grams"] == 2


def test_repeated_spans_hash_invariance(spark):
    """hash_grams=True (production xxhash64 keys) and False (raw strings)
    agree on every per-doc statistic."""
    docs = [(i, f"w{i} common span words here tail{i} more pad") for i in range(6)]
    docs += [(100, "common span words here filler a b c")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
         for r in repeated_ngram_spans(df, n=4, hash_grams=True).collect()}
    b = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
         for r in repeated_ngram_spans(df, n=4, hash_grams=False).collect()}
    assert a == b


def test_repeated_spans_gram_build_is_jvm_only(spark):
    """n-gram construction must be pure built-in expressions — no
    Python/Arrow eval stage before the first exchange."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = repeated_ngram_spans(df, n=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# RRF fusion / hybrid retrieval
# ---------------------------------------------------------------------------


def test_leg_ranks_orders_and_breaks_ties(spark):
    from context_crawler_spark.operators.ranking import leg_ranks

    leg = spark.createDataFrame(
        [(5, 0.9), (2, 0.9), (7, 1.4), (9, 0.1)], "doc_id long, score double"
    )
    got = {r["id"]: r["rank"] for r in leg_ranks(leg).collect()}
    # 1.4 first; the 0.9 tie broken by ascending id
    assert got == {7: 1, 2: 2, 5: 3, 9: 4}


def test_rrf_fuse_math_and_missing_leg(spark):
    from context_crawler_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 3.0), (2, 2.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 9.0), (3, 1.0)], "doc_id long, score double")
    rows = {r["doc_id"]: r for r in rrf_fuse([a, b], k_rrf=60, topk=10).collect()}
    # doc 2: rank 2 in a, rank 1 in b -> 1/62 + 1/61; docs 1,3: one leg each
    assert rows[2]["n_legs"] == 2
    assert abs(rows[2]["rrf_score"] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert rows[1]["n_legs"] == 1 and abs(rows[1]["rrf_score"] - round(1 / 61, 6)) < 1e-9
    assert rows[3]["n_legs"] == 1 and abs(rows[3]["rrf_score"] - round(1 / 62, 6)) < 1e-9
    # both-legs doc outranks single-leg docs
    order = [r["doc_id"] for r in rrf_fuse([a, b]).collect()]
    assert order[0] == 2


def test_rrf_fuse_no_global_window(spark):
    """Leg ranking must stay a self-join count — no single-partition
    window on the query surface."""
    from context_crawler_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame([(1, 3.0), (2, 2.0)], "doc_id long, score double")
    plan = rrf_fuse([a, a])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_hybrid_search_prefers_both_leg_hits(spark):
    """A doc present in both legs beats docs present in one, regardless
    of the legs' (incomparable) score scales."""
    from context_crawler_spark.operators.ranking import hybrid_search

    docs = spark.createDataFrame(
        [(0, "spark join hash customer spark join"),   # strong lexical
         (1, "unrelated words entirely different"),
         (2, "spark customer once")],                  # weak lexical
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_search(docs, emb, "spark customer", [1.0, 0.0], k=3, k_leg=3)
    rows = out.collect()
    assert rows[0]["doc_id"] == 0 and rows[0]["n_legs"] == 2


def test_anchor_text_agg_tops_and_stats(spark):
    """Top-k anchors by (count DESC, anchor ASC); indegree counts every
    in-link, n_src distinct linking pages; anchors trimmed."""
    from context_crawler_spark.operators.ranking import anchor_text_agg

    edges = [
        ("a", "t", "docs"), ("b", "t", "docs "), ("c", "t", "home"),
        ("a", "t", "api"), ("a", "t", "api"), ("b", "t", "zzz"),
        ("a", "u", "only"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, anchor string")
    got = {r["dst"]: r for r in anchor_text_agg(df, k=3).collect()}
    t = got["t"]
    # counts: docs=2 (trimmed), api=2, home=1, zzz=1 → ties broken ASC
    assert t["top_anchors"] == "api|docs|home"
    assert t["top_count"] == 2
    assert t["indegree"] == 6 and t["n_src"] == 3
    u = got["u"]
    assert u["top_anchors"] == "only" and u["indegree"] == 1 and u["n_src"] == 1


def test_anchor_text_agg_window_is_per_dst(spark):
    """The top-k window partitions by dst — no single-partition global
    window may appear in the physical plan."""
    from context_crawler_spark.operators.ranking import anchor_text_agg

    df = spark.createDataFrame(
        [("a", "t", "x")], "src string, dst string, anchor string")
    plan = (anchor_text_agg(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "SinglePartition" not in plan


def test_harmonic_centrality_path_graph(spark):
    """a->b->c->d: H_3(a) = 1 + 1/2 + 1/3; self/cycle exclusion via a
    back-edge d->a must not count a at any depth from a."""
    from context_crawler_spark.operators.ranking import harmonic_centrality

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r for r in harmonic_centrality(df, radius=3).collect()}
    a = got["a"]
    assert (a["n_d1"], a["n_d2"], a["n_d3"]) == (1, 1, 1)
    assert abs(a["harmonic"] - (1 + 0.5 + 1 / 3)) < 1e-6
    # d reaches a(1), b(2), c(3) — the cycle closes but d itself is
    # never re-counted from d
    d = got["d"]
    assert (d["n_d1"], d["n_d2"], d["n_d3"]) == (1, 1, 1)


def test_harmonic_centrality_min_distance_wins(spark):
    """Diamond a->b, a->c, b->d, c->d, a->d: d is at distance 1 from a
    (direct edge), not 2 — MIN over paths."""
    from context_crawler_spark.operators.ranking import harmonic_centrality

    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["node"]: r for r in harmonic_centrality(df, radius=2).collect()}["a"]
    assert (a["n_d1"], a["n_d2"]) == (3, 0)
    assert abs(a["harmonic"] - 3.0) < 1e-9


def test_hyperball_tracks_exact_on_small_graph(spark):
    """HyperBall estimates vs the exact operator on a 60-node ring with
    chords: at lg_k=12 and ball sizes ≤ 60 the HLL sketches are in the
    sparse exact regime, so estimates match the exact counts closely."""
    from context_crawler_spark.operators.ranking import (
        harmonic_centrality, hyperball,
    )

    n = 60
    edges = [(i, (i + 1) % n) for i in range(n)] + [
        (i, (i + 7) % n) for i in range(0, n, 3)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    exact = {r["node"]: r for r in harmonic_centrality(df, radius=3).collect()}
    est = {r["node"]: r for r in hyperball(df, radius=3, lg_k=12).collect()}
    assert set(exact) == set(est)
    for node, e in exact.items():
        h = est[node]
        # cumulative ball sizes vs cumulative exact counts
        for k in (1, 2, 3):
            exact_ball = sum(e[f"n_d{j}"] for j in range(1, k + 1))
            assert abs(h[f"nf_{k}"] - exact_ball) <= max(1.0, 0.05 * exact_ball)
        assert abs(h["harmonic_est"] - e["harmonic"]) <= max(
            0.5, 0.1 * e["harmonic"]
        )


def test_hyperball_plan_has_no_python(spark):
    """The HyperBall loop is pure JVM sketch aggregation — no Python
    workers in the physical plan."""
    from context_crawler_spark.operators.ranking import hyperball

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = (hyperball(df, radius=2)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_ngram_lm_backoff_arithmetic(spark):
    """Hand-computed stupid backoff on a 2-doc corpus (self-trained).

    Corpus: "a b c" and "a b d" -> N=6; C(a)=C(b)=2, C(c)=C(d)=1;
    C(a b)=2, C(b c)=C(b d)=1; C(a b c)=C(a b d)=1.
    Doc 1 positions: S(a)=2/6; S(b|a)=C(a b)/C(a)=1.0;
    S(c|a b)=C(a b c)/C(a b)=0.5.
    """
    from context_crawler_spark.operators.quality_filter import ngram_lm_score

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in ngram_lm_score(df).collect()}
    want = round(math.log(2 / 6), 6) + 0.0 + round(math.log(0.5), 6)
    assert rows[1]["n_scored"] == 3
    assert rows[1]["avg_logscore"] == pytest.approx(want / 3, abs=2e-6)
    assert rows[1]["lp_micro"] == rows[2]["lp_micro"]  # symmetric docs


def test_ngram_lm_backoff_levels_and_oov(spark):
    """Separate train corpus: a seen bigram scores C(bi)/C(ctx); an
    unseen trigram with seen bigram backs off once (alpha*); a fully
    OOV token gets alpha^2 * 0.5/N at position>=2."""
    from context_crawler_spark.operators.quality_filter import ngram_lm_score

    train = spark.createDataFrame(
        [(10, "x y z"), (11, "x y w")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(1, "x y q")], "doc_id long, text string")
    out = ngram_lm_score(score, train=train).head()
    # N=6: pos0 S(x)=2/6; pos1 S(y|x)=C(x y)/C(x)=1.0;
    # pos2 q: trigram+bigram unseen, unigram OOV -> 0.4*0.4*(0.5/6)
    want = (round(math.log(2 / 6) * 1e6)
            + round(math.log(1.0) * 1e6)
            + round(math.log(0.16 * 0.5 / 6) * 1e6))
    assert out["n_scored"] == 3
    assert abs(out["lp_micro"] - want) <= 3  # ln() ulp per position


def test_ngram_lm_repetitive_beats_rare(spark):
    """The CCNet-gate ordering: a doc of corpus-common phrases outranks
    a rare-token doc; empty docs emit no row."""
    from context_crawler_spark.operators.quality_filter import ngram_lm_score

    docs = [
        (1, "the quick fox " * 6),
        (2, "the quick fox jumps high"),
        (3, "zeta omega epsilon"),
        (4, "   ...   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in ngram_lm_score(df).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["avg_logscore"] > rows[2]["avg_logscore"] \
        > rows[3]["avg_logscore"]


def test_bm25_indexed_equals_per_query_form(spark, tmp_path):
    """The persisted-postings query path must return EXACTLY the scores
    the one-shot bm25_topk computes over the same corpus — through a real
    parquet round-trip of the index, partitioned by term_bucket, with the
    bucket prune reaching the scan."""
    from context_crawler_spark.operators.ranking import (
        bm25_topk_indexed, build_postings_index,
    )

    docs = [
        (1, "spark joins tables with hash join strategies"),
        (2, "the cat sat on the mat"),
        (3, "hash hash hash everywhere hash"),
        (4, "spark spark spark streaming"),
        (5, "hash join customer orders pipeline"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    postings, stats = build_postings_index(df, term_buckets=16)
    pdir, sdir = str(tmp_path / "postings"), str(tmp_path / "stats")
    postings.write.partitionBy("term_bucket").parquet(pdir)
    stats.write.parquet(sdir)
    loaded_p = spark.read.parquet(pdir)
    loaded_s = spark.read.parquet(sdir)

    direct = bm25_topk(df, "spark hash customer", k=5).collect()
    indexed = bm25_topk_indexed(loaded_p, loaded_s, "spark hash customer",
                                k=5, term_buckets=16).collect()
    assert [(r["doc_id"], r["score"]) for r in direct] == \
        [(r["doc_id"], r["score"]) for r in indexed]

    # the term_bucket prune reaches the parquet scan as a partition filter
    plan = bm25_topk_indexed(
        loaded_p, loaded_s, "spark hash customer", k=5, term_buckets=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "term_bucket" in plan.split("PartitionFilters:", 1)[1][:200]


def test_trustrank_flows_from_seeds_and_starves_spam(spark):
    """Trust mass reaches pages the seed links to; a link farm with no
    path from any seed ends at exactly zero — the spam-demotion property
    plain PageRank lacks (the farm's reciprocal links would give it plain
    rank). An edgeless seed still holds teleport mass."""
    from context_crawler_spark.operators.ranking import pagerank, trustrank

    edges = spark.createDataFrame(
        [
            ("seed", "good"), ("good", "deeper"),       # trusted chain
            ("spamA", "spamB"), ("spamB", "spamA"),     # reciprocal farm
        ],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("seed",), ("island",)], "node string")
    got = {r["node"]: r["rank"] for r in trustrank(edges, seeds).collect()}
    assert got["seed"] > 0 and got["island"] > 0
    assert got["good"] > got["deeper"] > 0          # trust decays outward
    assert got["spamA"] == 0.0 and got["spamB"] == 0.0
    # plain PageRank would have paid the farm — that's the point
    pr = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert pr["spamA"] > 0
    # teleport mass splits over the seed set: rank0(seed) = 1/|S|
    assert got["island"] == pytest.approx(0.15 * 0.5, abs=1e-9)


def test_opic_hand_computed_one_round(spark):
    """One BSP round on 1→2, 2→{1,3} (3 dangling), hand-computed:
    D0 = 1/3 routes through the virtual node; importance sums to 1."""
    from context_crawler_spark.operators.ranking import opic_importance

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3)], "src int, dst int")
    got = {r["node"]: r["importance"]
           for r in opic_importance(edges, iters=1).collect()}
    assert got[1] == pytest.approx(11 / 36, abs=1e-12)
    assert got[2] == pytest.approx(14 / 36, abs=1e-12)
    assert got[3] == pytest.approx(11 / 36, abs=1e-12)


def test_opic_cash_conserved_and_hub_wins(spark):
    """Total cash is exactly 1 per round (virtual-node redistribution),
    so importance sums to 1 after any number of rounds; a node every
    page links to out-earns the leaves."""
    from context_crawler_spark.operators.ranking import opic_importance

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
         ("a", "b")],
        "src string, dst string",
    )
    rows = opic_importance(edges, iters=6).collect()
    got = {r["node"]: r["importance"] for r in rows}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["hub"] > max(got["b"], got["c"])
    assert all(v > 0 for v in got.values())


def test_opic_deep_iteration_stays_linear(spark):
    """Each OPIC round reads its state three times, so the per-round
    lineage cut (checkpoint_every=1 default) is load-bearing: 12 rounds
    must analyze+run in bounded time instead of building a 3^12-node
    plan, and cash stays conserved through every cut."""
    from context_crawler_spark.operators.ranking import opic_importance

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
    got = {r["node"]: r["importance"]
           for r in opic_importance(edges, iters=12).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_host_graph_psl_ports_intra_and_nulls(spark):
    """Registered-domain election (PSL shortcut: example.co.uk), port and
    subdomain stripping, intra-domain edges dropped, unparseable URLs
    dropped, and both weights: n_links counts edges, n_src_pages counts
    distinct linking pages."""
    from context_crawler_spark.operators.ranking import host_graph

    edges = spark.createDataFrame(
        [
            ("https://www.example.co.uk/a", "https://cdn.other.com/x"),
            ("https://docs.example.co.uk/b", "https://other.com:8080/y"),
            ("https://www.example.co.uk/a", "https://img.other.com/z"),
            # intra-domain: navigation, not endorsement
            ("https://www.example.co.uk/a", "https://blog.example.co.uk/c"),
            ("not a url", "https://other.com/"),
        ],
        "src_url string, dst_url string",
    )
    rows = host_graph(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_dom"], r["dst_dom"]) == ("example.co.uk", "other.com")
    assert r["n_links"] == 3
    assert r["n_src_pages"] == 2


def test_phrase_search_counts_overlapping_occurrences(spark):
    """'a a a' contains 'a a' twice (overlapping starts) — the window
    fold must count every start, not disjoint matches; punctuation and
    case fold through the shared tokenizer."""
    from context_crawler_spark.operators.ranking import phrase_search

    df = spark.createDataFrame(
        [(1, "A, a; a b"), (2, "x a a y a a"), (3, "b c d"), (4, "a")],
        "doc_id long, text string")
    rows = phrase_search(df, "a a", k=10).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in rows] == [(1, 2), (2, 2)]
    # single-term phrase degenerates to plain tf; short docs don't error
    one = phrase_search(df, "a", k=10).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in one] == [(2, 4), (1, 3), (4, 1)]
    assert phrase_search(df, "b c d", k=10).collect()[0]["doc_id"] == 3
    assert phrase_search(df, "missing words", k=10).count() == 0
    with pytest.raises(ValueError):
        phrase_search(df, "...")


def test_phrase_search_plan_is_shuffle_free_scan(spark):
    """The scan path's only exchange is the final top-k (which Spark
    plans as TakeOrderedAndProject, not a sort shuffle) — no join, no
    aggregate, no Python in the plan."""
    from context_crawler_spark.operators.ranking import phrase_search

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = phrase_search(df, "a b", k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for bad in ("Exchange hashpartitioning", "SortMergeJoin",
                "BroadcastHashJoin", "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, bad


def test_phrase_search_indexed_equals_scan_path(spark, tmp_path):
    """The positional-index path must return EXACTLY what the scan path
    returns — through a real parquet round-trip partitioned by
    term_bucket, with the bucket prune reaching the scan. Includes a
    duplicate-term phrase (two offsets of the same term share one
    postings row) and a phrase crossing doc start (shift < 0 filtered)."""
    from context_crawler_spark.operators.ranking import (
        build_positional_index, phrase_search, phrase_search_indexed)

    docs = [
        (1, "a a a b"),
        (2, "x a a y a a"),
        (3, "b a b a b"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "quick brown quick brown quick"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_positional_index(df, term_buckets=16)
    pdir = str(tmp_path / "pos")
    idx.write.partitionBy("term_bucket").parquet(pdir)
    loaded = spark.read.parquet(pdir)

    for phrase in ("a a", "b a b", "quick brown", "quick brown quick",
                   "the lazy dog", "a", "no such phrase"):
        direct = phrase_search(df, phrase, k=10).collect()
        indexed = phrase_search_indexed(
            loaded, phrase, k=10, term_buckets=16).collect()
        assert [tuple(r) for r in direct] == [tuple(r) for r in indexed], phrase

    plan = phrase_search_indexed(
        loaded, "quick brown", k=5, term_buckets=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "term_bucket" in plan.split("PartitionFilters:", 1)[1][:200]


def test_positional_index_serves_plain_tf(spark):
    """size(positions) == the tf build_postings_index computes — one
    index can serve both BM25 and phrase queries."""
    from context_crawler_spark.operators.ranking import (
        build_positional_index, build_postings_index)

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b b c")], "doc_id long, text string")
    pos = build_positional_index(df, term_buckets=8)
    flat, _ = build_postings_index(df, term_buckets=8)
    got = {(r["term"], r["id"]): len(r["positions"]) for r in pos.collect()}
    want = {(r["term"], r["id"]): r["tf"] for r in flat.collect()}
    assert got == want


def test_hits_bipartite_symmetric(spark):
    """Hubs {1,2} → authorities {3,4}, complete bipartite: the stable
    point is a = h = 1/√2 on the respective sides, 0 off-side, and both
    vectors are unit-L2 after every iteration."""
    from context_crawler_spark.operators.ranking import hits

    e = spark.createDataFrame(
        [(1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    rows = {r["node"]: r for r in hits(e, iters=3).collect()}
    inv = 1.0 / math.sqrt(2.0)
    for hub in (1, 2):
        assert rows[hub]["h"] == pytest.approx(inv)
        assert rows[hub]["a"] == pytest.approx(0.0)
    for auth in (3, 4):
        assert rows[auth]["a"] == pytest.approx(inv)
        assert rows[auth]["h"] == pytest.approx(0.0)
    assert sum(r["a"] ** 2 for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["h"] ** 2 for r in rows.values()) == pytest.approx(1.0)


def test_hits_matches_numpy_power_iteration(spark):
    """Asymmetric graph vs an independent numpy replay of the same
    normalized recurrence, exact per-iteration semantics."""
    import numpy as np

    from context_crawler_spark.operators.ranking import hits

    edges = [(1, 3), (1, 4), (2, 3), (4, 3), (3, 5), (2, 5)]
    nodes = sorted({u for e in edges for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.ones(len(nodes))
    for _ in range(4):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["node"]: r for r in hits(e, iters=4).collect()}
    for n in nodes:
        assert rows[n]["a"] == pytest.approx(a[idx[n]], abs=1e-9)
        assert rows[n]["h"] == pytest.approx(h[idx[n]], abs=1e-9)


def _lpa_reference(edges, iters):
    """Driver-side replay of the deterministic synchronous LPA recurrence."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = {a for a, _ in und}
    lab = {n: n for n in nodes}
    for _ in range(iters):
        new = {}
        for n in nodes:
            cnt = {}
            for a, b in und:
                if a == n:
                    cnt[lab[b]] = cnt.get(lab[b], 0) + 1
            new[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        lab = new
    return lab


def test_label_propagation_two_triangles(spark):
    """Disconnected triangles each flood to their min node id; labels
    never leak across components."""
    from context_crawler_spark.operators.ranking import label_propagation

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4)],
        "src long, dst long",
    )
    out = {r["node"]: r["label"] for r in label_propagation(e, iters=5).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_label_propagation_matches_reference_replay(spark):
    """Mid-flood states on an irregular sparse graph match the
    driver-side synchronous replay exactly, at two iteration counts."""
    from context_crawler_spark.operators.ranking import label_propagation

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
             (8, 1), (2, 6), (10, 11), (11, 12), (3, 3), (12, 10)]
    e = spark.createDataFrame(edges, "src long, dst long")
    for iters in (2, 5):
        want = _lpa_reference(edges, iters)
        got = {r["node"]: r["label"]
               for r in label_propagation(e, iters=iters).collect()}
        assert got == want


def test_label_propagation_duplicate_and_reverse_edges_collapse(spark):
    """Duplicate directed edges and pre-reversed pairs must not inflate
    neighbor-label counts (undirected-distinct semantics)."""
    from context_crawler_spark.operators.ranking import label_propagation

    base = [(1, 2), (2, 3)]
    noisy = base + [(2, 1), (1, 2), (3, 2), (2, 3), (1, 2)]
    a = {r["node"]: r["label"] for r in label_propagation(
        spark.createDataFrame(base, "src long, dst long"), iters=4).collect()}
    b = {r["node"]: r["label"] for r in label_propagation(
        spark.createDataFrame(noisy, "src long, dst long"), iters=4).collect()}
    assert a == b


def test_tfidf_keywords_hand_computed(spark):
    """Doc-discriminating terms outrank corpus-wide ones; ubiquitous
    terms score ln(N/N)=0; ties fall to lexicographic term order."""
    from context_crawler_spark.operators.ranking import tfidf_keywords

    rows = [
        (1, "shared shared apple apple apple"),
        (2, "shared banana banana"),
        (3, "shared cherry"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in tfidf_keywords(df, k=2).collect():
        out.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["score"]))
    ln3 = math.log(3.0)
    assert out[1][0] == ("apple", 3, pytest.approx(3 * ln3))
    assert out[1][1] == ("shared", 2, pytest.approx(0.0))
    assert out[2][0] == ("banana", 2, pytest.approx(2 * ln3))
    assert out[3][0] == ("cherry", 1, pytest.approx(ln3))
    # 'shared' appears in every doc: score exactly 0, still rankable
    assert all(t[0] != "shared" or t[2] == pytest.approx(0.0)
               for ts in out.values() for t in ts)


def test_tfidf_keywords_k_cap_and_empty_docs(spark):
    """At most k rows per doc; docs with no tokens emit nothing."""
    from context_crawler_spark.operators.ranking import tfidf_keywords

    rows = [(1, "a b c d e f g h"), (2, "   "), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tfidf_keywords(df, k=3).collect()
    assert len(got) == 3 and all(r["doc_id"] == 1 for r in got)


def test_cocitation_pairs_hand_graph_and_hub_cut(spark):
    """Referrers 1,2 both cite {10,11} → pair (10,11) with n_common=2;
    a mega-hub above max_outdeg contributes no pairs; duplicate edges
    collapse; output is canonical a < b."""
    from context_crawler_spark.operators.ranking import cocitation_pairs

    edges = [(1, 10), (1, 11), (2, 10), (2, 11), (2, 10),  # dup edge
             (3, 10), (3, 12),
             # hub 9 cites everything — must be cut at max_outdeg=3
             (9, 10), (9, 11), (9, 12), (9, 13)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"]): r["n_common"]
           for r in cocitation_pairs(e, min_common=2, max_outdeg=3).collect()}
    assert got == {(10, 11): 2}
    # raising the cap lets the hub corroborate more pairs
    got2 = {(r["a"], r["b"]): r["n_common"]
            for r in cocitation_pairs(e, min_common=2, max_outdeg=10).collect()}
    assert got2[(10, 11)] == 3 and got2[(10, 12)] == 2


def test_tfidf_keywords_window_partitions_by_doc(spark):
    """The top-k window partitions BY DOC — a global single-partition
    window (the classic tf-idf-rank trap) must never appear. The only
    SinglePartition exchange allowed is the 1-row n_docs aggregate."""
    from context_crawler_spark.operators.ranking import tfidf_keywords

    d = spark.createDataFrame(
        [(i, f"word{i} common text here") for i in range(50)],
        "doc_id long, text string",
    )
    plan = tfidf_keywords(d, k=3)._jdf.queryExecution().executedPlan().toString()
    wins = [ln for ln in plan.splitlines()
            if "Window" in ln and "row_number" in ln]
    assert wins and all("id#" in ln for ln in wins)
    # the 1-row corpus-count agg is the single permitted SinglePartition
    assert plan.count("Exchange SinglePartition") <= 1


def test_cocitation_no_cartesian_no_single_partition(spark):
    """Pairs form via the src-keyed self-join — never a cartesian
    product over pages, never a single-partition exchange."""
    from context_crawler_spark.operators.ranking import cocitation_pairs

    e = spark.createDataFrame(
        [(i % 10, (i * 7) % 40) for i in range(200)], "src long, dst long"
    )
    plan = cocitation_pairs(e)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan


def test_label_propagation_no_single_partition(spark):
    """The per-iteration argmax is a max-struct groupBy fold, not a
    window — no single-partition exchange anywhere in the loop."""
    from context_crawler_spark.operators.ranking import label_propagation

    e = spark.createDataFrame(
        [(i % 20, (i * 3) % 20) for i in range(100)], "src long, dst long"
    )
    plan = label_propagation(e, iters=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" not in plan


def test_label_propagation_string_nodes(spark):
    """r6 (ADVICE r5 #2): host-community discovery runs on host STRINGS —
    the negation-free argmax (min(struct(-count, label))) must flood
    string labels; the old form negated the label and threw under ANSI."""
    from context_crawler_spark.operators.ranking import label_propagation

    e = spark.createDataFrame(
        [("a.test", "b.test"), ("b.test", "c.test"), ("c.test", "a.test"),
         ("x.test", "y.test"), ("y.test", "z.test"), ("z.test", "x.test")],
        "src string, dst string",
    )
    out = {r["node"]: r["label"]
           for r in label_propagation(e, iters=5).collect()}
    assert out == {"a.test": "a.test", "b.test": "a.test",
                   "c.test": "a.test", "x.test": "x.test",
                   "y.test": "x.test", "z.test": "x.test"}


def test_hits_zero_iters_raises(spark):
    """r6 (ADVICE r5 #3): iters=0 is a loud ValueError, not an
    AttributeError from the undefined auth vector."""
    import pytest

    from context_crawler_spark.operators.ranking import hits

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        hits(e, iters=0)


def test_let1_value_equals_unbound(spark):
    """r6 (VERDICT r5 #6a): let1(e, fn) is value-identical to fn(e) for
    randomized expressions — the binding changes evaluation count, never
    the value."""
    import random

    from context_crawler_spark.operators.ranking import let1

    rnd = random.Random(7)
    df = spark.createDataFrame(
        [(i, " ".join(f"w{rnd.randint(0, 9)}" for _ in range(rnd.randint(0, 12))))
         for i in range(50)],
        "id long, text string",
    )
    words = alnum_words("text")

    def fn(w):
        return F.concat_ws(
            "|",
            F.array_join(w, "-"),
            F.size(w).cast("string"),
            F.array_join(F.slice(w, 1, 3), "+"),
        )

    got = df.select("id", let1(words, fn).alias("v")).collect()
    want = df.select("id", fn(words).alias("v")).collect()
    assert sorted((r["id"], r["v"]) for r in got) == \
        sorted((r["id"], r["v"]) for r in want)


def test_let1_single_evaluation_in_plan(spark):
    """r6 (VERDICT r5 #6b): under a filter pushed below the projection —
    the phrase-search shape — the let1-bound tokenizer appears ONCE in
    the optimized plan, while the unbound alias is inlined into every
    element_at reference. A Spark upgrade that changes CollapseProject /
    pushdown behavior fails this loudly."""
    from context_crawler_spark.operators.ranking import let1

    df = spark.createDataFrame([(1, "a b c")], "id long, text string")
    words = alnum_words("text")

    def tf_of(w):
        return (F.element_at(w, 1) == F.lit("a")).cast("int") \
            + (F.element_at(w, 2) == F.lit("b")).cast("int") \
            + (F.element_at(w, 3) == F.lit("c")).cast("int")

    bound = df.select("id", let1(words, tf_of).alias("v")).filter("v > 0")
    unbound = df.select("id", tf_of(words).alias("v")).filter("v > 0")
    p_bound = bound._jdf.queryExecution().optimizedPlan().toString()
    p_unbound = unbound._jdf.queryExecution().optimizedPlan().toString()
    # pushdown copies the aliased value into the Filter, so the tokenizer
    # appears once per CONSUMING EXPRESSION (Filter + Project = 2). The
    # disease let1 prevents is per-ELEMENT inlining: unbound, every
    # element_at reference carries its own copy (3 per expression here).
    # Count tokenizer EVALUATIONS via array_remove (exactly one per
    # alnum_words tree — regexp_replace appears twice per tree since the
    # r6 two-pass character-class rewrite, which broke the old constant).
    assert p_bound.count("array_remove") == 2, p_bound
    assert p_unbound.count("array_remove") == 6, p_unbound
