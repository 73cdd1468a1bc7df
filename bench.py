"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR plus the
north-star frontier-scheduling throughput on a large synthetic frontier.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "frontier": {"n_urls": N, "sched_urls_per_sec": X,
                "extract_pages_per_sec": Y}}

Query timing materializes results with the noop sink (full execution, no
driver collect). The frontier bench runs ONE scheduling round over a
Zipf-skewed synthetic frontier generated JVM-side (no Python in datagen):
politeness (salted two-phase windows) + claim-order batch emission +
xxhash64 identity — the per-round hot path of the engine.

The two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8 from N
to 4N) is tools/scaling_bench.py (separate spark-submit-style processes at
local[8] and local[32]); results land in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "crawl_round_sim",
    "claim_order",
    "politeness_budget",
    "url_seen_antijoin",
    "asof_join",
    "sessionize",
    "pricing_summary",
    "shipping_priority",
    "broadcast_dim_join",
    "token_split_buckets",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "embedding_near_dup",
    "text_stats",
    "gopher_quality",
    "gopher_repetition",
    "topk_cosine",
    "knn_join",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "chunk_documents",
    "chunk_split_plan",
    "bm25_search",
    "pagerank",
    "unigram_quality",
    "repeated_spans",
    "decontaminate",
    "pii_redact",
    "paragraph_dedup",
    "stratified_sample",
    "hybrid_search",
    "pack_sequences",
    "cdx_index",
    "url_filter",
    "dsir_weights",
    "c4_clean",
    "c4_span_dedup",
    "harmonic_centrality",
    "hyperball",
    "mixture_plan",
    "shuffle_shard",
    "classifier_filter",
    "normalize_text",
    "change_rate",
    "justext",
    "focused_priority",
    "soft404",
    "dust_rules",
    "ngram_lm",
    "semantic_dedup",
    "domain_cap",
    "unigram_entropy",
    "temperature_sample",
    "conditional_fetch",
    "adaptive_delay",
    "bm25_indexed",
    "trustrank",
    "exact_incremental",
    "aged_priority",
    "resolve_redirects",
    "canonical_key",
    "cache_control",
    "meta_robots",
    "opic_priority",
    "host_graph",
    "cms_heavy_hitters",
    "quantile_gate",
    "stratified_quantile_gate",
    "containment_pairs",
    "containment_dedup",
    "exact_sample",
    "host_template",
    "winnow_pairs",
    "approx_quantiles",
    "mirror_hosts",
    "phrase_search",
    "phrase_search_indexed",
    "hits",
    "exact_substring",
    "host_communities",
    "dup_representatives",
    "tfidf_keywords",
    "cocitation",
]


def _noop_write(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _timed(fn, *args) -> float:
    t0 = time.time()
    fn(*args)
    return time.time() - t0


def _warmup(spark) -> None:
    """Absorb one-time costs (JVM codegen, Python-worker spawn + imports)
    so per-query timings measure the queries, not session startup."""
    from pyspark.sql import functions as F

    from context_crawler_spark.functions.udfs import quality_score_udf

    spark.range(100_000).select(F.xxhash64("id")).write.mode(
        "overwrite").format("noop").save()
    spark.range(1000).select(
        quality_score_udf(F.lit("warm up the python workers"))
    ).write.mode("overwrite").format("noop").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        _noop_write(fn(spark, sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def bench_frontier(spark, n_urls: int) -> dict[str, float]:
    """One BSP scheduling round over a synthetic frontier: identity hashing,
    per-host politeness, claim-ordered batch — the north-star hot path."""
    from pyspark.sql import functions as F

    from context_crawler_spark.operators.ordering import emit_fetch_batch
    from context_crawler_spark.operators.politeness import apply_politeness
    from context_crawler_spark.sources.synthetic_web import synthetic_frontier

    frontier = synthetic_frontier(spark, n_urls, n_hosts=10_000, zipf_exponent=1.3)
    frontier = frontier.withColumn("url_hash", F.xxhash64("url"))
    # warm the input (datagen excluded from the scheduling measurement)
    frontier = frontier.persist()
    frontier.count()
    # best of 4: single samples on this box swing 2-5x with residual JVM/
    # page-cache state from whatever ran before (see BENCH.md variance
    # note; the r3 'regression' was exactly this — an isolated rerun of
    # the unchanged path matched r2)
    sched_s = float("inf")
    for _ in range(4):
        t0 = time.time()
        polite = apply_politeness(frontier, budget_per_host=1000)
        batch = emit_fetch_batch(polite, max_batch=1_000_000)
        _noop_write(batch)
        sched_s = min(sched_s, time.time() - t0)
    frontier.unpersist()
    return {
        "n_urls": n_urls,
        "sched_sec": round(sched_s, 3),
        "sched_urls_per_sec": round(n_urls / sched_s, 1),
    }


def bench_extract(spark, sf_dir: str) -> dict[str, float]:
    """Vectorized extraction throughput: documents text wrapped in the
    deterministic HTML subset, then title/text/link extraction UDFs — the
    per-page fetch-stage cost."""
    from pyspark.sql import functions as F

    from context_crawler_spark.functions.udfs import make_extract_page_udf

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>Doc "), F.col("doc_id").cast("string"),
            F.lit('</title></head><body><nav><a href="/a">a</a></nav><article><h1>H</h1><p>'),
            F.col("text"),
            F.lit('</p><p><a href="/next">next</a></p></article></body></html>'),
        ),
        "utf-8",
    )
    # small parquet = 1 file = 1 task; spread across the cores explicitly
    n_part = spark.sparkContext.defaultParallelism * 2
    pages = d.repartition(n_part).select(
        F.concat(F.lit("https://"), "source", F.lit(".test/"),
                 F.col("doc_id").cast("string")).alias("url"),
        html.alias("html"),
    ).persist()
    n = pages.count()
    page_udf = make_extract_page_udf("article")
    ex = pages.withColumn("__page", page_udf("html", "url"))
    out = ex.select(
        F.col("__page.title").alias("title"),
        F.col("__page.text").alias("text"),
        F.size("__page.links").alias("n_links"),
    )
    # best of 3 (same rationale as bench_frontier's best-of-4): sample 1
    # pays the one-time Python-worker spawn+import for every core — a
    # fixed session cost, not per-page work — and single samples swing
    # with residual box load
    dt = min(_timed(_noop_write, out) for _ in range(3))
    pages.unpersist()
    return {"n_pages": n, "extract_sec": round(dt, 3),
            "extract_pages_per_sec": round(n / dt, 1)}


def bench_ann_recall(spark, sf_dir: str, n_queries: int = 50,
                     k: int = 10) -> dict:
    """recall@10 sweep of the ANN paths vs exact ground truth on the
    benchmark embeddings (VERDICT r3 #2: the shipped defaults must match
    the documented quality bar, chosen from a ≥50-query sweep). Ground
    truth = ONE knn_join pass; each sweep point answers ALL queries in one
    job via the batch ANN APIs (lsh_topk_batch / ivf_topk_batch — result-
    identical to the single-query forms, pytest-pinned). Recall here is
    data-dependent: the synthetic bench vectors are near-orthogonal
    (ANN's worst case); tests/test_ann_recall.py pins ≥0.9 floors on
    clustered embeddings at the SAME shipped defaults. ``*_default``
    keys mark the configuration the headline queries run."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from context_crawler_spark.operators.search import (
        ivf_topk_batch, knn_join, lsh_topk_batch, make_lsh_bucket_udf,
    )

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < n_queries).collect()
    ]
    gt: dict[int, set] = {}
    for r in knn_join(e, queries, k=k).collect():
        gt.setdefault(r["query_id"], set()).add(r["vec_id"])
    udf = make_lsh_bucket_udf(dim=64, n_tables=8, bits_per_table=8)
    indexed_lsh = e.withColumn("lsh_buckets", udf("embedding")).persist()
    indexed_lsh.count()
    cents, indexed_ivf = entrymod._ivf_index(spark, sf_dir)

    def _avg_recall(df) -> tuple[float, float]:
        t0 = time.time()
        rows = df.collect()
        dt = time.time() - t0
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return round(
            sum(len(got.get(q, set()) & gt[q]) / k for q, _ in queries)
            / len(queries), 3), round(dt, 3)

    out: dict = {"k": k, "n_queries": len(queries)}
    for flips in (0, 1, 2):
        key = "lsh_flips%d%s" % (flips, "_default" if flips == 2 else "")
        out[key], out[key + "_sec"] = _avg_recall(lsh_topk_batch(
            indexed_lsh, queries, k=k, dim=64, n_tables=8,
            bits_per_table=8, probe_flips=flips))
    # _default moved 8 → 12 in r5 (VERDICT r4 #3): recall parity with the
    # LSH path; the *_sec columns ARE the measured cost of the move
    for nprobe in (4, 6, 8, 12):
        key = "ivf_nprobe%d%s" % (nprobe, "_default" if nprobe == 12 else "")
        out[key], out[key + "_sec"] = _avg_recall(ivf_topk_batch(
            indexed_ivf, cents, queries, k=k, nprobe=nprobe))
    indexed_lsh.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_frontier = int(os.environ.get("BENCH_FRONTIER_URLS", 5_000_000))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from context_crawler_spark.session import get_spark

    spark = get_spark(app_name="cc-spark-bench", cores=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # machine-load context per sample (VERDICT r3 #1: recorded numbers on
    # this shared box swing ±50% with co-tenant load; loadavg makes a
    # loaded run distinguishable from a regression in the artifact itself)
    load_start = [round(x, 2) for x in os.getloadavg()]
    _warmup(spark)
    # build-or-load the IVF index BEFORE timing: index construction is the
    # offline build step (VERDICT r2 #1 — the query path loads, never
    # trains); on a fresh /tmp the first q_ann_ivf_topk would otherwise be
    # charged a one-time ~25 s training cost that is not query work. The
    # cost is still recorded (ivf_build_or_load_sec) rather than hidden.
    import __spark_entry__ as entrymod
    t0 = time.time()
    entrymod._ivf_index(spark, sf_dir)
    ivf_build_s = round(time.time() - t0, 3)
    # the north-star frontier metrics run FIRST, on a fresh session: when
    # they ran last (r3/early-r4 layout) they inherited a JVM degraded by
    # 33 queries + the 50-query recall sweep (GC debt, dozens of stale
    # Python UDF workers, loadavg 15+) and read 3-30x low — the artifact
    # then recorded box residue, not the operator (VERDICT r3 #1)
    frontier = bench_frontier(spark, n_frontier)
    extract = bench_extract(spark, sf_dir)
    load_mid = [round(x, 2) for x in os.getloadavg()]
    queries = bench_queries(spark, sf_dir)
    ann_recall = bench_ann_recall(spark, sf_dir)
    load_end = [round(x, 2) for x in os.getloadavg()]

    # r2 widened the suite from 16 to 20 queries (simhash_dedup,
    # embedding_near_dup, ann_lsh_topk, ann_ivf_topk); r1_comparable_total
    # keeps the original-16 subtotal so round-over-round totals compare
    # like for like.
    r2_added = {"simhash_dedup", "embedding_near_dup",
                "ann_lsh_topk", "ann_ivf_topk"}
    r3_added = {"gopher_quality", "gopher_repetition"}
    r4_added = {"chunk_split_plan", "bm25_search", "pagerank",
                "unigram_quality", "repeated_spans"}
    # curation family added late in r4 (decontamination, PII, paragraph
    # dedup, stratified sampling) — excluded from earlier-round subtotals
    r4b_added = {"decontaminate", "pii_redact", "paragraph_dedup",
                 "stratified_sample", "hybrid_search", "pack_sequences",
                 "cdx_index", "url_filter", "dsir_weights"}
    # final r4 session: C4 cleaning pair + host-graph centrality
    r4c_added = {"c4_clean", "c4_span_dedup", "harmonic_centrality",
                 "hyperball", "mixture_plan", "shuffle_shard",
                 "classifier_filter", "normalize_text", "change_rate"}
    # late-r4 sessions: crawl hygiene (jusText/focused/soft-404/DUST) and
    # the LM/semantic curation family — excluded from every earlier
    # subtotal (they were silently inflating r1-r4 comparables before)
    r4d_added = {"justext", "focused_priority", "soft404", "dust_rules",
                 "ngram_lm", "semantic_dedup", "domain_cap",
                 "unigram_entropy", "temperature_sample",
                 "conditional_fetch", "adaptive_delay", "bm25_indexed",
                 "trustrank", "exact_incremental", "aged_priority",
                 "resolve_redirects", "canonical_key", "cache_control",
                 "meta_robots"}
    # r5: OPIC/HITS/LPA graph family, sketches, quantile gates,
    # containment/winnowing/mirror dedup, phrase search, ExactSubstr
    # removal, representative election — excluded from every earlier
    # subtotal so round-over-round totals compare like for like
    r5_added = {"opic_priority", "host_graph", "cms_heavy_hitters",
                "quantile_gate", "stratified_quantile_gate",
                "containment_pairs", "containment_dedup", "exact_sample",
                "host_template", "winnow_pairs", "approx_quantiles",
                "mirror_hosts", "phrase_search", "phrase_search_indexed",
                "hits", "exact_substring", "host_communities",
                "dup_representatives", "tfidf_keywords", "cocitation"}
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "r1_comparable_total": round(
            sum(v for k, v in queries.items()
                if k not in r2_added | r3_added | r4_added | r4b_added
                | r4c_added | r4d_added | r5_added), 3),
        "r2_comparable_total": round(
            sum(v for k, v in queries.items()
                if k not in r3_added | r4_added | r4b_added | r4c_added
                | r4d_added | r5_added), 3),
        "r3_comparable_total": round(
            sum(v for k, v in queries.items()
                if k not in r4_added | r4b_added | r4c_added
                | r4d_added | r5_added), 3),
        "r4_comparable_total": round(
            sum(v for k, v in queries.items()
                if k not in r4b_added | r4c_added | r4d_added
                | r5_added), 3),
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "frontier": {**frontier, **extract},
        "ivf_build_or_load_sec": ivf_build_s,
        "ann_recall_at_10": ann_recall,
        "loadavg": {"start": load_start, "after_frontier": load_mid,
                    "end": load_end},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
