"""spark-submit entrypoint for the training-data curation pipeline.

Composes the curation operators into the standard webtext cleaning flow
(CCNet/Gopher/Dolma order) as ONE Spark application over a documents
table (doc_id, text, lang, ...):

    quality gate (Gopher rules)            zero shuffle
    -> exact dedup (min-id keeper)         1 shuffle: content hash
    -> paragraph-level dedup               2 shuffles: block hash, doc_id
    -> eval-set decontamination (optional) broadcast probe
    -> PII redaction                       zero shuffle
    -> stratified sampling (optional)      zero shuffle
    -> temperature sampling (optional)     counts agg + broadcast (p^alpha)
    -> sequence packing stats (optional)   distributed prefix scan

Cluster usage:

    spark-submit --master <cluster> \\
        --py-files dist/context_crawler_spark.zip \\
        tools/curate.py --input /data/documents --output /data/clean \\
        --eval-set /data/benchmarks --sample en=0.35,zh=0.8 --pack 2048

Local smoke: python tools/curate.py --demo

Prints ONE JSON line of per-stage row counts (the numbers a pipeline
operator watches: how much each stage dropped).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_rates(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k.strip()] = float(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="documents parquet (doc_id, text, lang)")
    ap.add_argument("--output", help="cleaned parquet output dir")
    ap.add_argument("--demo", action="store_true",
                    help="run on the bundled sf0.001 test table")
    ap.add_argument("--eval-set", default=None,
                    help="parquet of eval/benchmark docs to decontaminate against")
    ap.add_argument("--decontaminate-n", type=int, default=8,
                    help="word n-gram size for the overlap probe")
    ap.add_argument("--block-words", type=int, default=50,
                    help="paragraph-dedup block size (words)")
    ap.add_argument("--temperature", default=None,
                    help="alpha[,budget_frac] — XLM-R p^alpha language "
                         "rebalancing with rates DERIVED from corpus "
                         "counts (e.g. 0.3,0.5); alternative to --sample")
    ap.add_argument("--sample", default=None,
                    help="per-language keep rates, e.g. en=0.35,zh=0.8")
    ap.add_argument("--pack", type=int, default=0,
                    help="emit sequence-packing layout stats at this window")
    ap.add_argument("--url-col", default=None,
                    help="URL column for the pre-gate URL filter (skipped "
                         "if the input has no URL column)")
    ap.add_argument("--block-domains", default=None,
                    help="comma-separated blocked domains (suffix match)")
    ap.add_argument("--dsir-target", default=None,
                    help="parquet of in-domain target docs: keep rows whose "
                         "DSIR importance weight is positive")
    ap.add_argument("--c4", action="store_true",
                    help="apply C4 line rules + page gates (Raffel et al. "
                         "2020 §2.2) before the Gopher gate; pages need "
                         "real line structure — punctuation-free corpora "
                         "(e.g. --demo) drop entirely")
    ap.add_argument("--badwords", default=None,
                    help="comma-separated page-drop word list for --c4")
    ap.add_argument("--normalize", action="store_true",
                    help="NFC + control-strip + whitespace-collapse the "
                         "text BEFORE any hashing/dedup (CCNet/Dolma "
                         "pre-hash cleaning)")
    ap.add_argument("--justext", action="store_true",
                    help="jusText boilerplate removal: classify \\n\\n-"
                         "separated blocks, keep GOOD blocks, drop pages "
                         "with none (runs before the C4/Gopher page gates)")
    ap.add_argument("--justext-params", default="80,200,30,32",
                    help="length_low,length_high,stopwords_low_pct,"
                         "stopwords_high_pct for --justext (jusText paper "
                         "defaults; retune per corpus/stoplist)")
    ap.add_argument("--classifier-threshold", type=float, default=None,
                    help="keep only docs whose hashed-linear classifier "
                         "score (DCLM/FineWeb-Edu-style gate) is >= this")
    ap.add_argument("--shuffle-shards", type=int, default=0,
                    help="final layout: deterministic training-order "
                         "shuffle, write partitioned into this many "
                         "contiguous shards")
    ap.add_argument("--shuffle-seed", default="epoch0",
                    help="seed for --shuffle-shards (new seed = new "
                         "reproducible permutation)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    if not args.demo and not args.input:
        ap.error("--input required (or --demo)")

    from pyspark.sql import functions as F

    from context_crawler_spark.operators.curation import (
        ngram_decontaminate, paragraph_dedup, redact_pii, stratified_sample,
    )
    from context_crawler_spark.operators.quality_filter import gopher_filter
    from context_crawler_spark.operators.text_dedup import exact_dedup
    from context_crawler_spark.session import get_spark

    spark = get_spark(app_name="curate", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    inp = args.input or "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(inp)
    stats: dict[str, object] = {"input": docs.count()}

    # 0. URL filter (RefinedWeb §3.1) — runs before any text is touched,
    # since it needs only the URL column (at crawl scale this gate sits
    # in front of the FETCH, not just the curation pass)
    if args.url_col and args.block_domains and args.url_col in docs.columns:
        from context_crawler_spark.operators.curation import url_filter

        docs = (
            url_filter(docs, args.block_domains.split(","), {},
                       url_col=args.url_col)
            .filter(F.col("keep"))
            .drop("host", "domain_blocked", "word_score", "keep")
        )
        stats["after_url_filter"] = docs.count()

    # 0a. Unicode + whitespace normalization — FIRST text-touching stage:
    # every hash downstream (exact dedup, paragraph blocks, minhash) must
    # see composed, control-free bytes or equal documents won't collide
    if args.normalize:
        from context_crawler_spark.operators.curation import normalize_text

        docs = (
            normalize_text(docs)  # pure projection — zero shuffle
            .withColumn("text", F.col("text_norm"))
            .drop("text_norm", "changed", "n_chars_before", "n_chars_after")
        )
        stats["after_normalize"] = docs.count()

    # 0a2. jusText boilerplate removal — block-level, BEFORE the page
    # gates: C4/Gopher judge whole pages, so nav/footer boilerplate left
    # in the text skews their stats; zero shuffle
    if args.justext:
        from context_crawler_spark.operators.boilerplate import (
            justext_classify,
        )

        lo, hi, slo, shi = (int(x) for x in args.justext_params.split(","))
        docs = (
            justext_classify(
                docs.withColumn("blocks", F.split("text", r"\n{2,}")),
                length_low=lo, length_high=hi,
                stopwords_low_pct=slo, stopwords_high_pct=shi,
            )
            .filter(F.col("n_good") > 0)
            .withColumn("text", F.col("content_text"))
            .drop("blocks", "jt_words", "jt_chars", "jt_stops", "jt_cf",
                  "jt_class", "content_text", "n_blocks", "n_good")
        )
        stats["after_justext"] = docs.count()

    # 0b. C4 cleaning (line rules + page gates): the other canonical web
    # gate, zero shuffle; rewrites text to the surviving lines
    if args.c4:
        from context_crawler_spark.operators.c4 import c4_line_clean

        docs = c4_line_clean(
            docs,
            badwords=args.badwords.split(",") if args.badwords else None,
        )
        stats["after_c4"] = docs.count()

    # 1. Gopher quality gate — content rules only (the stop-word/line
    # rules need real prose; flags are all computed, callers can tighten)
    flagged = gopher_filter(docs, keep_flags=True)
    gated = flagged.filter(
        F.col("f_word_count") & F.col("f_mean_word_len")
        & F.col("f_symbol_ratio") & F.col("f_alpha_words")
    ).select(*docs.columns)
    stats["after_quality"] = gated.count()

    # 2. exact dedup (normalized text, min-id keeper)
    deduped = exact_dedup(gated)
    stats["after_exact_dedup"] = deduped.count()

    # 3. paragraph-level dedup; keep docs that retain any block, swap in
    # the deduplicated text
    para = paragraph_dedup(deduped, block_words=args.block_words)
    deduped = (
        deduped.join(para.filter(F.col("n_kept") > 0), "doc_id")
        .withColumn("text", F.col("kept_text"))
        .drop("n_blocks", "n_kept", "kept_text")
    )
    stats["after_paragraph_dedup"] = deduped.count()

    # 4. decontamination (drop any doc sharing an n-gram with the eval set)
    if args.eval_set:
        eval_docs = spark.read.parquet(args.eval_set)
        marks = ngram_decontaminate(deduped, eval_docs, n=args.decontaminate_n)
        deduped = deduped.join(
            marks.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
        )
        stats["after_decontaminate"] = deduped.count()

    # 5. PII redaction (replace text with the scrubbed version)
    red = redact_pii(deduped)
    deduped = (
        red.withColumn("text", F.col("text_redacted"))
        .drop("text_redacted", "n_emails", "n_ips", "n_phones")
    )

    # 5b. DSIR selection: keep docs whose hashed-ngram importance weight
    # vs the in-domain target is positive (more target-like than raw)
    if args.dsir_target:
        from context_crawler_spark.operators.curation import dsir_weights

        target = spark.read.parquet(args.dsir_target)
        w = dsir_weights(deduped, target)
        deduped = deduped.join(
            w.filter(F.col("dsir_weight") > 0).select("doc_id"), "doc_id"
        )
        stats["after_dsir"] = deduped.count()

    # 5c. model-based quality gate (DCLM/FineWeb-Edu stage): hashed-linear
    # classifier score, zero shuffle (stand-in weight table — trained
    # weights drop in as a literal)
    if args.classifier_threshold is not None:
        from context_crawler_spark.operators.curation import classifier_score

        keep = classifier_score(
            deduped, threshold=args.classifier_threshold
        ).filter(F.col("keep")).select("doc_id")
        deduped = deduped.join(keep, "doc_id")
        stats["after_classifier"] = deduped.count()

    # 6. stratified sampling
    if args.sample:
        deduped = stratified_sample(deduped, parse_rates(args.sample)).drop(
            "sample_key"
        )
        stats["after_sample"] = deduped.count()

    # 6a. temperature sampling (rates derived from the corpus itself)
    if args.temperature:
        from context_crawler_spark.operators.curation import (
            temperature_sample,
        )

        parts = [float(x) for x in args.temperature.split(",")]
        alpha = parts[0]
        frac = parts[1] if len(parts) > 1 else 0.5
        deduped = temperature_sample(
            deduped, alpha=alpha, budget_frac=frac
        ).drop("sample_key", "keep_rate")
        stats["after_temperature"] = deduped.count()

    # 6b. final trainer layout: deterministic shuffle + contiguous shards
    # (reproducible across reruns; one range exchange, shard = position
    # chunk so partitionBy writes one file group per shard)
    if args.shuffle_shards:
        from context_crawler_spark.operators.curation import shuffle_shard

        deduped = shuffle_shard(
            deduped, seed=args.shuffle_seed, n_shards=args.shuffle_shards
        ).drop("shuffle_key")
        stats["shuffle_shards"] = args.shuffle_shards

    if args.output:
        w = deduped.write.mode("overwrite")
        if args.shuffle_shards:
            w = deduped.sortWithinPartitions("pos").write.mode(
                "overwrite").partitionBy("shard")
        w.parquet(args.output)
        stats["output"] = args.output
    stats["final"] = deduped.count()

    # 7. packing layout stats (how many training sequences this corpus fills)
    if args.pack:
        from context_crawler_spark.operators.curation import pack_sequences

        packed = pack_sequences(deduped, window_tokens=args.pack)
        agg = packed.agg(
            F.sum("n_tokens").alias("tokens"),
            (F.max(F.col("offset") + F.col("n_tokens"))
             / args.pack).alias("seqs"),
            F.sum(F.col("crosses_boundary").cast("long")).alias("crossers"),
        ).head()
        stats["pack"] = {
            "window": args.pack,
            "total_tokens": int(agg["tokens"] or 0),
            "n_sequences": int(-(-(agg["seqs"] or 0) // 1)),
            "boundary_crossers": int(agg["crossers"] or 0),
        }

    print(json.dumps(stats))


if __name__ == "__main__":
    main()
