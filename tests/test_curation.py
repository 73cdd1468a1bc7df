"""Corpus-curation operators: decontamination, PII redaction,
paragraph-level dedup, deterministic stratified sampling
(operators/curation.py). Plan-shape guards included — these run over the
100 TB side, so a stray corpus shuffle or a non-broadcast eval join is a
bug even when the values are right."""

from __future__ import annotations

from pyspark.sql import functions as F

from context_crawler_spark.operators.curation import (
    ngram_decontaminate,
    paragraph_dedup,
    rate_threshold_hex,
    redact_pii,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_flags_shared_ngram(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta eta"),      # contains eval 5-gram
        (2, "one two three four five six seven eight"),       # clean
        (3, "tiny doc"),                                      # < n words -> 0 grams
    ])
    eval_df = _docs(spark, [
        (100, "PRE alpha beta gamma delta epsilon POST"),
        (101, "xx"),                                          # too short: no grams
    ])
    out = {r["doc_id"]: r for r in ngram_decontaminate(train, eval_df, n=5).collect()}
    assert len(out) == 3
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1 and out[1]["n_grams"] == 3
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0 and out[2]["n_grams"] == 4
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_decontaminate_counts_distinct_hits_once(spark):
    # the same gram repeated in a train doc counts once (array_distinct
    # before the explode), and repeated eval occurrences don't multiply it
    train = _docs(spark, [(1, "a b c d e a b c d e")])
    eval_df = _docs(spark, [(9, "a b c d e"), (10, "z a b c d e z")])
    row = ngram_decontaminate(train, eval_df, n=5).collect()[0]
    assert row["n_hits"] == 1 and row["contaminated"]


def test_decontaminate_eval_side_broadcasts(spark):
    train = _docs(spark, [(1, "a b c d e f")])
    eval_df = _docs(spark, [(9, "a b c d e")])
    plan = ngram_decontaminate(train, eval_df, n=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus side must not be exchanged for the eval probe: the only
    # hash exchange keys on the train doc id (the matched-rows groupBy)
    assert plan.count("Exchange hashpartitioning") <= 2  # groupBy + none on probe


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_all_kinds(spark):
    d = _docs(spark, [
        (1, "mail a.b-c_d%x+1@sub.example.co.uk then 192.168.0.1 call 555-867-5309 done"),
        (2, "no pii here at all"),
        (3, "two mails x@y.io and z@w.ai plus 8.8.8.8 and 1.2.3.4"),
    ])
    out = {r["doc_id"]: r for r in redact_pii(d).collect()}
    assert out[1]["text_redacted"] == "mail <EMAIL> then <IP> call <PHONE> done"
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    assert out[2]["text_redacted"] == "no pii here at all"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[3]["text_redacted"] == "two mails <EMAIL> and <EMAIL> plus <IP> and <IP>"
    assert (out[3]["n_emails"], out[3]["n_ips"]) == (2, 2)


def test_redact_pii_zero_shuffle(spark):
    d = _docs(spark, [(1, "x@y.io")])
    plan = redact_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# paragraph dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_first_occurrence_wins(spark):
    blk_a = " ".join(f"a{i}" for i in range(25))
    blk_b = " ".join(f"b{i}" for i in range(25))
    blk_c = " ".join(f"c{i}" for i in range(25))
    d = _docs(spark, [
        (1, f"{blk_a} {blk_b}"),          # both kept (first occurrence)
        (2, f"{blk_a} {blk_c}"),          # loses blk_a, keeps blk_c
        (3, blk_b),                       # fully duplicated -> empty
    ])
    out = {r["doc_id"]: r for r in paragraph_dedup(d, block_words=25).collect()}
    assert (out[1]["n_blocks"], out[1]["n_kept"]) == (2, 2)
    assert out[1]["kept_text"] == f"{blk_a} {blk_b}"
    assert (out[2]["n_blocks"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["kept_text"] == blk_c
    assert (out[3]["n_blocks"], out[3]["n_kept"]) == (1, 0)
    assert out[3]["kept_text"] == ""


def test_paragraph_dedup_reassembles_in_order(spark):
    # 60 words -> blocks of 25/25/10; dedup within one doc: repeat block 0
    words = [f"w{i}" for i in range(25)]
    text = " ".join(words + ["mid"] * 25 + words[:10])
    d = _docs(spark, [(1, text)])
    out = paragraph_dedup(d, block_words=25).collect()[0]
    assert out["n_blocks"] == 3 and out["n_kept"] == 3
    assert out["kept_text"] == text  # all distinct -> identity, in order


def test_paragraph_dedup_hash_invariant(spark):
    d = _docs(spark, [
        (1, " ".join(f"x{i}" for i in range(40))),
        (2, " ".join(f"x{i}" for i in range(40))),
    ])
    a = sorted(map(tuple, paragraph_dedup(d, 25, hash_blocks=True).collect()))
    b = sorted(map(tuple, paragraph_dedup(d, 25, hash_blocks=False).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_rate_threshold_hex_bounds():
    assert rate_threshold_hex(0.0) == "00000000"
    assert rate_threshold_hex(1.0) == "zzzzzzzz"
    assert rate_threshold_hex(0.5) == "80000000"
    assert rate_threshold_hex(0.35) == "59999999"


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(d, {"en": 0.25}, default_rate=1.0)
    counts = {r["lang"]: r["cnt"] for r in
              out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert counts["de"] == 2000                      # default 1.0 keeps all
    assert abs(counts["en"] - 500) < 80              # ~0.25 of 2000
    # deterministic: identical kept set on a re-run and per-row replayable
    again = stratified_sample(d, {"en": 0.25}, default_rate=1.0)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_stratified_sample_zero_rate_and_plan(spark):
    d = spark.createDataFrame([(1, "en"), (2, "de")], "doc_id long, lang string")
    assert stratified_sample(d, {"en": 0.0, "de": 0.0}).count() == 0
    plan = stratified_sample(d, {"en": 0.5})._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_sample_flattens_and_clamps(spark):
    """alpha<1 downsamples the head language harder than the tail; a tiny
    tail language's rate clamps at 1.0 (a filter cannot upsample); the
    kept set is deterministic across re-runs."""
    from context_crawler_spark.operators.curation import temperature_sample

    rows = (
        [(i, "en") for i in range(3200)]
        + [(10000 + i, "de") for i in range(700)]
        + [(20000 + i, "sw") for i in range(100)]
    )
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(d, alpha=0.3, budget_frac=0.5)
    rates = {r["lang"]: r["keep_rate"] for r in
             out.select("lang", "keep_rate").distinct().collect()}
    # head downsampled below budget_frac, tail clamped at keep-everything
    assert rates["en"] < 0.5
    assert rates["sw"] == 1.0
    assert rates["en"] < rates["de"] < rates["sw"]
    counts = {r["lang"]: r["cnt"] for r in
              out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert counts["sw"] == 100                       # rate 1.0 keeps all
    assert abs(counts["en"] - 3200 * rates["en"]) < 120
    again = temperature_sample(d, alpha=0.3, budget_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # alpha=1 degenerates to uniform budget_frac for every language
    flat = temperature_sample(d, alpha=1.0, budget_frac=0.5)
    assert {r["keep_rate"] for r in
            flat.select("keep_rate").distinct().collect()} == {0.5}


def test_temperature_sample_null_stratum(spark):
    """ADVICE r4: NULL strata (undetected language) are a real stratum —
    they coalesce to the '__null__' sentinel, get their own derived rate,
    and survive into the output instead of vanishing through the
    never-matches-NULL equi-join."""
    from context_crawler_spark.operators.curation import temperature_sample

    rows = ([(i, "en") for i in range(3000)]
            + [(10000 + i, None) for i in range(60)])
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(d, alpha=0.3, budget_frac=0.5)
    null_kept = out.filter(F.col("lang").isNull())
    # the tiny NULL stratum clamps at keep-everything under alpha=0.3
    assert null_kept.count() == 60
    assert {r["keep_rate"] for r in
            null_kept.select("keep_rate").distinct().collect()} == {1.0}
    # the original lang column is preserved (NULL, not the sentinel)
    assert {r["lang"] for r in null_kept.select("lang").collect()} == {None}


def test_temperature_sample_corpus_never_shuffled(spark):
    """The corpus side reaches the filter through a broadcast join; the
    only hash exchange is the ≤#languages counts agg (plus its window)."""
    from context_crawler_spark.operators.curation import temperature_sample

    d = spark.createDataFrame(
        [(i, ["en", "de"][i % 2]) for i in range(100)],
        "doc_id long, lang string")
    out = temperature_sample(d, alpha=0.3, budget_frac=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # exchanges: counts groupBy + the unpartitioned window over ≤#langs
    # rows; the corpus scan itself must not hash-partition on anything
    assert plan.count("Exchange hashpartitioning") <= 1


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_sequences_offsets_and_boundaries(spark):
    from context_crawler_spark.operators.curation import pack_sequences

    d = _docs(spark, [
        (1, "a b c"),            # 3 tokens, offset 0, seq 0
        (2, " ".join(["w"] * 6)),  # offset 3..8 -> crosses the 8-boundary? no: 3+6-1=8 -> floor(8/8)=1 > 0 yes
        (3, "x"),                # offset 9, seq 1
    ])
    out = {r["doc_id"]: r for r in pack_sequences(d, window_tokens=8).collect()}
    assert (out[1]["offset"], out[1]["seq_id"], out[1]["crosses_boundary"]) == (0, 0, False)
    assert (out[2]["offset"], out[2]["seq_id"], out[2]["crosses_boundary"]) == (3, 0, True)
    assert (out[3]["offset"], out[3]["seq_id"], out[3]["crosses_boundary"]) == (9, 1, False)
    # offsets are a dense concatenation: sorted offsets + counts chain
    rows = sorted(out.values(), key=lambda r: r["offset"])
    for prev, cur in zip(rows, rows[1:]):
        assert cur["offset"] == prev["offset"] + prev["n_tokens"]


def test_pack_sequences_no_global_window(spark):
    from context_crawler_spark.operators.curation import pack_sequences

    d = _docs(spark, [(i, "t " * (i % 7 + 1)) for i in range(50)])
    plan = pack_sequences(d, 16)._jdf.queryExecution().executedPlan().toString()
    # the only window partitions by __pid (two-phase scan); a global
    # single-partition window would show 'Window [... ORDER BY' with no
    # partition spec and SinglePartition exchange
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# URL filtering (RefinedWeb / Dolma)
# ---------------------------------------------------------------------------


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_filter_domain_suffix_match(spark):
    from context_crawler_spark.operators.curation import url_filter

    d = _urls(spark, [
        (1, "https://ads.evil.test/x"),        # subdomain of blocked
        (2, "https://evil.test/x"),            # exact blocked
        (3, "https://notevil.test/x"),         # NOT a dot-suffix: survives
        (4, "https://good.org/x"),
    ])
    out = {r["doc_id"]: r for r in
           url_filter(d, ["evil.test"], {}, threshold=1.0).collect()}
    assert out[1]["domain_blocked"] and not out[1]["keep"]
    assert out[2]["domain_blocked"] and not out[2]["keep"]
    assert not out[3]["domain_blocked"] and out[3]["keep"]
    assert not out[4]["domain_blocked"] and out[4]["keep"]


def test_url_filter_word_score_threshold_and_case(spark):
    from context_crawler_spark.operators.curation import url_filter

    d = _urls(spark, [
        (1, "https://a.test/FREE-CASINO"),     # 0.5 + 1.0 -> blocked
        (2, "https://a.test/free-stuff"),      # 0.5 -> kept
        (3, "https://a.test/poker/free"),      # 0.6 + 0.5 >= 1.0 -> blocked
        (4, "https://a.test/docs"),            # 0.0
    ])
    w = {"casino": 1.0, "poker": 0.6, "free": 0.5}
    out = {r["doc_id"]: r for r in url_filter(d, [], w, threshold=1.0).collect()}
    assert out[1]["word_score"] == 1.5 and not out[1]["keep"]
    assert out[2]["word_score"] == 0.5 and out[2]["keep"]
    assert out[3]["word_score"] == 1.1 and not out[3]["keep"]
    assert out[4]["word_score"] == 0.0 and out[4]["keep"]


def test_url_filter_zero_shuffle(spark):
    from context_crawler_spark.operators.curation import url_filter

    d = _urls(spark, [(1, "https://a.test/x")])
    plan = url_filter(d, ["b.test"], {"w": 1.0})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_target_like_docs_score_higher(spark):
    from context_crawler_spark.operators.curation import dsir_weights

    # target vocabulary is medical-ish; corpus doc 1 shares it, doc 2 is
    # off-domain boilerplate — DSIR must rank doc 1 above doc 2
    corpus = _docs(spark, [
        (1, "patient dosage clinical trial dosage patient outcome"),
        (2, "click here buy now free shipping click here"),
    ])
    target = _docs(spark, [
        (10, "clinical patient dosage trial outcome study"),
        (11, "dosage outcome patient clinical analysis"),
    ])
    out = {r["doc_id"]: r["dsir_weight"] for r in
           dsir_weights(corpus, target).collect()}
    assert out[1] > out[2]


def test_dsir_feature_counts_with_multiplicity(spark):
    from context_crawler_spark.operators.curation import dsir_weights

    corpus = _docs(spark, [(1, "a b a")])   # unigrams a,b,a + bigrams "a b","b a"
    target = _docs(spark, [(9, "a")])
    out = dsir_weights(corpus, target).collect()
    assert len(out) == 1 and out[0]["n_feats"] == 5


def test_dsir_ratio_table_broadcasts(spark):
    from context_crawler_spark.operators.curation import dsir_weights

    corpus = _docs(spark, [(1, "a b c"), (2, "d e f")])
    target = _docs(spark, [(9, "a b")])
    plan = dsir_weights(corpus, target)._jdf.queryExecution() \
        .executedPlan().toString()
    # scoring join must be broadcast — the corpus side never shuffles on
    # the feature key; doc_id groupBy is the only data-sized exchange
    assert "BroadcastHashJoin" in plan


def test_domain_prior_semantics_and_broadcast(spark):
    """Per-host mean prior joined back; hosts under min_docs get a NULL
    (neutral) prior and pass; the join-back must be a broadcast (the
    corpus side is never shuffled)."""
    from context_crawler_spark.operators.curation import domain_prior

    rows = (
        [(i, "good.test", 100.0) for i in range(5)]
        + [(10 + i, "bad.test", 10.0) for i in range(5)]
        + [(20, "lone.test", 1.0)]
    )
    df = spark.createDataFrame(rows, "doc_id long, host string, score double")
    out = domain_prior(df, min_docs=3, keep_threshold=50.0)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["host_prior"] == 100.0 and got[0]["keep"]
    assert got[10]["host_prior"] == 10.0 and not got[10]["keep"]
    assert got[20]["host_prior"] is None and got[20]["keep"]  # too few docs
    assert got[20]["host_docs"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_mixture_plan_budget_cut(spark):
    """Two sources, weights 3:1, budget 40 -> budgets 30/10; docs taken
    whole in id order until the next doesn't fit."""
    from context_crawler_spark.operators.curation import mixture_plan

    rows = [
        (1, "a", "w " * 12),   # a: 12 tokens, cum_before 0  -> fits (<=30)
        (2, "a", "w " * 12),   # cum 12 -> 24 <= 30 fits
        (3, "a", "w " * 12),   # cum 24 -> 36 > 30 dropped
        (4, "b", "w " * 8),    # b: 8 <= 10 fits
        (5, "b", "w " * 8),    # cum 8 -> 16 > 10 dropped
    ]
    df = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in
           mixture_plan(df, {"a": 3, "b": 1}, total_tokens=40).collect()}
    assert [got[i]["selected"] for i in (1, 2, 3, 4, 5)] == [
        True, True, False, True, False]
    assert got[3]["cum_before"] == 24 and got[3]["budget"] == 30
    assert got[5]["cum_before"] == 8 and got[5]["budget"] == 10


def test_mixture_plan_unlisted_source_and_surplus(spark):
    """A source missing from weights gets budget 0 (nothing selected); a
    budget above the source's total selects everything."""
    from context_crawler_spark.operators.curation import mixture_plan

    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "zz", "x y")],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in
           mixture_plan(df, {"a": 1}, total_tokens=1000).collect()}
    assert got[1]["selected"] and got[1]["budget"] == 1000
    assert not got[2]["selected"] and got[2]["budget"] == 0


def test_mixture_plan_no_per_source_single_partition_window(spark):
    """The scan is the distributed prefix sum — the executed plan must not
    contain a single-partition window."""
    from context_crawler_spark.operators.curation import mixture_plan

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")],
        "doc_id long, source string, text string",
    )
    plan = (mixture_plan(df, {"a": 1, "b": 1}, 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# deterministic shuffle + sharding
# ---------------------------------------------------------------------------


def test_shuffle_shard_is_permutation_and_balanced(spark):
    from context_crawler_spark.operators.curation import shuffle_shard

    d = _docs(spark, [(i, f"doc {i}") for i in range(100)])
    out = shuffle_shard(d, seed="s1", n_shards=4).collect()
    poss = sorted(r["pos"] for r in out)
    assert poss == list(range(100))  # dense permutation positions
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    assert all(len(v) == 25 for v in by_shard.values())  # balanced
    # shards are CONTIGUOUS position chunks (one output file per shard
    # needs no extra exchange)
    for s, v in by_shard.items():
        v.sort()
        assert v == list(range(s * 25, (s + 1) * 25))


def test_shuffle_shard_deterministic_and_seed_sensitive(spark):
    from context_crawler_spark.operators.curation import shuffle_shard

    d = _docs(spark, [(i, f"doc {i}") for i in range(50)])
    a = {r["doc_id"]: r["pos"] for r in shuffle_shard(d, "sA").collect()}
    b = {r["doc_id"]: r["pos"] for r in
         shuffle_shard(d.repartition(7), "sA").collect()}
    c = {r["doc_id"]: r["pos"] for r in shuffle_shard(d, "sB").collect()}
    assert a == b  # pure function of (seed, data) — layout-independent
    assert a != c  # a different seed is a different permutation
    # actually shuffled: not the identity order
    assert [a[i] for i in range(50)] != list(range(50))


# ---------------------------------------------------------------------------
# classifier gate
# ---------------------------------------------------------------------------


def test_classifier_score_zero_shuffle_and_no_python(spark):
    from context_crawler_spark.operators.curation import classifier_score

    d = _docs(spark, [(1, "alpha beta gamma"), (2, "")])
    out = classifier_score(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_classifier_score_values(spark):
    from context_crawler_spark.operators.curation import classifier_score
    import hashlib

    def bucket(w):
        h = hashlib.md5(w.encode()).hexdigest()
        return int(h[0], 16) * 16 + int(h[1], 16)

    words = ["alpha", "beta", "gamma"]
    s = sum((bucket(w) * 2654435761) % 1001 for w in words)
    mean = round(s / (500.0 * 3) - 1.0, 6)
    import math
    score = round(1.0 / (1.0 + math.exp(-mean)), 6)

    d = _docs(spark, [(1, "Alpha beta, GAMMA!"), (2, ""), (3, "   ")])
    rows = {r["doc_id"]: r for r in classifier_score(d).collect()}
    assert rows[1]["n_words"] == 3
    assert rows[1]["mean_weight"] == mean
    assert rows[1]["score"] == score
    assert rows[1]["keep"] == (score >= 0.5)
    # empty docs: no words -> NULL score, keep=False (never a crash)
    for i in (2, 3):
        assert rows[i]["n_words"] == 0
        assert rows[i]["score"] is None and rows[i]["keep"] is False


# ---------------------------------------------------------------------------
# unicode normalization
# ---------------------------------------------------------------------------


def test_normalize_text_nfc_controls_whitespace(spark):
    from context_crawler_spark.operators.curation import normalize_text

    rows = [
        (1, "café time"),          # decomposed -> composed
        (2, "a\x07b\x00c"),              # controls stripped
        (3, "a  \t b\n\n\n\nc"),         # space runs + >2 newlines
        (4, "  already clean  "),
    ]
    d = _docs(spark, rows)
    out = {r["doc_id"]: r for r in normalize_text(d).collect()}
    assert out[1]["text_norm"] == "café time"
    assert out[1]["changed"] is True
    assert out[2]["text_norm"] == "abc"
    assert out[3]["text_norm"] == "a b\n\nc"
    assert out[4]["text_norm"] == "already clean"
    # NFC shortens the string; lengths are codepoint counts
    assert out[1]["n_chars_before"] == len("café time")
    assert out[1]["n_chars_after"] == len("café time")


# ---------------------------------------------------------------------------
# change-rate estimation (Cho & Garcia-Molina)
# ---------------------------------------------------------------------------


def test_estimate_change_rate_basics(spark):
    import datetime as dt

    from context_crawler_spark.sources.cdx import estimate_change_rate

    t0 = dt.datetime(2024, 1, 1)
    hour = dt.timedelta(hours=1)

    def caps(key, digests, gap_hours=24):
        return [(key, t0 + i * gap_hours * hour, d)
                for i, d in enumerate(digests)]

    rows = (
        caps("a)/fast", ["d1", "d2", "d3", "d4", "d5"], gap_hours=1)   # changes every capture
        + caps("b)/never", ["x", "x", "x", "x"], gap_hours=24)         # no change observed
        + caps("c)/single", ["y"])                                     # one capture
    )
    df = spark.createDataFrame(rows, "surt_key string, ts timestamp, digest string")
    out = {r["surt_key"]: r for r in estimate_change_rate(df).collect()}

    fast = out["a)/fast"]
    assert fast["n_changes"] == 4 and fast["n_captures"] == 5
    # every observed interval changed -> lambda high -> clamp at min 1h
    assert fast["revisit_sec"] == 3600

    never = out["b)/never"]
    assert never["n_changes"] == 0
    assert never["lambda_per_sec"] == 0.0  # -ln(1) == 0
    assert never["revisit_sec"] == 90 * 86400  # nothing observed -> max

    single = out["c)/single"]
    assert single["lambda_per_sec"] is None
    assert single["revisit_sec"] == 90 * 86400
    assert single["next_fetch_ts"] == t0 + dt.timedelta(seconds=90 * 86400)


def test_estimate_change_rate_single_shuffle(spark):
    import datetime as dt

    from context_crawler_spark.sources.cdx import estimate_change_rate

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k)/p", t0 + dt.timedelta(days=i), f"d{i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, "surt_key string, ts timestamp, digest string")
    plan = estimate_change_rate(df)._jdf.queryExecution().executedPlan().toString()
    # the lag window and the groupBy share ONE hash exchange on surt_key
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SinglePartition" not in plan


def test_domain_cap_two_phase_equals_naive_window(spark):
    """The salted two-phase top-k returns exactly the naive one-window
    result, including cross-salt tie ordering; hosts under the cap pass
    through whole."""
    from pyspark.sql import Window
    from context_crawler_spark.operators.curation import domain_cap

    rows = [(i, "big.example" if i < 40 else "small.example", (i * 7) % 13)
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, host string, n_chars long")
    got = {(r["doc_id"], r["domain_rank"])
           for r in domain_cap(df, cap=5, n_salts=4).collect()}
    w = Window.partitionBy("host").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc())
    want = {(r["doc_id"], r["rk"]) for r in
            df.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= 5).collect()}
    assert got == want
    assert sum(1 for (_, rk) in got if rk) == 10  # 5 per host, both hosts


# ---------------------------------------------------------------------------
# quantile_gate — exact global top-p selection
# ---------------------------------------------------------------------------


def _qg_naive(rows, frac):
    """Reference semantics: top ceil(frac*n) by (score desc, id asc)."""
    import math

    k = min(max(int(math.ceil(frac * len(rows))), 0), len(rows))
    return set(r[0] for r in
               sorted(rows, key=lambda r: (-r[1], r[0]))[:k])


def test_quantile_gate_equals_naive_rank(spark):
    from context_crawler_spark.operators.curation import quantile_gate

    rows = [(i, float((i * 37) % 101) + (i % 7) * 0.125) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    for frac in (0.1, 0.25, 0.5, 0.9):
        got = {r["doc_id"]
               for r in quantile_gate(df, frac, n_buckets=16).collect()}
        assert got == _qg_naive(rows, frac), frac


def test_quantile_gate_tie_flood_and_degenerate(spark):
    """Integer scores flood the boundary bucket with ties; all-equal
    scores degrade to the pure id-rank path. Both must stay exact."""
    from context_crawler_spark.operators.curation import quantile_gate

    rows = [(i, float(i % 5)) for i in range(200)]  # 5 distinct scores
    df = spark.createDataFrame(rows, "doc_id long, score double")
    got = {r["doc_id"] for r in quantile_gate(df, 0.3, n_buckets=8).collect()}
    assert got == _qg_naive(rows, 0.3)

    tied = [(i, 1.0) for i in range(100)]
    dft = spark.createDataFrame(tied, "doc_id long, score double")
    gott = {r["doc_id"] for r in quantile_gate(dft, 0.2).collect()}
    assert gott == set(range(20))  # id asc tie-break


def test_quantile_gate_edges(spark):
    from context_crawler_spark.operators.curation import quantile_gate

    rows = [(i, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    assert quantile_gate(df, 0.0).count() == 0
    assert quantile_gate(df, 1.0).count() == 50
    empty = df.limit(0)
    assert quantile_gate(empty, 0.5).count() == 0


def test_quantile_gate_no_window_no_single_partition(spark):
    """The selection never uses a window function at all (histogram prune
    + range-sort seq stamping), so the plan must contain neither a Window
    node nor a SinglePartition exchange — THE trap this operator exists
    to avoid at 100 TB."""
    from context_crawler_spark.operators.curation import quantile_gate

    rows = [(i, float((i * 13) % 97)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = quantile_gate(df, 0.4, n_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_stratified_quantile_gate_equals_per_stratum_rank(spark):
    """Per-stratum exact top-p == the naive PARTITION BY window, across
    uneven stratum sizes and within-stratum ties."""
    import math

    from context_crawler_spark.operators.curation import (
        stratified_quantile_gate)

    rows = []
    for s, size in (("en", 120), ("de", 37), ("zh", 5), ("fr", 1)):
        for i in range(size):
            rows.append((len(rows), s, float((i * 11) % 17)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    got = {r["doc_id"] for r in
           stratified_quantile_gate(df, 0.3, "lang", "score",
                                    n_buckets=8).collect()}
    want = set()
    for s in ("en", "de", "zh", "fr"):
        grp = [(i, sc) for i, lang, sc in rows if lang == s]
        kk = math.ceil(0.3 * len(grp))
        want |= {i for i, _ in sorted(grp, key=lambda t: (-t[1], t[0]))[:kk]}
    assert got == want


def test_stratified_quantile_gate_null_stratum_not_dropped(spark):
    """NULL-stratum rows select at their own rate (the temperature_sample
    NULL-vanish class of bug, pinned here from day one)."""
    from context_crawler_spark.operators.curation import (
        stratified_quantile_gate)

    rows = [(i, None, float(i)) for i in range(10)] + \
           [(100 + i, "en", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    got = {r["doc_id"] for r in
           stratified_quantile_gate(df, 0.2, "lang", "score").collect()}
    assert got == {8, 9, 108, 109}


def test_stratified_quantile_gate_all_tied_stratum(spark):
    """A stratum whose scores are all equal degrades to id-rank within
    that stratum only; other strata are unaffected."""
    from context_crawler_spark.operators.curation import (
        stratified_quantile_gate)

    rows = [(i, "aa", 7.0) for i in range(10)] + \
           [(100 + i, "bb", float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    got = {r["doc_id"] for r in
           stratified_quantile_gate(df, 0.5, "lang", "score").collect()}
    assert got == {0, 1, 2, 3, 4, 102, 103}


def test_exact_sample_size_determinism_seed(spark):
    """Exactly n rows; identical membership across partitionings; a
    different seed draws a different sample; n>=total passes through."""
    from context_crawler_spark.operators.curation import exact_sample

    rows = [(i,) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long")
    s1 = {r.doc_id for r in exact_sample(df, 50).collect()}
    s1b = {r.doc_id for r in exact_sample(df.repartition(13), 50).collect()}
    s2 = {r.doc_id for r in exact_sample(df, 50, seed=7).collect()}
    assert len(s1) == 50 and s1 == s1b
    assert s2 != s1 and len(s2) == 50
    assert exact_sample(df, 0).count() == 0
    assert exact_sample(df, 500).count() == 500
    assert exact_sample(df, 9999).count() == 500


# ---------------------------------------------------------------------------
# per-host template removal
# ---------------------------------------------------------------------------

_NAV = "home about contact"            # 3 words -> one B=3 block
_FOOT = "copyright acme corp"


def _site_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_host_template_removed_from_every_page(spark):
    """A block on >= ratio of a host's pages vanishes from ALL pages —
    including the first (contrast: paragraph_dedup keeps first)."""
    from context_crawler_spark.operators.curation import host_template_removal

    rows = [
        (1, "a", f"{_NAV} alpha beta gamma {_FOOT}"),
        (2, "a", f"{_NAV} delta epsi zeta {_FOOT}"),
        (3, "a", f"{_NAV} theta iota kappa {_FOOT}"),
        (4, "a", "lamb mu nu unique page body"),
    ]
    out = {r["doc_id"]: r for r in host_template_removal(
        _site_docs(spark, rows), block_words=3, min_pages=2, ratio=0.5,
    ).collect()}
    assert len(out) == 4
    # nav+footer on 3/4 pages >= 0.5 -> stripped everywhere
    for d in (1, 2, 3):
        assert "home" not in out[d]["kept_text"]
        assert "copyright" not in out[d]["kept_text"]
        assert out[d]["n_blocks"] == 3 and out[d]["n_kept"] == 1
    assert out[1]["kept_text"] == "alpha beta gamma"
    assert out[4]["n_kept"] == out[4]["n_blocks"]


def test_host_template_scoped_per_host_and_gates(spark):
    """The same block on two DIFFERENT hosts is not a template (a quote
    is not furniture); min_pages gates single-page hosts; ratio gates
    rare pairs on big hosts; an all-template page comes back ''."""
    from context_crawler_spark.operators.curation import host_template_removal

    quote = "to be or"
    rows = (
        # hosts b and c share `quote` once each -> kept on both
        [(10, "b", f"{quote} words here too"), (11, "c", f"{quote} and more words")]
        # host d: 10 pages, block on only 2 -> page_df/n_pages = 0.2 < 0.5
        + [(20 + i, "d", f"{_NAV} page d{i} filler" if i < 2
            else f"page d{i} body filler x") for i in range(10)]
        # host e: 2 pages, both ONLY the template -> kept_text ''
        + [(40, "e", _FOOT), (41, "e", _FOOT)]
    )
    out = {r["doc_id"]: r for r in host_template_removal(
        _site_docs(spark, rows), block_words=3, min_pages=2, ratio=0.5,
    ).collect()}
    assert quote in out[10]["kept_text"] and quote in out[11]["kept_text"]
    assert "home" in out[20]["kept_text"] and "home" in out[21]["kept_text"]
    assert out[40]["kept_text"] == "" and out[40]["n_kept"] == 0
    assert out[41]["n_blocks"] == 1


def test_host_template_partitioning_invariant_and_hashed_key(spark):
    """Same output under a different partitioning; the shipped xxhash64
    key path agrees with the string-key (oracle) path."""
    from context_crawler_spark.operators.curation import host_template_removal

    rows = [
        (i, f"s{i % 3}", f"{_NAV} body {i} text tail {_FOOT}")
        for i in range(30)
    ]
    df = _site_docs(spark, rows)
    a = {tuple(r) for r in host_template_removal(
        df, block_words=3, ratio=0.3).collect()}
    b = {tuple(r) for r in host_template_removal(
        df.repartition(7), block_words=3, ratio=0.3).collect()}
    c = {tuple(r) for r in host_template_removal(
        df, block_words=3, ratio=0.3, hash_blocks=False).collect()}
    assert a == b == c
