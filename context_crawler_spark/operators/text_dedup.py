"""Document deduplication family — the training-data-pipeline operators.

Beyond the reference's URL-level dedup (RequestQueue uniqueKey), a webtext
corpus at 100 TB needs CONTENT dedup. Five strategies, all following the
same shape — cheap fingerprint (vectorized UDF or pure built-ins) →
LSH-style candidate bucketing (explode + shuffle on bucket key, never an
all-pairs product) → exact verification on candidates only → connected
components → keep one representative per cluster:

  * exact:      xxhash64 of normalized text (pure built-ins, one shuffle)
  * minhash:    char-shingle MinHash signatures, banded LSH (Broder; the
                standard web-dedup pipeline)
  * simhash:    64-bit Charikar simhash, block-permutation buckets, hamming
                verify via built-in ``bit_count(a ^ b)`` — JVM-side
  * ngram:      word-3gram Jaccard verification (used as minhash's verifier,
                exposed standalone too)
  * embedding:  cosine near-dup over unit vectors via hyperplane-LSH buckets

Connected components is iterative small-label propagation in DataFrames —
converges in O(log n) rounds of joins; each round is hash-shuffles only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import (
    make_minhash_bands_udf,
    make_minhash_udf,
    make_simhash_bands_udf,
    simhash_udf,
)
from .search import make_lsh_bucket_udf

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def normalized_text_col(text_col: str = "text"):
    """lower + whitespace-collapse + trim — all built-in, codegen'd."""
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id row per exact (normalized) text. One hash shuffle on
    the 64-bit content hash; map-side partial aggregation for free."""
    h = F.xxhash64(normalized_text_col(text_col)).alias("content_hash")
    keep = df.select(h, F.col(id_col)).groupBy("content_hash").agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(content_hash, n_dups, keeper_id) for groups with >1 member."""
    h = F.xxhash64(normalized_text_col(text_col)).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


def digest_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """Persistable exact-content fingerprint index — the cross-SNAPSHOT
    form of :func:`exact_dedup` (Common-Crawl-style pipelines dedup each
    monthly batch against every prior snapshot by content digest, long
    after the prior text has gone to cold storage).

    One row per historical doc: ``(digest, digest_bucket, id)`` where
    ``digest = xxhash64(normalized text)``. Write bucketed/partitioned by
    ``digest_bucket`` (``pmod(digest, B)``; Iceberg bucket transform on a
    cluster) so matching a new batch is a storage-partitioned join —
    only the new side shuffles. Zero shuffle here; the exchange belongs
    to the sink's clustering."""
    return df.select(
        F.xxhash64(normalized_text_col(text_col)).alias("digest"),
        F.col(id_col).alias("id"),
    ).withColumn(
        "digest_bucket",
        F.pmod(F.col("digest"), F.lit(int(buckets))).cast("int"))


def exact_match_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """Dedup an incoming batch against a historical :func:`digest_index`:
    per new doc, ``first_seen_id`` (the smallest historical id sharing
    its normalized-content digest, NULL if unseen) and ``is_dup``.

    Plan at scale: the new batch hashes in a projection (no Python) and
    joins the index on ``(digest_bucket, digest)`` — with the index
    stored bucketed on ``digest_bucket`` only the new side shuffles; the
    min-id election aggregates the matched rows only (duplicates against
    history are the minority by construction). Historical text is never
    read — the 8-byte digest is the entire state, the same
    keep-the-index-not-the-data contract as ``minhash_match_index``."""
    nb = new_docs.select(
        F.col(id_col).alias("new_id"),
        F.xxhash64(normalized_text_col(text_col)).alias("digest"),
    ).withColumn(
        "digest_bucket",
        F.pmod(F.col("digest"), F.lit(int(buckets))).cast("int"))
    # election keyed on (new_id, digest), not new_id alone (r6 fix,
    # pre-existing r5 defect surfaced at sf0.1): two DIFFERENT new docs
    # can share an id (the caller's id space is not assumed unique —
    # q_exact_incremental's re-presented batch collides with real ids at
    # sf>=0.1), and the id-only group conflated them, stamping both rows
    # with the union of their matches. Keyed by digest too, each row
    # matches only its own content — the oracle's semantics.
    hits = (
        nb.join(index, ["digest_bucket", "digest"])
        .groupBy("new_id", "digest")
        .agg(F.min("id").alias("first_seen_id"))
    )
    return (
        nb.join(hits, ["new_id", "digest"], "left")
        .select(
            F.col("new_id").alias(id_col),
            "digest",
            "first_seen_id",
            F.col("first_seen_id").isNotNull().alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# connected components (small-label propagation)
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20,
) -> DataFrame:
    """(node, component) where component = min node id reachable. Each
    iteration does (1) one hop of min-label propagation across every edge
    (both directions) and (2) POINTER HALVING — each node re-labels to its
    component's component — so even path graphs converge in O(log n)
    iterations, not O(diameter). Every step is a hash join/agg — no driver
    data; lineage is cut per iteration with localCheckpoint.

    Convergence detection is folded INTO the iteration job (VERDICT r1 #8):
    the previous label is threaded through the min-aggregation as ``__old``
    (a tagged union — no extra join), so the checkpointed output carries a
    per-node ``__changed`` flag and the probe is an early-exit scan of
    already-materialized partitions, not a separate join+count job."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: edges usually hang off an expensive UDF/LSH
        # pipeline and are re-scanned every iteration
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    comp_type = labels.schema["component"].dataType
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym["a"] == labels["node"], "inner")
            .select(F.col("b").alias("node"), F.col("component"),
                    F.lit(None).cast(comp_type).alias("__old"))
        )
        hopped = (
            labels.select("node", "component",
                          F.col("component").alias("__old"))
            .union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"),
                 # every node has exactly one labels-sourced row → its
                 # previous label survives the union-aggregate for free
                 F.min("__old").alias("__old"))
        )
        # pointer halving: component ← min(component, component's component)
        parents = hopped.select(
            F.col("node").alias("__cnode"), F.col("component").alias("__ccomp")
        )
        new_labels = (
            hopped.join(parents, hopped["component"] == F.col("__cnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__ccomp"), F.col("component")),
                ).alias("component"),
                F.col("__old"),
            )
            # labels are monotonically non-increasing, so new != old ⟺ changed
            .withColumn("__changed", F.col("component") != F.col("__old"))
            .drop("__old")
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut lineage growth
        # early-exit scan over the partitions the checkpoint just
        # materialized — no join, no second pass over the plan
        if not labels.filter(F.col("__changed")).head(1):
            break
    return labels.drop("__changed")


def _dedup_by_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop every node of a duplicate cluster except its min-id keeper."""
    comp = connected_components(pairs, "id_l", "id_r")
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# MinHash LSH
# ---------------------------------------------------------------------------


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
) -> DataFrame:
    """Candidate pairs (id_l < id_r) sharing ≥1 LSH band bucket. Signature +
    banding are one Arrow UDF pass; bucketing is explode + self-join on the
    band key (shuffle on bucket, never cross join).

    r6: signature+bands run as ONE fused Python pass
    (make_minhash_bandkeys_udf) — the chained sig-UDF → bands-UDF form
    round-tripped every 128-long signature through Arrow twice. The
    first fused attempt was reverted because the optimizer pushed the
    deterministic fused eval below the caller's repartition into the
    (single-split) scan stage, serializing it on one task; the shipped
    fused UDF is marked nondeterministic (guide §4.4), which pins it
    above the exchange. Band keys are bit-identical either way."""
    from ..functions.udfs import make_minhash_bandkeys_udf

    banded = (
        df.select(F.col(id_col).alias("id"),
                  F.posexplode(
                      make_minhash_bandkeys_udf(num_perm, bands)(
                          F.col(text_col))))
        .select("id", F.concat_ws(":", "pos", "col").alias("band_key"))
        # the UDF would otherwise run once per self-join side
        .localCheckpoint(eager=False)
    )
    l = banded.select(F.col("band_key"), F.col("id").alias("id_l"))
    r = banded.select(F.col("band_key"), F.col("id").alias("id_r"))
    return (
        l.join(r, on="band_key")
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-dup removal: MinHash-LSH candidates → exact word-3gram Jaccard
    verification → connected components → keep min id.

    Verification (r6): instead of joining the raw TEXTS onto every
    candidate pair and re-sharding both texts per pair into a per-pair
    Python UDF (each doc's grams were rebuilt once per candidate it
    appears in, and the texts rode two exchanges), the distinct word-3gram
    set is built ONCE per doc with the same JVM HOF kernel the containment
    family uses (``_word_gram_sets`` — gram semantics mirror
    ``textstats.word_ngrams``: <n words → one gram, empty → empty set),
    hashed to 8-byte longs, and attached to the pairs by id; the Jaccard
    is then ``|∩| / (m_l + m_r − |∩|)`` via ``array_intersect`` in
    codegen. Exact same quotient of the same integers as the Python
    ``len(a & b) / len(a | b)`` (empty/empty → 1.0, one-empty → 0.0
    special cases preserved), so the survivor set is unchanged — pinned
    by the oracle and tests/test_dedup.py."""
    cand = minhash_candidates(df, id_col, text_col, num_perm, bands)
    gs = _word_gram_sets(
        df, 3, id_col, text_col, include_empty=True, hash_grams=True
    ).localCheckpoint(eager=False)
    i_sz = F.size(F.array_intersect("__gl", "__gr"))
    jac = (
        F.when((F.col("__ml") == 0) & (F.col("__mr") == 0), F.lit(1.0))
        .when((F.col("__ml") == 0) | (F.col("__mr") == 0), F.lit(0.0))
        .otherwise(i_sz / (F.col("__ml") + F.col("__mr") - i_sz))
    )
    verified = (
        cand.join(gs.select(F.col("id").alias("id_l"),
                            F.col("gs").alias("__gl"),
                            F.col("m").alias("__ml")), "id_l")
        .join(gs.select(F.col("id").alias("id_r"),
                        F.col("gs").alias("__gr"),
                        F.col("m").alias("__mr")), "id_r")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_l", "id_r")
    )
    return _dedup_by_pairs(df, verified, id_col)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within ``max_hamming`` bits: block-permutation buckets (any two
    signatures ≤ bands-1 bits apart share a block) then EXACT hamming verify
    with built-in ``bit_count(l ^ r)`` — the verify is pure JVM."""
    sig = df.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sig"))
    banded = sig.select(
        "id", "sig", F.explode(make_simhash_bands_udf(bands)(F.col("sig"))).alias("block")
    ).localCheckpoint(eager=False)  # one UDF pass, not one per join side
    l = banded.select("block", F.col("id").alias("id_l"), F.col("sig").alias("sig_l"))
    r = banded.select("block", F.col("id").alias("id_r"), F.col("sig").alias("sig_r"))
    return (
        l.join(r, on="block")
        .filter(F.col("id_l") < F.col("id_r"))
        .filter(F.bit_count(F.col("sig_l").bitwiseXOR(F.col("sig_r"))) <= max_hamming)
        .select("id_l", "id_r")
        .distinct()
    )


def simhash_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    pairs = simhash_candidates(df, id_col, text_col, max_hamming=max_hamming)
    return _dedup_by_pairs(df, pairs, id_col)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    cosine_threshold: float = 0.95,
    n_tables: int = 8,
    bits_per_table: int = 10,
) -> DataFrame:
    """Pairs with cosine ≥ threshold: hyperplane-LSH buckets → exact cosine
    verify on collisions only. The verify dot product is built-in
    zip_with/aggregate — JVM-side.

    Plan (r6): with T tables a colliding pair used to ride the bucket
    self-join up to T times at ~1 KB a row (two ``dim``-float payloads)
    and the per-pair cosine was an interpreted HOF fold (no codegen) —
    a multi-GB exchange plus minutes of fold time at the bench scale for
    a surviving set that fits in MBs. Now every vector ships ONCE per
    bucket into an ``applyInPandas`` group and the bucket's pairs verify
    as a numpy block product with the exact op sequence of the old fold
    (float32 products — Spark's Multiply over FloatType — widened
    exactly and accumulated in float64 in ascending dim order; norms are
    the same JVM expression computed once per vector). The cosine and
    the threshold comparison are therefore bit-identical to the old
    plan's, so verifying per bucket and deduplicating (id_l, id_r)
    AFTER the exact filter returns the exact same pair set — and the
    only corpus-scale exchange left is the (bucket, vector) groupBy."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    udf = make_lsh_bucket_udf(dim, n_tables, bits_per_table)
    norm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     norm(F.col(vec_col)).alias("n"))
    banded = vecs.select(
        "id", "v", "n", F.explode(udf(F.col("v"))).alias("bucket"))
    idt = banded.schema["id"].dataType
    out_schema = StructType([
        StructField("id_l", idt), StructField("id_r", idt),
        StructField("cosine", DoubleType()),
    ])
    thr = float(cosine_threshold)

    def bucket_pairs(pdf):
        import pandas as pd

        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema})
        x = np.stack(pdf["v"].to_numpy()).astype(np.float32, copy=False)
        ids = pdf["id"].to_numpy()
        ns = pdf["n"].to_numpy(dtype=np.float64)
        chunks = []
        step = max(1, 4_000_000 // m)
        for s in range(0, m, step):
            e = min(s + step, m)
            acc = np.zeros((e - s, m), dtype=np.float64)
            for j in range(x.shape[1]):
                acc += (x[s:e, j, None] * x[None, :, j]).astype(np.float64)
            cos = acc / (ns[s:e, None] * ns[None, :])
            keep = (ids[s:e, None] < ids[None, :]) & (cos >= thr)
            li, rj = np.nonzero(keep)
            if len(li):
                chunks.append(pd.DataFrame({
                    "id_l": ids[s + li], "id_r": ids[rj],
                    "cosine": cos[li, rj],
                }))
        if not chunks:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema})
        return pd.concat(chunks, ignore_index=True)

    return (
        banded.groupBy("bucket").applyInPandas(bucket_pairs, out_schema)
        .dropDuplicates(["id_l", "id_r"])
    )


def embedding_dedup(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, cosine_threshold: float = 0.95,
) -> DataFrame:
    pairs = embedding_near_dup_pairs(df, id_col, vec_col, dim, cosine_threshold)
    return _dedup_by_pairs(df, pairs.select("id_l", "id_r"), id_col)


# ---------------------------------------------------------------------------
# Repeated n-gram spans (exact-substring duplication, Lee et al. 2022)
# ---------------------------------------------------------------------------


def repeated_ngram_spans(
    df: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Per-document duplicated-span statistics: the fraction of a doc's
    word ``n``-grams that also occur in ANOTHER document (or more than
    once anywhere), i.e. the scalable stand-in for suffix-array
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — their 50-token threshold becomes the
    ``n``-word window here).

    Plan shape: n-gram construction is a pure JVM higher-order expression
    (``transform(sequence(...), i -> array_join(slice(words,i,n)))`` —
    zero Python, zero shuffle); the ONE shuffle is the groupBy on the gram
    key. With ``hash_grams=True`` (default, production path) the key is
    ``xxhash64(gram)`` — 8 bytes on the wire instead of the ~50-byte
    string, which at 100 TB is the difference between a manageable and a
    monstrous exchange. The per-doc output is hash-invariant absent
    64-bit collisions (P ≈ n_grams²/2⁶⁴), so the DuckDB oracle joins on
    the raw gram strings and still hash-matches.

    Returns one row per doc: total n-grams, how many are duplicated
    elsewhere, and the duplicated fraction.
    """
    from context_crawler_spark.operators.ranking import alnum_words

    did = F.col(id_col)
    # Materialize the word array as a COLUMN before the HOF references it:
    # an alias referenced more than once is not inlined by CollapseProject,
    # while the raw alnum_words() expression inside the transform lambda
    # would re-run the regexp+split per GRAM — O(len·n_grams) per row, the
    # same disease the r4 gopher_repetition profile exposed
    # (quality_filter.py:gopher_repetition docstring, rule a).
    ws = F.col("__ws")
    grams_arr = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = (
        df.select(did.alias("id"), alnum_words(text_col).alias("__ws"))
        .select("id", F.explode(grams_arr).alias("gram"))
    )
    if hash_grams:
        grams = grams.select("id", F.xxhash64("gram").alias("gram"))
    # r6: two algebraic cuts. (1) "duplicated" ⟺ ndocs >= 2 OR nocc >= 2
    # ⟺ nocc >= 2 (every doc contributes >= 1 occurrence, so ndocs <=
    # nocc) — the count_distinct leg was provably redundant. (2) the
    # groupBy(gram) + join-back was a self-join of the gram stream with
    # its own aggregate; expressed instead as ONE gram-keyed exchange and
    # an unordered window count over the gram key, every occurrence reads
    # its gram's global multiplicity in place. Plan: 2 exchanges total
    # (gram repartition + per-doc agg), no join — where the join form
    # either re-derived the gram stream twice under a vocabulary-sized
    # broadcast (what AQE's size estimates pick at bench scale) or pays
    # 4 exchanges as a shuffle join at real scale.
    from pyspark.sql import Window

    nocc = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    dup = F.when(nocc >= 2, 1).otherwise(0)
    return (
        grams.repartition("gram")
        .select("id", dup.alias("__dup"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__dup").alias("n_dup_grams"),
        )
        .select(
            F.col("id").alias(id_col), "n_grams", "n_dup_grams",
            F.round(F.col("n_dup_grams") / F.col("n_grams"), 6).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted fingerprint index
# ---------------------------------------------------------------------------


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
) -> DataFrame:
    """Persistable MinHash-LSH fingerprint index of a corpus:
    (id, sig array<long>, band int, band_key long) — one row per (doc,
    band). Write it partitioned/bucketed by ``band_key`` (Iceberg bucket
    transform on a cluster) and each future crawl batch dedups against
    history WITHOUT touching historical text: signatures alone both find
    candidates (band join) and verify them (matching-minima Jaccard
    estimator), so the index is the only state the pipeline keeps.

    One Arrow pass computes signature + band keys; zero shuffle here (the
    exchange belongs to the sink's clustering)."""
    sig = make_minhash_udf(num_perm)(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("id"), sig.alias("sig"))
        .select(
            "id", "sig",
            F.posexplode(make_minhash_bands_udf(bands)(F.col("sig")))
            .alias("band", "band_key"),
        )
    )


def minhash_match_index(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    est_threshold: float = 0.7,
) -> DataFrame:
    """Dedup an incoming crawl batch against a historical corpus's
    ``minhash_index`` (the incremental form of minhash_dedup — what a
    rolling 100 TB pipeline actually runs: CC-style snapshots arrive
    monthly and dedup against ALL prior snapshots, whose raw text is long
    gone to cold storage).

    Per new doc: ``match_id`` (historical doc with the highest estimated
    Jaccard, ties to the smallest id), ``est_jaccard`` (fraction of equal
    signature minima — the standard unbiased MinHash estimator, which is
    how datasketch's MinHashLSH verifies too), ``is_dup`` (estimate ≥
    threshold). New docs with no band collision appear with NULL match.

    Plan at scale: the new batch (≪ history) bands in one Arrow pass and
    joins the index on (band, band_key) — with the index stored bucketed
    on band_key this is a storage-partitioned join that shuffles ONLY the
    new side; candidate (new, old) pairs deduplicate before the estimator
    (a zip_with/aggregate JVM expression over the two sig arrays — no
    Python, no historical text); the best-match window partitions by
    new id (never global)."""
    from pyspark.sql import Window

    new_banded = minhash_index(new_docs, id_col, text_col, num_perm, bands)
    cand = (
        new_banded.select(
            F.col("id").alias("new_id"), F.col("sig").alias("new_sig"),
            "band", "band_key",
        )
        .join(
            index.select(
                F.col("id").alias("old_id"), F.col("sig").alias("old_sig"),
                "band", "band_key",
            ),
            ["band", "band_key"],
        )
        .select("new_id", "new_sig", "old_id", "old_sig")
        .dropDuplicates(["new_id", "old_id"])
    )
    est = (
        F.aggregate(
            F.zip_with(
                "new_sig", "old_sig",
                lambda a, b: (a == b).cast("int"),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(float(num_perm))
    )
    scored = cand.withColumn("est_jaccard", F.round(est, 6))
    w = Window.partitionBy("new_id").orderBy(
        F.desc("est_jaccard"), F.asc("old_id"))
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("new_id", "old_id", "est_jaccard")
    )
    ids = new_docs.select(F.col(id_col).alias("new_id"))
    return ids.join(best, "new_id", "left").select(
        "new_id",
        F.col("old_id").alias("match_id"),
        "est_jaccard",
        F.coalesce(F.col("est_jaccard") >= est_threshold, F.lit(False))
        .alias("is_dup"),
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = None,
    pair_blocks: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication") — embedding-space near-dup
    removal that catches paraphrases MinHash/SimHash token overlap misses.

    The paper's shape, exactly: k-means-cluster the embeddings, compare
    pairs ONLY within a cluster (the step that turns O(N^2) into
    O(sum cluster^2)), and inside every duplicate group (pairwise cosine
    >= tau) KEEP the point with the LOWEST cosine to its cluster centroid
    — Abbas et al. §2.2 found keeping the "outlier" of each group beats
    keeping a random or central member.

    Plan shape: ``centroids`` is the trained centroid matrix
    (operators/search.train_ivf_centroids output, or any k-means). Here it
    is inlined as literal arrays and the argmax fold runs WITHIN-ROW
    (zero-shuffle assignment, whole-stage codegen) — right for k up to a
    few hundred; at the paper's k=50k pass a precomputed ``cluster_col``
    from search.with_ivf_cells (broadcast numpy argmax, still zero
    shuffle) instead. The only shuffles are the cluster-keyed self-join
    and the drop-decision anti-join — both bounded by cluster size, never
    all-pairs.

    ``pair_blocks`` (B>1) is the skew knob for the big-cluster/few-
    cluster regime: a join keyed on cluster id alone caps parallelism at
    n_clusters tasks, and a hot cluster's O(cluster^2) pairs land on ONE
    task. Blocked all-pairs splits them — the right side keys on
    (cluster, hash(id) mod B), the left side replicates over all B block
    values — so each unordered pair still meets exactly once, join keys
    go from n_clusters to n_clusters*B, and a hot cluster's pair work
    spreads over B tasks at the cost of a B-fold (row-count, not
    pair-count) left-side shuffle. B=1 is the paper's plain cluster join
    — right when k is large enough that every cluster is small.

    Cross-engine determinism: cosines round to 6 decimals BEFORE every
    comparison (argmax, tau, keeper rank) — the same contract as
    topk_cosine — and every tie breaks on the lower id/cluster.

    Output: (id_col, cluster, centroid_sim, keep) for every input row.
    """
    # widen BEFORE squaring (r6 fix, pre-existing r5 defect surfaced at
    # sf0.1): the embedding elements are float32 and `x * x` squares in
    # float32, while this operator's oracle casts to DOUBLE[] first —
    # the ~1e-8 norm shift pushed vec 745's centroid_sim across a 6dp
    # rounding boundary. (embedding_near_dup's oracle, by contrast,
    # replays float32 products — its fold stays unwidened on purpose.)
    norm = F.sqrt(F.aggregate(
        F.col("__v"), F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))
    scored = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
        *( [F.col(cluster_col).alias("__cl")] if cluster_col else [] ),
    ).withColumn("__n", norm)

    if cluster_col is None:
        import numpy as np

        def cos_lit(c: list[float]):
            cv = np.asarray(c, dtype=np.float64)
            cn = float(np.linalg.norm(cv)) or 1.0
            dot = F.aggregate(
                F.zip_with(
                    F.col("__v"),
                    F.array(*[F.lit(float(x)) for x in cv]),
                    lambda x, y: x * y),
                F.lit(0.0), lambda a, x: a + x)
            return F.round(dot / (F.col("__n") * F.lit(cn)), 6)

        cands = F.array(*[
            F.struct(F.lit(i).alias("cl"), cos_lit(c).alias("cs"))
            for i, c in enumerate(centroids)
        ])
        # strict > keeps the FIRST (lowest cluster id) on rounded ties
        best = F.aggregate(
            cands, F.struct(F.lit(-1).alias("cl"), F.lit(-2.0).alias("cs")),
            lambda acc, s: F.when(s["cs"] > acc["cs"], s).otherwise(acc))
        scored = scored.withColumn("__b", best).select(
            "__id", "__v", "__n",
            F.col("__b.cl").alias("__cl"), F.col("__b.cs").alias("__csim"))
    else:
        import numpy as np

        cmat = np.asarray(centroids, dtype=np.float64)
        carr = F.array(*[
            F.array(*[F.lit(float(x)) for x in row]) for row in cmat])
        cn = F.element_at(
            F.array(*[F.lit(float(max(np.linalg.norm(r), 1e-300)))
                      for r in cmat]),
            F.col("__cl").cast("int") + 1)
        dot = F.aggregate(
            F.zip_with(F.col("__v"),
                       F.element_at(carr, F.col("__cl").cast("int") + 1),
                       lambda x, y: x * y),
            F.lit(0.0), lambda a, x: a + x)
        scored = scored.withColumn(
            "__csim", F.round(dot / (F.col("__n") * cn), 6))

    # i drops when SOME tau-neighbor j ranks better as the kept outlier:
    # lower centroid_sim, id tie-break (Abbas et al. keep-low-sim rule).
    # The rule is decidable per UNORDERED pair — exactly one member of a
    # tau-pair is the worse one (higher centroid_sim; equal sims break on
    # the higher id) — so pairs form with id_l < id_r and each pair's
    # cosine is evaluated ONCE, not once per direction.
    #
    # r6 pair stage: the cluster self-join + per-pair interpreted HOF dot
    # (O(Σ cluster² ) pairs, each dragging two dim-float payloads through
    # the plan — measured 25M pairs / 13 GB at the bench scale, with the
    # fold itself getting no codegen) is replaced by the paper's own
    # per-cluster matrix form: ONE applyInPandas over (cluster, block)
    # groups, each vector shipped once per group, the pair dots computed
    # as numpy float32-product / float64-ascending-dim accumulation —
    # the exact op sequence of the old JVM fold, so the dot is
    # bit-identical. Python applies only a CONSERVATIVE prefilter
    # (raw cosine >= tau − 2e-6, provably no false negatives for the
    # rounded test); the authoritative round(…, 6) >= tau comparison and
    # the loser election stay in JVM expressions, unchanged. pair_blocks
    # keeps its contract: the right side hashes into B blocks, the left
    # side replicates over all B, so every unordered pair meets exactly
    # once and a hot cluster's pair work spreads over B tasks.
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    B = max(1, int(pair_blocks))
    idt = scored.schema["__id"].dataType
    out_schema = StructType([
        StructField("id_l", idt), StructField("id_r", idt),
        StructField("dot", DoubleType()), StructField("n_l", DoubleType()),
        StructField("n_r", DoubleType()), StructField("cs_l", DoubleType()),
        StructField("cs_r", DoubleType()),
    ])
    lo = float(tau) - 2e-6

    def pair_dots(pdf):
        import pandas as pd

        lm = pdf["__role"].to_numpy() == "l"
        lpdf, rpdf = pdf[lm], pdf[~lm]
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema})
        xl = np.stack(lpdf["__v"].to_numpy()).astype(np.float32, copy=False)
        xr = np.stack(rpdf["__v"].to_numpy()).astype(np.float32, copy=False)
        il = lpdf["__id"].to_numpy()
        ir = rpdf["__id"].to_numpy()
        nl = lpdf["__n"].to_numpy(dtype=np.float64)
        nr = rpdf["__n"].to_numpy(dtype=np.float64)
        csl = lpdf["__csim"].to_numpy(dtype=np.float64)
        csr = rpdf["__csim"].to_numpy(dtype=np.float64)
        chunks = []
        step = max(1, 4_000_000 // max(1, len(rpdf)))
        for s in range(0, len(lpdf), step):
            e = min(s + step, len(lpdf))
            acc = np.zeros((e - s, len(rpdf)), dtype=np.float64)
            for j in range(xl.shape[1]):
                # float32 product (Spark Multiply over FloatType), exact
                # widen, float64 add — per-dim ascending, the fold's order
                acc += (xl[s:e, j, None] * xr[None, :, j]).astype(np.float64)
            cos_raw = acc / (nl[s:e, None] * nr[None, :])
            keep = (il[s:e, None] < ir[None, :]) & (cos_raw >= lo)
            li, rj = np.nonzero(keep)
            if len(li):
                chunks.append(pd.DataFrame({
                    "id_l": il[s + li], "id_r": ir[rj],
                    "dot": acc[li, rj], "n_l": nl[s + li], "n_r": nr[rj],
                    "cs_l": csl[s + li], "cs_r": csr[rj],
                }))
        if not chunks:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema})
        return pd.concat(chunks, ignore_index=True)

    inp = scored.withColumn(
        "__rpb",
        F.pmod(F.xxhash64(F.col("__id").cast("string")), F.lit(B))
        .cast("int") if B > 1 else F.lit(0),
    )
    both = (
        inp.withColumn(
            "__pb", F.explode(F.array(*[F.lit(b) for b in range(B)])))
        .withColumn("__role", F.lit("l"))
        .unionByName(
            inp.withColumn("__pb", F.col("__rpb"))
            .withColumn("__role", F.lit("r")))
        .drop("__rpb")
    )
    cand = both.groupBy("__cl", "__pb").applyInPandas(pair_dots, out_schema)
    dropped = (
        cand.withColumn("__cos", F.round(
            F.col("dot") / (F.col("n_l") * F.col("n_r")), 6))
        .filter(F.col("__cos") >= F.lit(float(tau)))
        .select(
            F.when(
                (F.col("cs_l") > F.col("cs_r"))
                # equal sims: the HIGHER id drops, and id_l < id_r here
                , F.col("id_l"),
            ).otherwise(F.col("id_r")).alias("__id"))
        .distinct()
    )
    return (
        scored.join(dropped.withColumn("__drop", F.lit(True)),
                    "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__cl").alias("cluster"),
            F.col("__csim").alias("centroid_sim"),
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"))
    )


# ---------------------------------------------------------------------------
# Containment (asymmetric) near-dup — quote / subset / truncated-mirror pages
# ---------------------------------------------------------------------------


def _word_gram_sets(
    df: DataFrame, n: int, id_col: str, text_col: str,
    include_empty: bool = False, hash_grams: bool = False,
) -> DataFrame:
    """(id, gs, m): the DISTINCT word-``n``-gram set per doc as an array
    column, built with pure JVM higher-order expressions (zero Python,
    zero shuffle). Mirrors the minhash verifier's gram contract: empty
    text → no row (m=0 filtered; ``include_empty=True`` keeps it as an
    empty array for callers that need the ∅/∅ Jaccard special case),
    fewer than ``n`` words → one gram (the whole word sequence). With
    ``hash_grams=True`` the gram strings are replaced by their xxhash64
    longs (``m`` is counted pre-hash). The word array is let1-bound
    (ranking.let1): inlined, the normalize/split chain would re-run per
    gram window."""
    from context_crawler_spark.operators.ranking import let1

    def grams_of(ws: Column) -> Column:
        return (
            F.when(F.size(ws) == 0, F.array().cast("array<string>"))
            .when(F.size(ws) < n, F.array(F.array_join(ws, " ")))
            .otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                        lambda i: F.array_join(F.slice(ws, i, n), " "),
                    )
                )
            )
        )

    def hashed_grams_of(ws: Column) -> Column:
        # r6: hash the word n-TUPLE directly (xxhash64 chains its column
        # arguments) instead of allocating the "w1 w2 … wn" string per
        # window and hashing that. Words contain no spaces (split on
        # space), so tuple identity ≡ joined-string identity: distinct
        # counts and intersections are unchanged up to the same 64-bit
        # collision caveat the string-hash already carried. HOFs are
        # interpreted (no whole-stage codegen), so dropping the per-gram
        # slice+join string build is a first-order win on the gram pass.
        return (
            F.when(F.size(ws) == 0, F.array().cast("array<bigint>"))
            .when(F.size(ws) < n, F.array(F.xxhash64(F.array_join(ws, " "))))
            .otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                        lambda i: F.xxhash64(
                            *[F.element_at(ws, i + j) for j in range(n)]),
                    )
                )
            )
        )

    # no filter() HOF (r6, the alnum_words rationale): the normalizer
    # collapses whitespace runs and trims, so the split can only produce
    # an empty fragment for fully-empty text (split("") == [""]) —
    # array_remove drops it without an interpreted lambda per word
    words = F.array_remove(F.split(normalized_text_col(text_col), " "), "")
    out = (
        df.select(
            F.col(id_col).alias("id"),
            let1(words,
                 hashed_grams_of if hash_grams else grams_of).alias("gs"),
        )
        .withColumn("m", F.size("gs"))
    )
    if not include_empty:
        out = out.filter(F.col("m") > 0)
    return out


def containment_pairs(
    df: DataFrame,
    theta: float = 0.6,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: every ordered (src, dst)
    with ``C(src, dst) = |grams(src) ∩ grams(dst)| / |grams(src)| >=
    theta`` — src is (near-)contained in dst. Containment (Broder 1997,
    "On the resemblance and containment of documents") is what Jaccard
    misses: a page quoted inside a bigger page, a truncated mirror, a
    boilerplate-wrapped copy all have LOW Jaccard but HIGH containment.

    Plan — SSJoin prefix filtering (Chaudhuri et al., ICDE 2006; Bayardo
    et al., WWW 2007 All-Pairs), never an all-pairs product:

      1. distinct gram set per doc: JVM HOFs, zero shuffle.
      2. global gram document-frequency: ONE shuffle on the gram key.
      3. PREFIX: each doc keeps its ``m - ceil(theta*m) + 1`` rarest
         grams (df asc, gram asc — rarest-first minimizes candidates; the
         bound is order-independent). LOSSLESS by pigeonhole: if the
         prefix of src shares nothing with dst's full set, the remaining
         ``ceil(theta*m) - 1`` grams cannot reach the ``ceil(theta*m)``
         overlap the threshold requires.
      4. candidates = prefix(src) ⋈ full(dst) on gram — the join keys are
         each doc's RAREST grams, so posting lists stay short; the SSJoin
         length filter prunes pairs where ``m_dst < ceil(theta*m_src)``
         (|∩| ≤ m_dst, so such pairs can never reach the threshold —
         another lossless cut); distinct (src, dst).
      5. exact verify on candidates only: ``array_intersect`` over the
         two gram arrays (JVM), emit pairs with containment >= theta.

    The DuckDB oracle replays steps 1+5 as an all-pairs check — equal
    output because the filter is lossless. Reference parity: the
    reference dedups URLs only (crawlee RequestQueue uniqueKey,
    src/core.ts:341); containment is part of the content-dedup extension.
    """
    sets = _word_gram_sets(df, n, id_col, text_col, hash_grams=hash_grams)
    return _containment_pairs_from_sets(sets, theta).select(
        "src_id",
        "dst_id",
        F.round(F.col("__c"), 6).alias("containment"),
    )


def _containment_pairs_from_sets(sets: DataFrame, theta: float) -> DataFrame:
    """SSJoin prefix-filter + verify over a prebuilt ``_word_gram_sets``
    table. Returns (src_id, dst_id, __c, __ma, __mb) — the raw
    containment plus BOTH gram-set sizes, so :func:`containment_dedup`
    can apply its keeper rule without rebuilding the gram sets (r6: the
    sizes used to be re-derived by a second full gram build plus two
    extra id-keyed joins)."""
    from pyspark.sql import Window

    sets = sets.localCheckpoint(eager=False)
    exploded = sets.select("id", "m", F.explode("gs").alias("gram"))
    gfreq = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    # every gram ranked within its doc by the GLOBAL (gdf asc, gram asc)
    # total order — the prefix comes from rank <= m - ceil(theta·m) + 1,
    # and keeping the rank on BOTH join sides enables the positional
    # filter below; materialized once, read by both sides (r6)
    w = Window.partitionBy("id").orderBy(F.col("gdf").asc(), F.col("gram").asc())
    ranked = (
        exploded.join(gfreq, "gram")
        .withColumn("__r", F.row_number().over(w))
        .localCheckpoint(eager=False)
    )
    # r6 SECOND pass (profiled at the driver's sf1.0 scale): the verify
    # was 16 of the query's ~20 s — 66M candidate pairs, nearly all of
    # which share exactly ONE prefix gram, each paying a per-pair
    # array_intersect. The fix is the All-Pairs/PPJoin prefix EXTENSION
    # (Bayardo et al., WWW 2007 §3.2): index k = min(2, t) extra prefix
    # grams and require >= k shared prefix grams per pair. Pigeonhole
    # proof for the count cut: with prefix length m - t + k, if fewer
    # than k prefix grams are shared, overlap <= (k-1) + (t - k) = t - 1
    # < t. The shared-gram count is a groupBy over the match stream —
    # small fixed-width rows, ~6.5 s at sf1.0 — and cuts the candidates
    # that reach the array-carrying verify 66M -> 3.1M (measured), where
    # the earlier per-match positional filter barely cut at all (its
    # suffix bound is weak for mid-document prefix grams).
    t_src = F.ceil(F.lit(theta) * F.col("m"))
    prefix = (
        ranked
        .filter(F.col("__r") <= F.col("m") - t_src + F.least(F.lit(2), t_src))
        .select(F.col("gram"), F.col("id").alias("src_id"),
                F.col("m").alias("__msrc"), F.col("__r").alias("__ps"))
    )
    t_req = F.ceil(F.lit(theta) * F.col("__msrc"))
    k_req = F.least(F.lit(2), t_req)
    # r6 third pass: dst-side positional cut BEFORE the pair-count
    # aggregation — keep only matches whose dst rank lies in dst's first
    # m_dst - t + k positions. Lossless w.r.t. everything downstream:
    # a qualifying pair (overlap >= t) has at most t - k shared grams
    # beyond that bound (only t - k dst grams exist there), so >= k of
    # its matches survive the cut (the csh >= k test is intact), and the
    # globally-first shared gram — whose ranks are <= m - t + 1 on BOTH
    # sides by pigeonhole — always survives, so min(__ps)/min(__pd)
    # still witness the PPJoin positional bound. The src-side analogue is
    # vacuous (prefix ranks are already <= m_src - t + k); the dst side
    # is uniform over m_dst, so this halves the match stream feeding the
    # aggregation exchange (guide §2.3).
    matches = (
        prefix.join(
            ranked.select(F.col("gram"), F.col("id").alias("dst_id"),
                          F.col("m").alias("__mdst"),
                          F.col("__r").alias("__pd")),
            "gram",
        )
        .filter((F.col("src_id") != F.col("dst_id"))
                & (F.col("__mdst") >= t_req)
                & (F.col("__pd") <= F.col("__mdst") - t_req + k_req))
    )
    # one pair-keyed aggregation replaces the per-match positional filter:
    # count of shared prefix grams plus min ranks. Both docs rank their
    # grams by the same global (gdf, gram) order, so the globally-smallest
    # shared gram minimizes BOTH matched ranks — min(__ps)/min(__pd) are
    # that gram's positions, and the PPJoin positional bound (Xiao et
    # al., WWW 2008) overlap <= min(m_src - ps1, m_dst - pd1) + 1 applies
    # per PAIR, lossless. r6 second pass: the match stream carries only
    # (ids, int32 ranks) through the agg exchange — the two gram-set
    # sizes rejoin AFTER the aggregation from the 50k-row sets table
    # (broadcast-sized) instead of riding all ~66M match rows (guide
    # §2.3, shuffle fewer bytes).
    agg = (
        matches.select(
            "src_id", "dst_id",
            F.col("__ps").cast("int").alias("__ps"),
            F.col("__pd").cast("int").alias("__pd"))
        .groupBy("src_id", "dst_id")
        .agg(F.count(F.lit(1)).alias("__csh"),
             F.min("__ps").alias("__ps1"),
             F.min("__pd").alias("__pd1"))
        # no broadcast hint: (id, m) is doc-count-sized — AQE broadcasts
        # it at bench scale and keys a shuffle join at corpus scale
        .join(sets.select(F.col("id").alias("src_id"),
                          F.col("m").alias("__msrc")), "src_id")
        .join(sets.select(F.col("id").alias("dst_id"),
                          F.col("m").alias("__mdst")), "dst_id")
    )
    t_agg = F.ceil(F.lit(theta) * F.col("__msrc"))
    cand = agg.filter(
        (F.col("__csh") >= F.least(F.lit(2), t_agg))
        & (F.least(F.col("__msrc") - F.col("__ps1"),
                   F.col("__mdst") - F.col("__pd1")) + 1 >= t_agg)
    ).select("src_id", "dst_id")
    a = sets.select(
        F.col("id").alias("src_id"), F.col("gs").alias("__ga"), F.col("m").alias("__ma")
    )
    b = sets.select(F.col("id").alias("dst_id"), F.col("gs").alias("__gb"),
                    F.col("m").alias("__mb"))
    cont = F.size(F.array_intersect("__ga", "__gb")) / F.col("__ma")
    # candidates are unique pairs by construction (groupBy output), and
    # the verify joins are 1:1 on id, so no post-verify distinct is
    # needed — the r5 pre-verify DISTINCT (corpus-scale, 2 × 5.5 GiB
    # spill) stays gone.
    return (
        cand.join(a, "src_id")
        .join(b, "dst_id")
        .withColumn("__c", cont)
        .filter(F.col("__c") >= theta)
        .select("src_id", "dst_id", "__c", "__ma", "__mb")
    )


def containment_dedup(
    df: DataFrame,
    theta: float = 0.6,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Drop every doc that is theta-contained in a STRICTLY LARGER doc
    (more distinct grams), or in an equal-sized doc with a smaller id —
    i.e. keep the superset/canonical page, drop the quote/truncation.
    The (size, id) keeper rule is a total order, so mutual containment
    (exact duplicates) keeps exactly one representative and the result
    is deterministic for any partitioning.

    r6: the keeper rule reads the gram-set sizes straight off the
    verified pairs (``_containment_pairs_from_sets`` carries both sides'
    ``m``), where it used to rebuild the whole gram table a second time
    and join it back on twice — one full tokenize+gram pass and two
    id-keyed shuffles gone, byte-identical survivor set. Sizes are
    pre-hash counts either way, so ``hash_grams`` does not affect them."""
    sets = _word_gram_sets(df, n, id_col, text_col, hash_grams=hash_grams)
    sized = _containment_pairs_from_sets(sets, theta)
    losers = sized.filter(
        (F.col("__mb") > F.col("__ma"))
        | ((F.col("__mb") == F.col("__ma"))
           & (F.col("dst_id") < F.col("src_id")))
    ).select(F.col("src_id").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# Winnowing fingerprints — the MOSS local fingerprinting algorithm
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram of
    the normalized text (lowercased, non-alphanumerics stripped — the
    paper's whitespace/punctuation insensitivity), slide a window of
    ``w`` consecutive gram hashes, and select each window's MINIMUM.
    Guarantee: any substring match of length >= w + k - 1 between two
    documents yields at least one shared fingerprint, while only ~2/(w+1)
    of all gram hashes are retained.

    Differs from ``rolling_fingerprint`` (functions/tokens.py — ONE
    Karp-Rabin min per doc, an identity key): this emits a fingerprint
    SET sized to the document, the unit MOSS-style overlap detection and
    plagiarism/mirror search joins on.

    Engine-native and oracle-shared hashing: the gram hash is the first
    13 hex chars of md5 — fixed-width lowercase hex orders exactly as its
    numeric value, so window-min over the STRING equals window-min over
    the 52-bit number and DuckDB replays it bit-identically. The whole
    selection is JVM higher-order expressions (zero Python, zero shuffle);
    the only exchange is the final per-doc DISTINCT. Docs with fewer than
    ``w`` grams winnow to the single global min (the paper's short-input
    convention); docs shorter than ``k`` chars emit nothing.

    Returns (id_col, *keep_cols, fp) — one row per distinct selected
    fingerprint (``keep_cols`` are carried through unchanged, e.g. the
    host for ``mirror_hosts``).
    """
    extra = list(keep_cols or [])
    t_norm = F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                              "[^a-z0-9]", "")
    empty = F.array().cast("array<string>")

    # normalization and the gram-hash array are materialized as COLUMNS
    # (CollapseProject keeps multiply-referenced aliases): inlined, the
    # regex would re-run per gram and the md5 array per window read
    out = df.withColumn("__t", t_norm)
    m = F.length(F.col("__t")) - (k - 1)  # number of k-grams
    hashes = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.substring(F.md5(F.substring(F.col("__t"), i, k)), 1, 13),
    )
    out = out.withColumn("__h", F.when(m >= 1, hashes).otherwise(empty))

    # sliding-window minimum via the doubling/sparse-table scheme (r6):
    # m_{2d}[i] = min(m_d[i], m_d[i+d]) — one least() zip_with pass per
    # power of two, O(n·log w) total, where the per-window
    # array_min(slice(h, j, w)) form allocated a w-element array per
    # window (O(n·w); profiled 1.9 s -> ~0 at sf1.0 for w=16). Any
    # window of length w is the min of two (possibly overlapping)
    # power-of-two windows: p = 2^floor(log2 w), min = least(m_p[j],
    # m_p[j + w - p]).
    p = 1
    while p * 2 <= w:
        p *= 2
    cur = "__h"
    d = 1
    while d < p:
        nxt = f"__m{2 * d}"
        c = F.col(cur)
        ln = F.size(c) - d
        out = out.withColumn(nxt, F.when(ln >= 1, F.zip_with(
            F.slice(c, 1, ln), F.slice(c, d + 1, ln),
            lambda a, b: F.least(a, b))).otherwise(empty))
        cur = nxt
        d *= 2
    h = F.col("__h")
    mp = F.col(cur)
    if p == w:
        full = F.array_distinct(mp)
    else:
        full = F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.size(h) - (w - 1)),
            lambda j: F.least(F.element_at(mp, j),
                              F.element_at(mp, j + (w - p))),
        ))
    # short-input convention: fewer than w grams -> the single global min
    selected = (
        F.when(F.size(h) >= w, full)
        .when(F.size(h) >= 1, F.array(F.array_min(h)))
        .otherwise(empty)
    )
    return (
        out.select(F.col(id_col), *extra, F.explode(selected).alias("fp"))
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 16,
    min_shared: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate overlap pairs by shared winnowing fingerprints: docs
    sharing >= ``min_shared`` selected fingerprints, with the shared
    count as evidence weight. ``max_df`` drops fingerprints occurring in
    more than that many docs before pairing (the standard stop-gram cut:
    a fingerprint half the web shares carries no signal and would
    quadratically blow up the self-join — same role as the band-bucket
    cap in minhash LSH).

    Plan: ONE shuffle on fp groups postings; pairs form inside each
    fingerprint's posting list only (never all-pairs); one (a, b) shuffle
    counts shared fps. Emits a < b once per pair.
    """
    # materialize once (r6): the winnowing selection (an md5 per char
    # k-gram) is the expensive half, and it feeds the df-cut AND both
    # sides of the posting self-join — un-checkpointed, each reference
    # re-ran the whole selection
    fps = winnow_fingerprints(df, k=k, w=w, id_col=id_col, text_col=text_col) \
        .localCheckpoint(eager=False)
    if max_df is not None:
        rare = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("fp")
        )
        fps = fps.join(rare, "fp")
    a = fps.select(F.col(id_col).alias("a"), "fp")
    b = fps.select(F.col(id_col).alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def mirror_hosts(
    df: DataFrame,
    theta: float = 0.5,
    k: int = 5,
    w: int = 16,
    max_df: int = 10,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mirror-host detection (Bharat & Broder, WWW8 1999, "A comparison
    of techniques to find mirrored hosts on the WWW"; Cho, Shivakumar &
    Garcia-Molina, SIGMOD 2000, "Finding replicated web collections"):
    two hosts serving largely the same content should be crawled ONCE —
    the single biggest crawl-budget saver on the mirrored web (kernel
    archives, package CDNs, doc mirrors).

    Host similarity is containment over each host's winnowing-fingerprint
    SET: shared / min(|A|, |B|) >= ``theta`` — min-normalized so a small
    full mirror inside a big portal still fires (the Bharat-Broder
    host-resemblance with MOSS fingerprints as the shingle sample).
    ``max_df`` cuts fingerprints present on more than that many hosts
    first (boilerplate the whole web shares is not mirror evidence, and
    the cut bounds the posting-list self-join exactly like winnow_pairs).

    Plan: winnowing selection is zero-shuffle HOFs; ONE fp shuffle makes
    the distinct (host, fp) set + the df cut; pairs form inside each
    fingerprint's host list only; one (a, b) shuffle counts; per-host
    totals join in (AQE broadcasts — it is #hosts rows). Never all-pairs
    over hosts, never O(corpus) on the driver.

    Returns (host_a, host_b, shared_fps, nf_a, nf_b, containment),
    host_a < host_b, one row per candidate mirror pair.
    """
    hf = (
        winnow_fingerprints(
            df, k=k, w=w, id_col=id_col, text_col=text_col,
            keep_cols=[host_col])
        .select(F.col(host_col).alias("host"), "fp")
        .distinct()
        # materialized once — feeds the df-cut, totals and both join
        # sides (the winnow_pairs r6 note)
        .localCheckpoint(eager=False)
    )
    rare = (
        hf.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("fp")
    )
    ff = hf.join(rare, "fp")
    tot = ff.groupBy("host").agg(F.count(F.lit(1)).alias("nf"))
    a = ff.select(F.col("host").alias("host_a"), "fp")
    b = ff.select(F.col("host").alias("host_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
    return (
        pairs.join(tot.select(F.col("host").alias("host_a"),
                              F.col("nf").alias("nf_a")), "host_a")
        .join(tot.select(F.col("host").alias("host_b"),
                         F.col("nf").alias("nf_b")), "host_b")
        .withColumn(
            "containment",
            F.col("shared_fps").cast("double")
            / F.least("nf_a", "nf_b"))
        .filter(F.col("containment") >= F.lit(float(theta)))
        .select("host_a", "host_b", "shared_fps", "nf_a", "nf_b",
                "containment")
    )


def exact_substring_dedup(
    df: DataFrame, n: int = 8, id_col: str = "doc_id", text_col: str = "text",
    hash_grams: bool = True,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the ExactSubstr operator
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", §3.1), word-window form: any word position covered by
    an ``n``-gram that occurs more than once in the corpus (in another
    document, or twice anywhere) is excised from the normalized token
    stream. ALL copies are removed, the paper's published semantics
    (their suffix-array tool cuts every occurrence of a ≥50-token
    duplicated span, which can leave documents with holes); documents
    arrive back reconstructed with the surviving words joined by single
    spaces. :func:`repeated_ngram_spans` is the measurement half of this
    pair — this is the surgery.

    Where the paper builds one giant suffix array (quadratic-ish memory
    discipline, single machine), the distributed form needs only the
    n-gram multiplicity join: a span of ≥ n duplicated words is covered
    by its duplicated n-gram windows, so excising every position under a
    duplicated window removes exactly the words inside maximal duplicated
    runs (with the standard windowing caveat that the first/last n-1
    words bordering a duplicated run are kept only if no window covering
    them is duplicated).

    Plan shape: gram construction + positional indexing are pure JVM
    higher-order expressions (zero Python); shuffle #1 is the gram-key
    groupBy for multiplicities (8-byte ``xxhash64`` keys on the wire with
    ``hash_grams=True``, the 100 TB posture shared with
    :func:`repeated_ngram_spans`); the gram→stats join reuses that key;
    shuffle #2 collects each doc's duplicated window starts (positions
    only — ints, never text); shuffle #3 joins the start-lists back onto
    the docs by id. Coverage testing is a per-row ``exists`` fold over
    the sorted start list inside codegen — O(words × starts) per doc
    worst case, which is the right trade until a doc is pathologically
    self-repetitive (Gopher's repetition gate runs FIRST in the
    :func:`pipeline <context_crawler_spark.operators.curation>` exactly
    to shed those).

    Returns (id, n_words, n_removed, clean_text).
    """
    from context_crawler_spark.operators.ranking import alnum_words

    ws = F.col("__ws")
    docs = df.select(
        F.col(id_col).alias("id"), alnum_words(text_col).alias("__ws")
    )
    if hash_grams:
        # r6: hash the word n-TUPLE directly (xxhash64 chains its column
        # arguments) instead of allocating the "w1 … wn" join string per
        # window and hashing that — words carry no spaces, so tuple
        # identity ≡ joined-string identity up to the same 64-bit
        # collision caveat (the _word_gram_sets hashed-gram rationale)
        grams_arr = F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(
                        *[F.element_at(ws, i + j) for j in range(n)]
                    ).alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gram:bigint>>"))
    else:
        grams_arr = F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - (n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(F.slice(ws, i, n), " ").alias("gram"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
    grams = (
        docs.select("id", F.explode(grams_arr).alias("g"))
        .select("id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )
    # r6: duplicated ⟺ ndocs >= 2 OR nocc >= 2 ⟺ nocc >= 2 (ndocs <=
    # nocc), and the multiplicity join collapses to an unordered window
    # count over the gram key — 2 exchanges, no join, no
    # vocabulary-sized broadcast (same rewrite as repeated_ngram_spans)
    from pyspark.sql import Window

    nocc = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    starts = (
        grams.repartition("gram")
        .select("id", "pos", nocc.alias("__nocc"))
        .filter(F.col("__nocc") >= 2)
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__starts"))
    )
    st = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    indexed = F.transform(
        ws, lambda w, i: F.struct((i + 1).alias("i"), w.alias("w"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            st, lambda p: (p <= s["i"]) & (s["i"] <= p + (n - 1))
        ),
    )
    return (
        docs.join(starts, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.size(ws).alias("n_words"),
            (F.size(ws) - F.size(kept)).alias("n_removed"),
            F.array_join(F.transform(kept, lambda s: s["w"]), " ")
            .alias("clean_text"),
        )
    )


def elect_representatives(
    members: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-keyed representative election inside duplicate clusters —
    the "which copy do we keep" policy stage downstream of any grouping
    producer (:func:`exact_dup_groups`, :func:`connected_components`
    over MinHash/SimHash pairs, SemDeDup clusters). First-seen-wins
    (exact_dedup) is the right default for byte-identical copies;
    near-dup clusters differ in quality, and the published pipelines
    keep the BEST member, not the first (RefinedWeb keeps by heuristic
    quality; FineWeb keeps the longest; SemDeDup keeps the
    lowest-centroid-similarity outlier). This operator is that policy
    with the key pluggable: argmax(score), ties to the smallest id — a
    total order, so the election is deterministic across partitionings
    and retries.

    Plan shape: one id-keyed join attaching scores, one group-keyed
    groupBy folding ``max(struct(score, -id))`` — the exchange carries
    one row per member, the agg one row per group; no window over the
    corpus, no rank. The winners table re-joins members on the group
    key (AQE broadcasts it when groups fit). At 100 TB both exchanges
    are the same keys the grouping producer already shuffled on, so AQE
    reuses the partitioning when the stages line up.

    Returns (id, group, rep_id, is_rep); filter ``is_rep`` to get the
    survivor set, ``NOT is_rep`` for the deletion list.
    """
    mid, grp, sc = F.col(id_col), F.col(group_col), F.col(score_col)
    m = members.select(mid.alias("__id"), grp.alias("__g"))
    s = scores.select(mid.alias("__id"), sc.alias("__s"))
    # argmax(score), ties to the SMALLEST id, as min(struct(-score, id)):
    # negating the (numeric by contract) SCORE instead of the id keeps the
    # single-aggregation shape while making the election generic over any
    # orderable id type — the old max(struct(score, -id)) negated the id
    # and threw CAST_INVALID_INPUT on string ids under ANSI Spark
    # (ADVICE r5 #1; fixed r6, numeric-id results unchanged)
    winners = (
        m.join(s, "__id")
        .groupBy("__g")
        .agg(
            F.min(
                F.struct((-F.col("__s")).alias("ns"), F.col("__id").alias("i"))
            ).alias("__m")
        )
        .select("__g", F.col("__m.i").alias("__rep"))
    )
    return m.join(winners, "__g").select(
        F.col("__id").alias(id_col),
        F.col("__g").alias(group_col),
        F.col("__rep").alias("rep_id"),
        (F.col("__id") == F.col("__rep")).alias("is_rep"),
    )
