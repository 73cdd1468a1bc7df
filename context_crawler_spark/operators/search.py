"""Vector similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Capability parity with the reference's semantic search (HNSW top-k,
reference src/llm-service.ts:216-259) plus the scale path a 100 TB corpus
needs. Design:

  * single-query top-k: the dot product runs JVM-side via
    ``aggregate(zip_with(...))`` — no Python at all — and
    ``orderBy(desc).limit(k)`` compiles to TakeOrderedAndProject (per-
    partition heaps + driver merge of k rows, never a global sort)
  * many-queries kNN join: the query matrix broadcasts to every task; a
    ``mapInPandas`` computes a numpy GEMM per Arrow batch and emits only the
    per-batch top-k per query (k·n_queries rows per batch, not
    batch×n_queries), then one window prunes to the global top-k
  * LSH ANN: random-hyperplane sign buckets (fixed seed) over multiple
    tables; probing joins on bucket keys so only colliding candidates get
    exact scoring — sublinear candidate sets at 10^9+ vectors
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LSH_SEED = 7919


def _vec_lit(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_score_col(vec_col: str, query: list[float]):
    """Cosine(vec, query) as pure built-in expressions (zip_with dot product
    + norms). Whole-stage-codegen'd; zero Python."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), _vec_lit(list(map(float, q))), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm * F.lit(qn))


def topk_cosine(
    df: DataFrame, query: list[float], k: int = 5,
    vec_col: str = "embedding", clamp: tuple[int, int] = (1, 20),
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query`` (k clamped 1..20 like
    the reference API, src/server.ts:416-423)."""
    k = max(clamp[0], min(clamp[1], k))
    return (
        df.withColumn("score", cosine_score_col(vec_col, query))
        .orderBy(F.desc("score"))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact kNN of every query against the corpus → (query_id, vec_id,
    score), k rows per query. Queries broadcast; corpus streamed once."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_, mat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            scores = c @ mat.T  # (batch, nq)
            kk = min(k, scores.shape[0])
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (k, nq)
            rows = {
                "query_id": np.repeat(ids_, kk),
                id_col: pdf[id_col].to_numpy()[top.T.ravel()],
                "score": np.take_along_axis(scores, top, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        score, f"query_id long, {id_col} long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def make_lsh_bucket_udf(dim: int, n_tables: int = 8, bits_per_table: int = 12,
                        seed: int = LSH_SEED):
    """Random-hyperplane LSH bucket keys: ``n_tables`` int64 keys per vector
    (table index folded into the key). Fixed-seed planes → reproducible
    bucketing across runs/executors."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables * bits_per_table, dim))

    @F.pandas_udf("array<long>")
    def lsh_buckets(vec: pd.Series) -> pd.Series:
        out = []
        mat = np.stack(vec.to_numpy()).astype(np.float64)
        signs = (mat @ planes.T) > 0  # (n, T*B)
        weights = (1 << np.arange(bits_per_table, dtype=np.int64))
        for row in signs:
            keys = []
            for t in range(n_tables):
                bits = row[t * bits_per_table : (t + 1) * bits_per_table]
                keys.append(int(bits @ weights) | (t << 56))
            out.append(keys)
        return pd.Series(out)

    return lsh_buckets


def lsh_topk(
    corpus_with_buckets: DataFrame,
    query: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "lsh_buckets",
    dim: int | None = None,
    n_tables: int = 8,
    bits_per_table: int = 12,
) -> DataFrame:
    """ANN top-k: score only rows sharing ≥1 LSH bucket with the query.
    ``corpus_with_buckets`` is the corpus with a precomputed (stored)
    ``lsh_buckets`` column — the index lives WITH the table, rebuildable,
    partition-prunable."""
    dim = dim or len(query)
    udf = make_lsh_bucket_udf(dim, n_tables, bits_per_table)
    spark = corpus_with_buckets.sparkSession
    qdf = spark.createDataFrame([(list(map(float, query)),)], f"q array<float>")
    qbuckets = [
        r["b"] for r in
        qdf.select(F.explode(udf(F.col("q"))).alias("b")).collect()
    ]
    candidates = corpus_with_buckets.filter(
        F.arrays_overlap(F.col(bucket_col), F.array(*[F.lit(b) for b in qbuckets]))
    )
    return topk_cosine(candidates.drop(bucket_col), query, k,
                       vec_col=vec_col)
