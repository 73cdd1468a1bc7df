"""LLM-artifact stage: llms.txt → chunks → embeddings → top-k search.

DataFrame reimplementation of the reference's per-job artifact generation
(reference src/llm-service.ts:101-161) and semantic search
(src/llm-service.ts:216-259):

  * llms.txt: ``---\\nTitle:…\\nURL:…\\n---\\n{text}`` blocks in visit order,
    blank-line joined (src/llm-service.ts:114-123) — pure built-ins
  * chunks: RecursiveCharacterTextSplitter parity (size 10000/overlap 100,
    separators ``\\n---\\n, \\n\\n, \\n, ␣``; src/llm-service.ts:15-17,129-145)
    via one Arrow UDF + posexplode
  * embeddings: 384-d unit vectors (deterministic stand-in for
    MiniLM-L6-v2; swap the UDF body for a real model on a cluster —
    src/xenova-embeddings.ts:36-91); batch size = Arrow batch size
  * search: brute-force cosine top-k (JVM dot product) — the HNSW index is
    replaced by the LSH-bucketed ANN in operators/search.py at scale
  * staleness: artifacts regenerate iff the source snapshot or chunking
    params drifted (src/llm-service.ts:163-205), tracked as snapshot-store
    metadata instead of file mtimes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.chunker import DEFAULT_CHUNK_OVERLAP, DEFAULT_CHUNK_SIZE
from ..functions.udfs import embed_udf, make_chunk_text_udf
from ..operators.output import llms_txt
from ..operators.search import topk_cosine
from ..state import SnapshotStore

ARTIFACT_VERSION = 1


def build_chunks(
    pages_out: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """pages → (job, url, seq, chunk_ix, chunk) with the reference's
    ``Title: {t}\\nURL: {u}\\n\\n{text}`` framing (src/llm-service.ts:135-144).
    """
    udf = make_chunk_text_udf(chunk_size, chunk_overlap)
    return (
        pages_out.select(
            "job", "url", "seq", "round", "fetch_order",
            F.posexplode(
                udf(F.col("title"), F.col("url"), F.col("text"))
            ).alias("chunk_ix", "chunk"),
        )
    )


def build_embeddings(chunks: DataFrame) -> DataFrame:
    return chunks.withColumn("embedding", embed_udf(F.col("chunk")))


class ArtifactService:
    """Per-job artifact generation + search over a snapshot store
    (reference LLMService, src/llm-service.ts:69-259)."""

    def __init__(self, spark: SparkSession, store: SnapshotStore,
                 chunk_size: int = DEFAULT_CHUNK_SIZE,
                 chunk_overlap: int = DEFAULT_CHUNK_OVERLAP):
        self.spark = spark
        self.store = store
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap

    def _params(self) -> dict:
        return {
            "version": ARTIFACT_VERSION,
            "chunk_size": self.chunk_size,
            "chunk_overlap": self.chunk_overlap,
        }

    def is_stale(self, source_snapshot_id: int) -> bool:
        """Regenerate iff artifacts missing, params drifted, or the source
        snapshot moved (src/llm-service.ts:163-205, mtimes → snapshot ids).
        """
        snap = self.store.snapshot()
        if snap is None or "chunks" not in snap.tables:
            return True
        meta = snap.metadata.get("artifacts") or {}
        return (
            meta.get("params") != self._params()
            or meta.get("source_snapshot_id") != source_snapshot_id
        )

    def generate(self, pages_out: DataFrame, source_snapshot_id: int,
                 force: bool = False) -> bool:
        """Build llms_txt/chunks/embeddings tables; returns True if work was
        done (False = fresh, skipped — the staleness fast path)."""
        if not force and not self.is_stale(source_snapshot_id):
            return False
        chunks = build_chunks(pages_out, self.chunk_size, self.chunk_overlap)
        embeddings = build_embeddings(chunks)
        # carry the crawl metadata (round/next_seq/finished/bloom/...)
        # forward: this commit becomes HEAD, and a later resume reads its
        # metadata — replacing instead of extending would strand the store
        # (run_round KeyError on 'round')
        prior = self.store.snapshot()
        base = dict(prior.metadata) if prior is not None else {}
        self.store.commit(
            {
                "llms_txt": llms_txt(pages_out),
                "chunks": chunks,
                "embeddings": embeddings,
            },
            metadata={
                **base,
                "artifacts": {
                    "params": self._params(),
                    "source_snapshot_id": source_snapshot_id,
                }
            },
            tag="artifacts",
        )
        return True

    def search(self, job: str, subject: str, k: int = 5) -> list[dict]:
        """Top-k chunks for a query string (reference similaritySearch +
        result framing, src/llm-service.ts:216-259; k clamped 1..20 like
        src/server.ts:416-423)."""
        emb = self.store.read(self.spark, "embeddings")
        if emb is None:
            raise ValueError("artifacts not generated")
        qdf = self.spark.createDataFrame([(subject,)], "q string")
        qvec = list(qdf.select(embed_udf("q").alias("v")).head()["v"])
        hits = topk_cosine(
            emb.filter(F.col("job") == job), qvec, k, vec_col="embedding"
        ).select("url", "chunk_ix", "chunk", "score").collect()
        return [r.asDict() for r in hits]

    def format_results(self, hits: list[dict]) -> str:
        """``--- Result i ---`` blocks (src/llm-service.ts:243-258)."""
        blocks = [
            f"--- Result {i + 1} ---\n{h['chunk']}" for i, h in enumerate(hits)
        ]
        return "\n\n".join(blocks)

    def llms_txt_for(self, job: str) -> str | None:
        df = self.store.read(self.spark, "llms_txt")
        if df is None:
            return None
        row = df.filter(F.col("job") == job).head()
        return row["llms_txt"] if row else None
