"""Streaming pipelines: incremental page ingest, watermarked host stats,
stateful sessionization.

Design rules carried over from the batch engine: extraction stays in ONE
fused Arrow UDF; aggregations are event-time windows with explicit
watermarks (bounded state); custom state uses ``applyInPandasWithState``
with GroupStateTimeout so idle keys expire. Checkpointing is Spark's
streaming checkpoint (exactly-once file sink), the streaming sibling of the
batch engine's snapshot commits.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.udfs import make_extract_page_udf
from ..sources.synthetic_web import PAGES_SCHEMA


def stream_extract_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    selector: str = "article",
):
    """Incremental fetch-stage: stream new page files in, extract
    title/text/links/tokens, append parquet. ``Trigger.AvailableNow``
    drains everything currently available then stops — the streaming
    equivalent of one BSP round, resumable from the checkpoint."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    )
    page_udf = make_extract_page_udf(selector)
    extracted = pages.withColumn("__page", page_udf("html", "url")).select(
        "url", "warc_ts", "lang",
        F.col("__page.title").alias("title"),
        F.col("__page.text").alias("text"),
        F.size("__page.links").alias("n_links"),
        F.col("__page.n_tokens").alias("n_tokens"),
    )
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_host_stats(
    pages_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-host fetch counts — the streaming
    form of the engine's host_state table. Late rows beyond the watermark
    are dropped deterministically instead of growing state forever."""
    from ..functions.udfs import registered_domain_udf

    return (
        pages_stream.withColumn("host", registered_domain_udf("url"))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(F.count("*").alias("fetched"))
        .select(
            F.col("win.start").alias("window_start"),
            "host",
            "fetched",
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
SESSION_STATE_SCHEMA = "start long, last long, n int"

SESSION_GAP_S = 1800


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: emit a session row whenever a user's event
    gap exceeds SESSION_GAP_S; keep the open session in GroupState and
    close it on processing-time timeout. (The batch engine's analog is the
    lag/running-sum sessionize query — this is the live variant.)"""
    (user_id,) = key
    ts: list[int] = []
    for pdf in pdfs:
        ts.extend(int(t.timestamp()) for t in pdf["ts"])
    out = []
    if state.hasTimedOut:
        if state.exists:
            s, last, n = state.get
            out.append((user_id, s, last, n))
        state.remove()
    else:
        ts.sort()
        if state.exists:
            s, last, n = state.get
        elif ts:
            s, last, n = ts[0], ts[0], 0
        else:
            s = last = n = None
        for t in ts:
            if n > 0 and t - last > SESSION_GAP_S:
                out.append((user_id, s, last, n))
                s, last, n = t, t, 1
            else:
                last = max(last, t)
                n += 1
        if n:
            state.update((s, last, n))
            state.setTimeoutDuration(60 * 1000)
    yield pd.DataFrame(
        [
            {
                "user_id": u,
                "session_start": pd.Timestamp(s0, unit="s"),
                "session_end": pd.Timestamp(l0, unit="s"),
                "n_events": n0,
            }
            for (u, s0, l0, n0) in out
        ],
        columns=["user_id", "session_start", "session_end", "n_events"],
    )


def streaming_sessionize(events_stream: DataFrame) -> DataFrame:
    """events (user_id, ts) → closed sessions via applyInPandasWithState."""
    return (
        events_stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_job_intake(
    spark: SparkSession,
    intake_dir: str,
    checkpoint_dir: str,
    store_root: str,
    pages: DataFrame,
    generate_artifacts: bool = False,
    available_now: bool = True,
):
    """Continuous job intake: JSON job configs dropped into ``intake_dir``
    stream into the queue and run — the reference's always-on worker
    (src/worker.ts:220-236 polling loop + POST /jobs intake) as Structured
    Streaming. ``foreachBatch`` is the right tool because each micro-batch
    drives the BATCH engine (enqueue + drain on the snapshot store).
    foreachBatch side effects are AT-LEAST-ONCE (a crash between enqueue()
    and the checkpoint commit replays the batch), so intake is made
    IDEMPOTENT: job_ids derive deterministically from the MICRO-BATCH id
    plus the config content hash, and enqueue() skips ids already in the
    queue — a replayed batch enqueues nothing and re-drains
    already-terminal jobs as a no-op, yielding effectively-once intake.
    Mixing ``batch_id`` in (ADVICE r3) keeps replay dedup exact while a
    LATER legitimate re-submission of an identical config (a periodic
    recrawl request, the reference's POST /jobs always-new-job semantics,
    src/server.ts) lands in a new micro-batch and gets a fresh id — even
    after clear_completed() has dropped the old terminal row.
    AvailableNow drains what's present then stops (resumable); pass
    ``available_now=False`` for a live continuous worker."""
    import hashlib as _hashlib
    import json as _json

    from ..config import CrawlConfig
    from ..plans.jobs import JobWorker
    from ..state import SnapshotStore

    raw = (
        spark.readStream.schema("value string")
        .option("wholetext", True)
        .text(intake_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        worker = JobWorker(
            spark, SnapshotStore(store_root), pages,
            generate_artifacts=generate_artifacts,
        )
        configs = []
        for row in batch_df.collect():  # config payloads: tiny, driver-side
            try:
                d = _json.loads(row["value"])
            except ValueError:
                continue
            for item in d if isinstance(d, list) else [d]:
                try:
                    configs.append(CrawlConfig.from_dict(item))
                except Exception:  # noqa: BLE001 — malformed job: skip, don't kill the stream
                    continue
        if configs:
            # deterministic per-(batch, config) ids ⇒ a REPLAY of this
            # micro-batch is a no-op, while the same config arriving in a
            # later batch is a new job (see docstring)
            ids = [
                "intake-" + _hashlib.sha256(
                    f"{batch_id}|".encode() + _json.dumps(
                        cfg.to_dict(), sort_keys=True).encode()
                ).hexdigest()[:16]
                for cfg in configs
            ]
            worker.enqueue(configs, job_ids=ids)
        worker.run_until_drained()

    writer = raw.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_against_index(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    output_dir: str,
    checkpoint_dir: str,
    num_perm: int = 128,
    bands: int = 16,
    est_threshold: float = 0.7,
):
    """Streaming incremental dedup: micro-batches of incoming documents
    (parquet files of (doc_id, text)) are matched against the persisted
    MinHash fingerprint index (text_dedup.minhash_index written by the
    batch pipeline), and NEW fingerprints are folded into the index after
    each batch — so a duplicate arriving in batch N+1 of a doc first seen
    in batch N is caught.

    Per micro-batch (foreachBatch — the index fold-in is a batch-side
    write, same pattern as stream_job_intake):
      1. match the batch against the current index
         (text_dedup.minhash_match_index — band join + signature-estimator
         verify, historical text never needed)
      2. append the verdicts (new_id, match_id, est_jaccard, is_dup) to
         ``output_dir``
      3. append the batch's OWN fingerprints to the index (survivors and
         dups alike — CC keeps every capture's digest; downstream filters
         on is_dup)
    Exactly-once: re-delivered batches overwrite their own output
    partition (batch_id in the path) and re-append identical fingerprint
    rows whose duplicates are harmless to the estimator (same (id, band)
    keys carry the same minima; match_index dedups candidate pairs).

    ``Trigger.AvailableNow`` drains what's present then stops — resumable
    from the checkpoint like every other pipeline here."""
    import os

    from ..operators.text_dedup import minhash_index, minhash_match_index

    docs = spark.readStream.schema("doc_id long, text string").parquet(
        input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            have_index = os.path.isdir(index_path) and any(
                f.endswith(".parquet") for f in os.listdir(index_path))
            if have_index:
                idx = spark.read.parquet(index_path)
                verdicts = minhash_match_index(
                    batch_df, idx, num_perm=num_perm, bands=bands,
                    est_threshold=est_threshold)
            else:
                verdicts = batch_df.select(
                    F.col("doc_id").alias("new_id"),
                    F.lit(None).cast("long").alias("match_id"),
                    F.lit(None).cast("double").alias("est_jaccard"),
                    F.lit(False).alias("is_dup"),
                )
            (verdicts.write.mode("overwrite")
             .parquet(os.path.join(output_dir, f"batch={batch_id}")))
            (minhash_index(batch_df, num_perm=num_perm, bands=bands)
             .write.mode("append").parquet(index_path))
        finally:
            batch_df.unpersist()

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
