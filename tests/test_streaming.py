"""Structured Streaming pipelines: incremental extraction with
Trigger.AvailableNow + checkpoint resume, watermarked host stats, and
applyInPandasWithState sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from context_crawler_spark.sources.synthetic_web import (
    PAGES_SCHEMA,
    generate_pages,
    pages_df,
)
from context_crawler_spark.streaming.pipelines import (
    stream_extract_pages,
    streaming_host_stats,
    streaming_sessionize,
)


def test_stream_extract_incremental_with_resume(spark, tmp_path):
    rows = generate_pages(seed=42, n_hosts=2, pages_per_section=3)
    half = len(rows) // 2
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    pages_df(spark, rows[:half]).write.mode("append").parquet(in_dir)
    q = stream_extract_pages(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == half

    # drop more files; a NEW query over the same checkpoint processes ONLY
    # the delta (exactly-once resume)
    pages_df(spark, rows[half:]).write.mode("append").parquet(in_dir)
    q2 = stream_extract_pages(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(rows)
    # extraction parity: streamed text == the golden pages.text
    golden = {r["url"]: r["text"] for r in rows}
    for r in got2.select("url", "text").collect():
        assert r["text"] == golden[r["url"]]


def test_streaming_host_stats_watermarked(spark, tmp_path):
    rows = generate_pages(seed=42, n_hosts=3, pages_per_section=2)
    in_dir = str(tmp_path / "in")
    pages_df(spark, rows).write.parquet(in_dir)
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    agg = streaming_host_stats(stream, window="1 minute", watermark="2 minutes")
    # complete mode for the assertion: append would hold back windows the
    # watermark hasn't passed yet (nothing arrives after the last event)
    q = (
        agg.writeStream.format("memory").queryName("hostagg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from hostagg")
    total = got.agg(F.sum("fetched")).collect()[0][0]
    assert total == len(rows)
    assert {r["host"] for r in got.select("host").distinct().collect()} == {
        "site0.test", "site1.test", "site2.test"
    }


def test_streaming_sessionize_state(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2-hour gap; user 2: one session
    for i in range(3):
        rows.append((1, base + dt.timedelta(seconds=60 * i)))
    for i in range(2):
        rows.append((1, base + dt.timedelta(hours=2, seconds=60 * i)))
    rows.append((2, base))
    in_dir = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(in_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").collect()
    # the CLOSED session (user 1's first) is emitted; open ones stay in state
    closed = [(r["user_id"], r["n_events"]) for r in got]
    assert (1, 3) in closed


def test_stream_job_intake_runs_jobs(spark, tiny_pages, tmp_path):
    """Config JSONs dropped in the intake dir are enqueued and crawled by
    the streaming worker; re-running the stream does NOT re-run processed
    files (exactly-once intake via the streaming checkpoint)."""
    import json
    import os

    from context_crawler_spark.plans.jobs import JobWorker
    from context_crawler_spark.state import SnapshotStore
    from context_crawler_spark.streaming.pipelines import stream_job_intake

    intake = tmp_path / "intake"
    os.makedirs(intake)
    (intake / "job1.json").write_text(json.dumps({
        "entry": "https://site0.test/",
        "match": ["https://site0.test/**"],
        "selector": "article",
        "name": "stream-job-1",
    }))
    store_root = str(tmp_path / "store")
    q = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt"),
                          store_root, tiny_pages)
    q.awaitTermination(600)
    w = JobWorker(spark, SnapshotStore(store_root), tiny_pages)
    s = w.stats()
    assert s["completed"] == 1 and s["total"] == 1

    # second drain with no new files: nothing re-runs
    q2 = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt"),
                           store_root, tiny_pages)
    q2.awaitTermination(600)
    assert JobWorker(spark, SnapshotStore(store_root), tiny_pages).stats() == s

    # a newly dropped config is picked up by the next drain
    (intake / "job2.json").write_text(json.dumps({
        "entry": "https://site1.test/",
        "match": ["https://site1.test/**"],
        "selector": "article",
        "name": "stream-job-2",
    }))
    q3 = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt"),
                           store_root, tiny_pages)
    q3.awaitTermination(600)
    s3 = JobWorker(spark, SnapshotStore(store_root), tiny_pages).stats()
    assert s3["completed"] == 2 and s3["total"] == 2


def test_stream_job_intake_replay_is_idempotent(spark, tiny_pages, tmp_path):
    """foreachBatch side effects are at-least-once: a crash between
    enqueue() and the checkpoint commit replays the batch. Deterministic
    content-hash job_ids must make the replay a no-op (ADVICE r2)."""
    import json
    import os
    import shutil

    from context_crawler_spark.plans.jobs import JobWorker
    from context_crawler_spark.state import SnapshotStore
    from context_crawler_spark.streaming.pipelines import stream_job_intake

    intake = tmp_path / "intake"
    os.makedirs(intake)
    (intake / "job1.json").write_text(json.dumps({
        "entry": "https://site0.test/",
        "match": ["https://site0.test/**"],
        "selector": "article",
        "name": "replayed-job",
    }))
    store_root = str(tmp_path / "store")
    q = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt"),
                          store_root, tiny_pages)
    q.awaitTermination(600)
    s1 = JobWorker(spark, SnapshotStore(store_root), tiny_pages).stats()
    assert s1["completed"] == 1 and s1["total"] == 1

    # simulate the crash-replay: wipe the checkpoint so the SAME file is
    # reprocessed as a fresh batch against the surviving queue state
    shutil.rmtree(tmp_path / "ckpt")
    q2 = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt2"),
                           store_root, tiny_pages)
    q2.awaitTermination(600)
    s2 = JobWorker(spark, SnapshotStore(store_root), tiny_pages).stats()
    assert s2 == s1  # no duplicate job, nothing re-crawled


def test_stream_job_intake_resubmission_is_a_new_job(spark, tiny_pages,
                                                     tmp_path):
    """ADVICE r3: a legitimate LATER re-submission of an identical config
    (periodic recrawl; the reference's POST /jobs always creates a new
    job) must run again — job ids mix the micro-batch id, so only a
    replay of the SAME batch dedupes."""
    import json
    import os

    from context_crawler_spark.plans.jobs import JobWorker
    from context_crawler_spark.state import SnapshotStore
    from context_crawler_spark.streaming.pipelines import stream_job_intake

    payload = json.dumps({
        "entry": "https://site0.test/",
        "match": ["https://site0.test/**"],
        "selector": "article",
        "name": "periodic-job",
    })
    intake = tmp_path / "intake"
    os.makedirs(intake)
    (intake / "wave1.json").write_text(payload)
    store_root = str(tmp_path / "store")
    q = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt"),
                          store_root, tiny_pages)
    q.awaitTermination(600)
    w = JobWorker(spark, SnapshotStore(store_root), tiny_pages)
    assert w.stats()["completed"] == 1

    # identical config, new intake file, next micro-batch → NEW job
    (intake / "wave2.json").write_text(payload)
    q2 = stream_job_intake(spark, str(intake), str(tmp_path / "ckpt"),
                           store_root, tiny_pages)
    q2.awaitTermination(600)
    s = JobWorker(spark, SnapshotStore(store_root), tiny_pages).stats()
    assert s["completed"] == 2 and s["total"] == 2


def test_stream_dedup_against_index_across_batches(spark, tmp_path):
    """Streaming incremental dedup: a doc first seen in batch 1 is caught
    as a duplicate when a near-copy arrives in batch 2; fresh docs pass;
    the fingerprint index grows batch over batch."""
    from context_crawler_spark.streaming.pipelines import (
        stream_dedup_against_index,
    )

    in_dir, out_dir, idx, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "idx", "ckpt"))
    base = [
        f"document number {i} about topic{i} "
        + (f"filler{i} words{i} repeat{i} unique{i} content{i} " * 8)
        for i in range(6)
    ]
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)], "doc_id long, text string"
    ).write.mode("append").parquet(in_dir)
    q = stream_dedup_against_index(spark, in_dir, idx, out_dir, ckpt)
    q.awaitTermination(120)
    v1 = spark.read.parquet(out_dir)
    # first batch: empty index → nothing to match
    assert v1.count() == 6
    assert v1.filter(F.col("is_dup")).count() == 0

    # batch 2: one exact copy, one near copy, one fresh doc
    batch2 = [
        (100, base[0]),
        (101, base[1].replace("filler1", "changed", 1)),
        (102, "entirely fresh material nothing shared "
              + "novel tokens " * 12),
    ]
    spark.createDataFrame(
        batch2, "doc_id long, text string"
    ).write.mode("append").parquet(in_dir)
    q2 = stream_dedup_against_index(spark, in_dir, idx, out_dir, ckpt)
    q2.awaitTermination(120)
    got = {r["new_id"]: r for r in
           spark.read.parquet(out_dir).filter(
               F.col("new_id") >= 100).collect()}
    assert got[100]["is_dup"] and got[100]["match_id"] == 0
    assert got[100]["est_jaccard"] == 1.0
    assert got[101]["is_dup"] and got[101]["match_id"] == 1
    assert not got[102]["is_dup"] and got[102]["match_id"] is None
    # index now fingerprints both batches
    assert spark.read.parquet(idx).select("id").distinct().count() == 9
