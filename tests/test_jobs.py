"""Job-queue worker tests: claim ordering, lifecycle, retry/backoff,
multi-job isolation (reference src/queue.ts + src/worker.ts semantics)."""

from __future__ import annotations

from context_crawler_spark.config import CrawlConfig
from context_crawler_spark.plans.jobs import JobWorker
from context_crawler_spark.state import SnapshotStore


def test_multi_job_claim_order_and_isolation(spark, tiny_pages, tmp_path):
    store = SnapshotStore(str(tmp_path / "q"))
    w = JobWorker(spark, store, tiny_pages)
    cfgs = [
        CrawlConfig(entry="https://site0.test/", match=["https://site0.test/docs/**"],
                    selector="article", name="low"),
        CrawlConfig(entry="https://site1.test/", match=["https://site1.test/docs/**"],
                    selector="article", name="high"),
        CrawlConfig(entry="https://site2.test/", match=["https://site2.test/docs/**"],
                    selector="article", name="mid"),
    ]
    w.enqueue(cfgs, priorities=[0, 5, 3])
    results = w.run_until_drained()
    # claim order: priority DESC, created_seq ASC
    assert [r.job_id for r in results] == ["job-000001", "job-000002", "job-000000"]
    assert all(r.status == "completed" and r.pages > 0 for r in results)
    s = w.stats()
    assert s["completed"] == 3 and s["total"] == 3
    # per-job isolated sub-stores with their own snapshots
    for r in results:
        sub = w._job_store(r.job_id)
        assert sub.head_id() is not None
        # live frontier drains to empty on a finished crawl; the terminal
        # history lives in the frontier_done deltas (live/done split)
        done = [t for t in sub.snapshot().tables
                if t.startswith("frontier_done")]
        assert done and sum(
            sub.read(spark, t).count() for t in done) > 0


def test_job_failure_retry_then_terminal(spark, tiny_pages, tmp_path, monkeypatch):
    store = SnapshotStore(str(tmp_path / "q"))
    w = JobWorker(spark, store, tiny_pages)
    cfg = CrawlConfig(entry="https://site0.test/", match=["https://site0.test/docs/**"],
                      selector="article")
    w.enqueue([cfg], max_attempts=2)

    calls = {"n": 0}
    from context_crawler_spark.plans import jobs as jobs_mod

    def boom(self, row):
        calls["n"] += 1
        return jobs_mod.JobResult(row["job_id"], "failed", 0, error="synthetic")

    monkeypatch.setattr(JobWorker, "run_job", boom)
    results = w.run_until_drained(max_ticks=20)
    # two attempts (max_attempts=2), then terminal failed
    assert calls["n"] == 2
    assert w.stats()["failed"] == 1
    q = {r["job_id"]: r for r in w._queue()}
    assert q["job-000000"]["error"] == "synthetic"
    assert q["job-000000"]["attempts"] == 2


def test_stuck_claim_recovery(spark, tiny_pages, tmp_path):
    """ADVICE r1 / reference recoverStuckJobs (src/queue.ts:232-245): a
    crash between claim and finish leaves the row 'claimed'; a fresh worker
    must re-pend and complete it instead of draining around an orphan."""
    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.jobs import JobWorker
    from context_crawler_spark.state import SnapshotStore

    store = SnapshotStore(str(tmp_path / "q"))
    cfg = CrawlConfig(entry="https://site0.test/",
                      match=["https://site0.test/**"], selector="article")
    w1 = JobWorker(spark, store, tiny_pages)
    (job_id,) = w1.enqueue([cfg])
    w1._tick = 1
    claimed = w1.claim_next()
    assert claimed["job_id"] == job_id
    del w1  # crash before _finish

    w2 = JobWorker(spark, store, tiny_pages)
    assert w2.stats()["claimed"] == 1
    results = w2.run_until_drained()
    assert [r.status for r in results] == ["completed"]
    st = w2.stats()
    assert st["completed"] == 1 and st["claimed"] == 0 and st["pending"] == 0

    # in-loop lease expiry: artificially claimed row with an old tick
    rows = w2._queue()
    rows[0]["status"] = "claimed"
    rows[0]["claimed_at"] = 0
    w2._commit_queue(rows, tag="simulate-stuck")
    w2._tick = 100
    assert w2.recover_stuck_jobs(lease_ticks=30) == 1
    assert w2.recover_stuck_jobs(lease_ticks=1000) == 0


def test_clear_completed_jobs(spark, tiny_pages, tmp_path):
    """clearCompletedJobs parity (reference scripts/clear-queue.js):
    completed/failed rows drop from the queue, pending rows survive."""
    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.jobs import JobWorker
    from context_crawler_spark.state import SnapshotStore

    store = SnapshotStore(str(tmp_path / "q"))
    w = JobWorker(spark, store, tiny_pages)
    cfg = CrawlConfig(entry="https://site0.test/",
                      match=["https://site0.test/**"], selector="article")
    w.enqueue([cfg, cfg, cfg])
    rows = w._queue()
    rows[0]["status"] = "completed"
    rows[1]["status"] = "failed"
    w._commit_queue(rows, tag="simulate")
    assert w.clear_completed() == 2
    s = w.stats()
    assert s["total"] == 1 and s["pending"] == 1
    assert w.clear_completed() == 0


def test_null_claimed_at_counts_as_expired(spark, tiny_pages, tmp_path):
    """ADVICE r2: rows persisted by the pre-claimed_at queue schema read
    back claimed_at=NULL — a lease-bounded sweep must recover them, not
    treat them as permanently leased."""
    store = SnapshotStore(str(tmp_path / "q"))
    w = JobWorker(spark, store, tiny_pages)
    cfg = CrawlConfig(entry="https://site0.test/",
                      match=["https://site0.test/**"], selector="article")
    w.enqueue([cfg])
    rows = w._queue()
    rows[0]["status"] = "claimed"
    rows[0]["claimed_at"] = None  # legacy row
    w._commit_queue(rows, tag="simulate-legacy")
    w._tick = 5
    assert w.recover_stuck_jobs(lease_ticks=30) == 1
    assert w.stats()["pending"] == 1


def test_enqueue_idempotent_with_explicit_ids(spark, tiny_pages, tmp_path):
    """Explicit job_ids make enqueue a no-op on replay (the streaming-intake
    at-least-once contract), while fresh ids still append."""
    store = SnapshotStore(str(tmp_path / "q"))
    w = JobWorker(spark, store, tiny_pages)
    a = CrawlConfig(entry="https://site0.test/",
                    match=["https://site0.test/**"], selector="article",
                    name="a")
    b = CrawlConfig(entry="https://site1.test/",
                    match=["https://site1.test/**"], selector="article",
                    name="b")
    ids1 = w.enqueue([a], job_ids=["intake-aaaa"])
    assert ids1 == ["intake-aaaa"] and w.stats()["total"] == 1
    # replay of the same batch: nothing added, same ids returned
    ids2 = w.enqueue([a], job_ids=["intake-aaaa"])
    assert ids2 == ["intake-aaaa"] and w.stats()["total"] == 1
    # mixed batch: only the new id lands, created_seq stays dense
    ids3 = w.enqueue([a, b], job_ids=["intake-aaaa", "intake-bbbb"])
    assert ids3 == ["intake-aaaa", "intake-bbbb"]
    q = {r["job_id"]: r for r in w._queue()}
    assert len(q) == 2
    assert q["intake-bbbb"]["created_seq"] == 1
