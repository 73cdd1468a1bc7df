"""Job-level queue + worker — the reference's orchestration layer.

Maps the SQLite queue/jobs tables and polling worker (reference
src/queue.ts, src/job-store.ts, src/worker.ts) onto the snapshot store:

  * ``job_queue`` rows: (job_id, name, status pending|claimed|completed|
    failed, priority, attempts, max_attempts, next_retry_at, created_seq,
    config JSON, error) — the reference DDL (src/queue.ts:68-87)
  * claim = the crawl-ordering rule ``priority DESC, createdAt ASC``
    with rowid tie-break (src/queue.ts:131-137) → here (priority DESC,
    created_seq ASC); claiming and completing are snapshot commits, the
    MVCC analog of the reference's WAL transactions (src/queue.ts:129-166)
  * each claimed job runs a full CrawlScheduler crawl in its own
    sub-store, then (optionally) the artifact stage — mirroring
    processCrawlJob (src/worker.ts:28-128)
  * failure → exponential backoff re-pend until max_attempts
    (src/queue.ts:186-227)

The queue table is tiny (one row per job), so this layer is driver-side
pandas-free orchestration; all heavy lifting stays in the per-job crawl
plans. Deterministic: jitter seeded, timestamps from a round counter.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..config import CrawlConfig
from ..state import SnapshotStore
from .artifacts import ArtifactService
from .scheduler import CrawlScheduler

QUEUE_SCHEMA = (
    "job_id string, name string, status string, priority int, attempts int,"
    " max_attempts int, next_retry_at int, created_seq long, config string,"
    " error string, output_snapshot int, claimed_at int"
)


@dataclass
class JobResult:
    job_id: str
    status: str
    pages: int
    error: str | None = None


class JobWorker:
    """Queue-driven multi-job runner (reference worker.ts)."""

    def __init__(self, spark: SparkSession, store: SnapshotStore,
                 pages: DataFrame, generate_artifacts: bool = False):
        self.spark = spark
        self.store = store
        self.pages = pages
        self.generate_artifacts = generate_artifacts
        self._tick = 0  # deterministic clock (poll round counter)

    # -- queue ops (reference src/queue.ts) ---------------------------------

    def _queue(self) -> list[dict[str, Any]]:
        df = self.store.read(self.spark, "job_queue")
        return [r.asDict() for r in df.collect()] if df is not None else []

    def _commit_queue(self, rows: list[dict[str, Any]], tag: str) -> None:
        df = self.spark.createDataFrame(
            [tuple(r.get(k) for k in [
                "job_id", "name", "status", "priority", "attempts",
                "max_attempts", "next_retry_at", "created_seq", "config",
                "error", "output_snapshot", "claimed_at",
            ]) for r in rows],
            QUEUE_SCHEMA,
        )
        self.store.commit({"job_queue": df}, tag=tag)

    def enqueue(self, configs: list[CrawlConfig],
                priorities: list[int] | None = None,
                max_attempts: int = 3,
                job_ids: list[str] | None = None) -> list[str]:
        """add() parity (src/queue.ts:100-123): pending rows, created_seq =
        enqueue order (the rowid analog). ``job_ids`` makes the call
        IDEMPOTENT: explicit ids already present in the queue are skipped,
        so an at-least-once replay (streaming intake re-running a batch
        after a crash) enqueues nothing twice."""
        rows = self._queue()
        existing = {r["job_id"] for r in rows}
        seq = max((r["created_seq"] for r in rows), default=-1) + 1
        ids = []
        added = 0
        for i, cfg in enumerate(configs):
            job_id = job_ids[i] if job_ids else f"job-{seq:06d}"
            ids.append(job_id)
            if job_id in existing:
                continue
            existing.add(job_id)
            rows.append({
                "job_id": job_id, "name": cfg.name, "status": "pending",
                "priority": (priorities[i] if priorities else cfg.priority),
                "attempts": 0, "max_attempts": max_attempts,
                "next_retry_at": None, "created_seq": seq,
                "config": json.dumps(cfg.to_dict()), "error": None,
                "output_snapshot": None, "claimed_at": None,
            })
            seq += 1
            added += 1
        if added:
            self._commit_queue(rows, tag="enqueue")
        return ids

    def claim_next(self) -> dict[str, Any] | None:
        """claimNextJob parity: eligible pending, ORDER BY priority DESC,
        created_seq ASC, LIMIT 1; flip to claimed, attempts++
        (src/queue.ts:125-167)."""
        rows = self._queue()
        eligible = [
            r for r in rows
            if r["status"] == "pending"
            and (r["next_retry_at"] is None or r["next_retry_at"] <= self._tick)
        ]
        if not eligible:
            return None
        eligible.sort(key=lambda r: (-r["priority"], r["created_seq"]))
        chosen = eligible[0]
        chosen["status"] = "claimed"
        chosen["attempts"] += 1
        chosen["claimed_at"] = self._tick
        self._commit_queue(rows, tag=f"claim-{chosen['job_id']}")
        return chosen

    def recover_stuck_jobs(self, lease_ticks: int | None = None) -> int:
        """recoverStuckJobs parity (reference src/queue.ts:232-245): re-pend
        claimed rows whose lease expired — a crash between the claim commit
        and the finish commit must not orphan the job. ``lease_ticks=None``
        (worker start) re-pends ALL claimed rows: this worker holds no
        claims yet and the loop is single-worker, so any claim is a
        leftover. Returns rows recovered."""
        rows = self._queue()
        n = 0
        for r in rows:
            if r["status"] != "claimed":
                continue
            # NULL claimed_at (rows persisted by the pre-claimed_at queue
            # schema) counts as EXPIRED, not permanently leased — otherwise
            # such rows could never be lease-recovered.
            if lease_ticks is not None and (
                r.get("claimed_at") is not None
                and r["claimed_at"] + lease_ticks > self._tick
            ):
                continue
            r["status"] = "pending"
            r["claimed_at"] = None
            r["error"] = "stuck_claim_recovered"
            n += 1
        if n:
            self._commit_queue(rows, tag="recover-stuck")
        return n

    def clear_completed(self) -> int:
        """clearCompletedJobs parity (reference scripts/clear-queue.js,
        src/queue.ts clearCompletedJobs): drop completed/failed rows from
        the queue; returns rows removed. Per-job sub-stores are untouched
        (output snapshots stay resolvable by id)."""
        rows = self._queue()
        keep = [r for r in rows if r["status"] not in ("completed", "failed")]
        removed = len(rows) - len(keep)
        if removed:
            self._commit_queue(keep, tag="clear-completed")
        return removed

    def stats(self) -> dict[str, int]:
        """getStats parity (src/queue.ts:279-313)."""
        rows = self._queue()
        out = {"pending": 0, "claimed": 0, "completed": 0, "failed": 0}
        for r in rows:
            out[r["status"]] = out.get(r["status"], 0) + 1
        out["total"] = len(rows)
        return out

    # -- worker loop (reference src/worker.ts) -------------------------------

    def _job_store(self, job_id: str) -> SnapshotStore:
        return SnapshotStore(f"{self.store.root}/jobs/{job_id}")

    def run_job(self, row: dict[str, Any]) -> JobResult:
        """processCrawlJob parity (src/worker.ts:28-128)."""
        cfg = CrawlConfig.from_dict(json.loads(row["config"]))
        sub = self._job_store(row["job_id"])
        try:
            eng = CrawlScheduler(self.spark, sub, cfg, self.pages, n_buckets=8)
            eng.run(max_rounds=1000)
            n_pages = int(eng.meta.get("fetched_total", 0))
            if self.generate_artifacts and n_pages:
                # fire-and-forget analog (src/worker.ts:60-72) — here inline
                ArtifactService(self.spark, sub).generate(
                    eng.pages_out(), sub.head_id()
                )
            return JobResult(row["job_id"], "completed", n_pages)
        except Exception as exc:  # noqa: BLE001 — job failure, not engine bug
            return JobResult(row["job_id"], "failed", 0, error=str(exc)[:500])

    def _finish(self, job_id: str, result: JobResult, backoff_ticks: int = 1) -> None:
        rows = self._queue()
        for r in rows:
            if r["job_id"] != job_id:
                continue
            if result.status == "completed":
                r["status"] = "completed"
                r["output_snapshot"] = self._job_store(job_id).head_id()
            elif r["attempts"] < r["max_attempts"]:
                # markFailed retry path (src/queue.ts:186-227): backoff
                # 2^(attempts-1) poll ticks
                r["status"] = "pending"
                r["next_retry_at"] = self._tick + backoff_ticks * (
                    2 ** (r["attempts"] - 1)
                )
                r["error"] = result.error
            else:
                r["status"] = "failed"
                r["error"] = result.error
        self._commit_queue(rows, tag=f"finish-{job_id}")

    def run_until_drained(self, max_ticks: int = 100) -> list[JobResult]:
        """Poll-claim-run loop (src/worker.ts:220-236); one claim per tick
        (the deterministic, WORKER_CONCURRENCY=1 form — parity target per
        SURVEY.md §2.5 note on concurrency races)."""
        results: list[JobResult] = []
        self.recover_stuck_jobs()  # crash leftovers from a dead worker
        for _ in range(max_ticks):
            self._tick += 1
            row = self.claim_next()
            if row is None:
                if not any(r["status"] == "pending" for r in self._queue()):
                    break
                continue
            result = self.run_job(row)
            self._finish(row["job_id"], result)
            results.append(result)
        return results
