"""Retry/backoff state transitions — the reference queue's lifecycle columns.

Parity targets: eligibility predicate ``status='pending' AND (nextRetryAt IS
NULL OR nextRetryAt <= now)`` (reference src/queue.ts:132-137); exponential
backoff ``delay = backoff * 2^(attempts-1)`` (src/queue.ts:203) with worker
jitter ``0.5 + rand*0.5`` (src/worker.ts:102-106) — jitter here is SEEDED
per url_hash so tests are deterministic; terminal failure after
``maxAttempts`` (default 3, src/queue.ts:76); stuck-claim recovery after the
lease timeout (src/queue.ts:232-245).

All built-in expressions — these run over the full frontier every round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def eligible_pending(frontier: DataFrame, round_ts: Column) -> DataFrame:
    """Retry-eligibility predicate (reference src/queue.ts:132-137)."""
    return frontier.filter(
        (F.col("status") == "pending")
        & (F.col("next_retry_at").isNull() | (F.col("next_retry_at") <= round_ts))
    )


def seeded_jitter(url_hash: Column, seed: int = 42) -> Column:
    """Deterministic stand-in for the worker's Math.random jitter in
    [0.5, 1.0) (reference src/worker.ts:102-106)."""
    u = F.pmod(F.xxhash64(url_hash, F.lit(seed)), F.lit(1 << 30)) / F.lit(float(1 << 30))
    return F.lit(0.5) + u * 0.5


def backoff_delay_ms(attempts: Column, backoff_ms: Column | int,
                     jitter: Column | None = None) -> Column:
    """``backoff * 2^(attempts-1)`` ms (reference src/queue.ts:203), times
    optional jitter."""
    base = (F.lit(backoff_ms) if isinstance(backoff_ms, int) else backoff_ms)
    d = base * F.pow(F.lit(2.0), attempts.cast("double") - 1.0)
    return d * jitter if jitter is not None else d


def apply_failures(
    failed: DataFrame,
    round_ts: Column,
    backoff_ms: int,
    max_attempts: int,
    jitter_seed: int = 42,
) -> DataFrame:
    """Failed fetch rows → retried-pending (with next_retry_at) or terminal
    failed (reference markFailed, src/queue.ts:186-227). Expects ``attempts``
    to already count this try."""
    delay = backoff_delay_ms(
        F.col("attempts"), backoff_ms, seeded_jitter(F.col("url_hash"), jitter_seed)
    )
    will_retry = F.col("attempts") < F.lit(max_attempts)
    return failed.withColumn(
        "status", F.when(will_retry, F.lit("pending")).otherwise(F.lit("failed"))
    ).withColumn(
        "next_retry_at",
        F.when(
            will_retry,
            F.timestamp_millis(
                (F.unix_millis(round_ts) + delay).cast("long")
            ),
        ).otherwise(F.lit(None).cast("timestamp")),
    )


def cleanup_terminal(
    frontier: DataFrame, round_ts: Column, ttl_days: int = 7
) -> DataFrame:
    """TTL cleanup: drop completed/failed rows older than ``ttl_days``
    (reference clearCompleted, src/queue.ts:250-274; auto-run at
    src/worker.ts:75,210). The URL-seen set is SEPARATE state, so dropping
    terminal frontier rows never re-opens a URL — it just keeps the hot
    frontier table small (partition pruning on status does the rest)."""
    cutoff = round_ts - F.make_interval(days=F.lit(ttl_days))
    expired = (
        F.col("status").isin("completed", "failed")
        & F.col("completed_at").isNotNull()
        & (F.col("completed_at") < cutoff)
    )
    return frontier.filter(~expired)


def release_stuck_claims(
    frontier: DataFrame, round_ts: Column, lease_timeout_min: int = 30
) -> DataFrame:
    """Claimed rows older than the lease timeout flip back to pending
    (reference recoverStuckJobs, src/queue.ts:232-245) — the resume-time
    sweep; with snapshot checkpointing mostly a belt-and-braces guard."""
    cutoff = round_ts - F.make_interval(mins=F.lit(lease_timeout_min))
    stuck = (F.col("status") == "claimed") & (F.col("claimed_at") < cutoff)
    return frontier.withColumn(
        "status", F.when(stuck, F.lit("pending")).otherwise(F.col("status"))
    ).withColumn(
        "claimed_at", F.when(stuck, F.lit(None).cast("timestamp")).otherwise(F.col("claimed_at"))
    )
