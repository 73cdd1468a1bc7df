"""Deterministic crawl ordering — the claim-order parity surface.

The reference's crawl order is the SQLite claim query ``ORDER BY priority
DESC, createdAt ASC LIMIT 1`` (reference src/queue.ts:131-137, implicit
rowid tie-break) over a FIFO BFS frontier (Crawlee RequestQueue,
src/core.ts:203-207,265,341). The engine replicates it with a globally
monotonic ``seq`` (the rowid analog) assigned deterministically — never
RAW ``monotonically_increasing_id``, whose values depend on partition
layout.

``with_global_seq`` is the scalable zipWithIndex: range-repartition by the
order key, sort within partitions, eagerly localCheckpoint (freezing both
the partition layout and the in-partition order — this is what makes the
id's per-partition counter well-defined), then seq = the collected
per-partition offset (a handful of longs on the driver — NOT data) + the
row's position within its frozen partition (the low 33 bits of
``monotonically_increasing_id``, pure JVM; the r1-r3 mapInPandas doing the
same arithmetic Arrow-round-tripped every row through Python). One
shuffle, no single-partition window, survives 10^10 rows; determinism is
pinned by the oracle-parity suites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .politeness import claim_order


def with_global_seq(
    df: DataFrame,
    order_cols: list[Column | str],
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
    counts_out: dict | None = None,
) -> DataFrame:
    """Assign ``seq_col`` = start, start+1, … following ``order_cols``.

    Deterministic for any partitioning of the input (the range partitioner
    and in-partition sort both key on ``order_cols``, which must be a total
    order — include a unique tie-breaker).

    ``counts_out``, if given, receives ``{"total": n}`` — the row count is
    a free by-product of the per-partition counts job, so callers that
    need it can skip their own count() pass.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    parted = parted.withColumn("__pid", F.spark_partition_id())
    # Materialize ONCE: the per-partition count is a separate Spark query,
    # and exchange reuse doesn't span queries — without this the (often
    # expensive) upstream plan would run twice.
    parted = parted.localCheckpoint(eager=True)
    counts = {r["__pid"]: r["cnt"] for r in
              parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    if counts_out is not None:
        counts_out["total"] = int(sum(counts.values()))
    if not counts:  # empty input
        return df.withColumn(seq_col, F.lit(start).cast("long"))
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    # Stamp the index NARROWLY and JVM-SIDE: seq = offset[pid] + the row's
    # position within its partition. The position comes from
    # monotonically_increasing_id's per-partition counter (its low 33 bits
    # — the id is (partitionId << 33) + rowIndex), which is well-defined
    # here because the eager localCheckpoint above froze both the
    # partition layout and the in-partition sort order. The r1-r3 shape —
    # a mapInPandas doing the same arithmetic — Arrow-round-tripped every
    # row through Python and was ~4.6 s of the 7.8 s frontier hot path at
    # 5M rows (BENCH.md r4); this is the same narrow plan with zero
    # Python. A window partitionBy(pid) would instead add a shuffle that
    # AQE coalesces to ONE partition on modest data, serializing every
    # downstream stage.
    omap = F.create_map(
        *[F.lit(x) for pid in sorted(offsets)
          for x in (int(pid), int(offsets[pid]))]
    )
    return (
        parted.withColumn(
            seq_col,
            (F.element_at(omap, F.col("__pid"))
             + F.pmod(F.monotonically_increasing_id(), F.lit(1 << 33))
             ).cast("long"),
        )
        .drop("__pid")
    )


def with_running_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "running_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed prefix sum: ``out_col`` = sum of ``value_col`` over all
    rows strictly BEFORE this one in ``order_cols`` order (a total order —
    include a unique tie-breaker).

    The classic two-phase scan, never a global single-partition window:
    range-repartition by the order key, localCheckpoint to freeze the
    layout, collect ONE per-partition sum per partition (a handful of longs
    — not data), then each row's prefix = its partition's offset + a
    window cumsum partitioned BY PARTITION ID. That window's exchange keys
    on ``num_partitions`` distinct pids — parallelism scales with the
    cluster, and no partition ever holds more than the range-partitioner's
    balanced share. Contrast ``Window.orderBy(...)`` with no partitionBy,
    which funnels every row through one task.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    parted = parted.withColumn("__pid", F.spark_partition_id())
    parted = parted.localCheckpoint(eager=True)
    sums = {r["__pid"]: r["s"] for r in
            parted.groupBy("__pid")
            .agg(F.sum(value_col).alias("s")).collect()}
    if not sums:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)
    omap = F.create_map(
        *[F.lit(x) for pid in sorted(offsets)
          for x in (int(pid), int(offsets[pid]))]
    )
    from pyspark.sql import Window

    w = (Window.partitionBy("__pid").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        parted.withColumn(
            out_col,
            (F.element_at(omap, F.col("__pid"))
             + F.coalesce(F.sum(value_col).over(w), F.lit(0))).cast("long"),
        )
        .drop("__pid")
    )


TOPK_THRESHOLD = 20_000  # below this, per-partition-heap TakeOrdered wins


def emit_fetch_batch(
    frontier: DataFrame,
    max_batch: int | None = None,
) -> DataFrame:
    """Order the (politeness-capped) eligible rows by claim order and stamp
    ``fetch_order``; optionally truncate to ``max_batch`` (the
    maxPagesToCrawl remainder, reference src/core.ts:169-175).

    Two physical strategies by K: a small limit compiles to
    TakeOrderedAndProject (per-partition heaps, k rows to the driver side of
    the exchange); a large/absent limit must NOT use a global limit (Spark
    funnels it through ONE task) — instead a distributed range-sort assigns
    ``fetch_order`` (zipWithIndex trick) and a plain filter truncates.
    """
    if max_batch is not None and max_batch <= TOPK_THRESHOLD:
        capped = frontier.orderBy(*claim_order()).limit(int(max_batch))
        # the input is BOUNDED (≤ TOPK_THRESHOLD rows out of TakeOrdered), so
        # one single-task window over it is scale-safe by construction and
        # avoids with_global_seq's fixed costs (checkpoint + counts job +
        # Arrow round-trip) — the banned pattern is a global window over an
        # UNBOUNDED input, guarded by test_plans
        from pyspark.sql import Window

        w = Window.orderBy(*claim_order())
        return capped.withColumn(
            "fetch_order", (F.row_number().over(w) - 1).cast("long")
        )
    out = with_global_seq(frontier, claim_order(), seq_col="fetch_order")
    if max_batch is not None:
        out = out.filter(F.col("fetch_order") < int(max_batch))
    return out
