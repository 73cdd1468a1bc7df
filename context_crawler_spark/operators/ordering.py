"""Deterministic crawl ordering — the claim-order parity surface.

The reference's crawl order is the SQLite claim query ``ORDER BY priority
DESC, createdAt ASC LIMIT 1`` (reference src/queue.ts:131-137, implicit
rowid tie-break) over a FIFO BFS frontier (Crawlee RequestQueue,
src/core.ts:203-207,265,341). The engine replicates it with a globally
monotonic ``seq`` (the rowid analog) assigned deterministically — never
``monotonically_increasing_id``, whose values depend on partition layout.

``with_global_seq`` is the scalable zipWithIndex: range-repartition by the
order key, sort within partitions, then offset per-partition row_numbers by
the collected per-partition counts (a handful of longs on the driver — NOT
data). One shuffle, no single-partition window, survives 10^10 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .politeness import claim_order


def with_global_seq(
    df: DataFrame,
    order_cols: list[Column | str],
    seq_col: str = "seq",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign ``seq_col`` = start, start+1, … following ``order_cols``.

    Deterministic for any partitioning of the input (the range partitioner
    and in-partition sort both key on ``order_cols``, which must be a total
    order — include a unique tie-breaker).
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *order_cols).sortWithinPartitions(*order_cols)
    parted = parted.withColumn("__pid", F.spark_partition_id())
    counts = {r["__pid"]: r["cnt"] for r in
              parted.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    if not counts:  # empty input
        return df.withColumn(seq_col, F.lit(start).cast("long"))
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offmap = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parted.withColumn(
            seq_col,
            (offmap[F.col("__pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("__pid")
    )


def emit_fetch_batch(
    frontier: DataFrame,
    max_batch: int | None = None,
) -> DataFrame:
    """Order the (politeness-capped) eligible rows by claim order and stamp
    ``fetch_order``; optionally truncate to ``max_batch`` (the
    maxPagesToCrawl remainder, reference src/core.ts:169-175).

    With a limit this is TakeOrderedAndProject (top-K, no global sort
    materialization); without, a distributed range-sort + the zipWithIndex
    trick — still no single-partition window.
    """
    if max_batch is not None:
        capped = frontier.orderBy(*claim_order()).limit(int(max_batch))
        return with_global_seq(capped, claim_order(), seq_col="fetch_order")
    return with_global_seq(frontier, claim_order(), seq_col="fetch_order")
