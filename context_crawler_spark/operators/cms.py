"""Count-Min Sketch frequency estimation — the counting member of the
engine's sketch family (bloom/cuckoo for membership, HyperBall's HLL for
cardinality, CMS for frequency).

Why a crawler wants it: per-host request/URL frequencies drive politeness
budgets, trap suspicion, and domain caps, but an EXACT per-host count at
10^10 URLs means shuffling the full key column every round. Cormode &
Muthukrishnan 2005 ("An improved data stream summary: the count-min
sketch and its applications") bound the whole structure at
``depth × width`` counters with one-sided error: estimates never
undercount, and overcount by more than ``ε·N`` (``ε ≈ e/width``) with
probability at most ``δ = e^-depth``.

Spark-first expression — NO JVM sketch object, no driver-side state, no
Python in the row path:

  * **build**: each row explodes into ``depth`` (row, d) pairs hashed to
    ``bucket = pmod(xxhash64(key, d + seed), width)``; ONE groupBy
    ((d, bucket)) whose exchange carries at most ``depth × width``
    post-combine rows (map-side partials make the shuffle size
    independent of the data size — counters ARE the partial aggregate).
    The counter table is itself a DataFrame: persistable in the snapshot
    store, mergeable across crawl rounds by unioning + re-summing
    (counter addition is the paper's sketch merge).
  * **estimate**: probe keys explode the same way, broadcast-join the
    counter table (``depth × width`` rows ≤ a few MB for any sane
    config), and take ``min`` over the ``depth`` counters per key —
    groupBy(key) over ``depth`` rows per key.

Every hash is JVM ``xxhash64`` — deterministic across executors and
partitionings (pure column function), so the sketch is reproducible
bit-for-bit and the one-sided bound is testable as a hash-stable
contract (q:cms_heavy_hitters pins ``est ≥ exact`` — the theorem — and
``est ≤ exact + ceil(ε·N)`` — the 1-δ bound, deterministic for a fixed
corpus + seed).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_SEED = 7477


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Counter table ``(d, bucket, c)`` for the key column — at most
    ``depth × width`` rows regardless of input size."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = df.select(F.col(key_col).cast("string").alias("__k"))
    exploded = rows.select(
        "__k",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    )
    return (
        exploded.withColumn(
            "bucket",
            F.pmod(F.xxhash64("__k", F.col("d") + F.lit(seed)),
                   F.lit(width)),
        )
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, seed): counter
    addition (the paper's ⊕). Lets per-round sketches accumulate across
    a crawl without touching historical data."""
    if not counter_tables:
        raise ValueError("nothing to merge")
    u = counter_tables[0]
    for t in counter_tables[1:]:
        u = u.unionByName(t)
    return u.groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Point estimates for each distinct key in ``keys``: min over the
    ``depth`` counters (CMS query). The counter table broadcasts
    (≤ depth×width rows); a key absent from the stream estimates 0."""
    probes = (
        keys.select(F.col(key_col).cast("string").alias(key_col))
        .distinct()
        .select(
            key_col,
            F.explode(
                F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
        )
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col(key_col), F.col("d") + F.lit(seed)),
                   F.lit(width)),
        )
    )
    return (
        probes.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def cms_epsilon(width: int) -> float:
    """The paper's ε for a given width (ε = e / width)."""
    return math.e / width
