"""Approximate quantiles — the rank/distribution member of the engine's
sketch family (bloom/cuckoo membership, HLL cardinality, CMS frequency,
GK quantiles).

Why a crawler wants it: latency SLO percentiles per host feed
``adaptive_host_delays``, document-length percentiles calibrate the
Gopher/C4 gates and the token-budget output splitter, and score
percentiles preview ``quantile_gate`` cuts — but an EXACT percentile is
a global sort, and at 10^10 rows a sort per metric per round is the
bottleneck. Greenwald & Khanna (SIGMOD 2001, "Space-efficient online
computation of quantile summaries") bound the summary at
O((1/ε)·log(εN)) tuples with a DETERMINISTIC worst-case rank error
ε·N — not probabilistic like CMS/HLL.

Spark-first expression: ``F.percentile_approx`` IS the GK summary as a
Catalyst aggregate (ApproximatePercentile), so the whole sketch rides
whole-stage codegen with map-side partial summaries — the exchange
carries one O(1/ε) summary per partition per group, independent of the
data size, and the merge step is the paper's summary-combine. No UDF, no
driver-side state, no second scan. ``accuracy`` is Spark's knob:
rank error ε = 1/accuracy.

Contract shape (q:approx_quantiles): the GK bound is deterministic, so
the contract asserts per (group, p) that the exact rank window of the
estimate intersects [(p−ε)·N, (p+ε)·N] — exact ranks computed by ONE
broadcast-joined count pass, TRUE/TRUE replayed by the oracle (the
hyperball/CMS bound-oracle pattern). Exact-quantile parity at
``accuracy >= N`` and the grouped/merged paths are pytest-pinned.

Reference parity: the reference keeps no quantile state — its queue
stats are exact COUNTs at single-node scale (src/queue-manager.ts
getStats); this is the 100 TB replacement the brief's scale mandate
asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    accuracy: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One row per (group, prob): the GK estimate for each requested
    quantile. NULL values are ignored (the aggregate's semantics); a
    group with no non-null values emits NULL estimates.

    Plan: ONE partial-aggregated exchange on the group keys (or a single
    scalar agg) — the shuffle payload is GK summaries, not rows.
    """
    pcol = F.percentile_approx(
        value_col,
        F.array(*[F.lit(float(p)) for p in probs]),
        F.lit(int(accuracy)),
    ).alias("__ests")
    if group_cols:
        agg = df.groupBy(*group_cols).agg(pcol)
    else:
        agg = df.agg(pcol)
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in probs]).alias("p"),
        F.col("__ests").alias("est"),
    )
    return agg.select(
        *(group_cols or []),
        F.explode(pairs).alias("__pe"),
    ).select(
        *(group_cols or []),
        F.col("__pe.p").alias("p"),
        F.col("__pe.est").alias("est"),
    )


def quantile_bound_check(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    accuracy: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The GK guarantee as data: for every (group, p) the exact rank
    window of the estimate — [count(x < est) + 1, count(x <= est)] —
    must intersect [(p−ε)·N, (p+ε)·N], ε = 1/accuracy (floor/ceil
    widened to the enclosing integers, and clamped to [1, N] at the
    edges the way GK rank targets are).

    Exact ranks cost ONE more pass: the estimates table is tiny
    (groups × probs), so the rank counts ride a broadcast join + the
    same groupBy partitioning — no sort, no window.
    """
    eps = 1.0 / int(accuracy)
    ests = approx_quantiles(df, value_col, probs, accuracy, group_cols)
    v = df.select(
        *(group_cols or []), F.col(value_col).alias("__v")
    ).filter(F.col("__v").isNotNull())
    on = list(group_cols or [])
    joined = v.join(F.broadcast(ests), on=on) if on else v.crossJoin(
        F.broadcast(ests))
    ranks = joined.groupBy(*on, "p", "est").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("__v") < F.col("est")).cast("long")).alias("__lt"),
        F.sum((F.col("__v") <= F.col("est")).cast("long")).alias("__le"),
    )
    lo = F.greatest(
        F.floor((F.col("p") - F.lit(eps)) * F.col("n")), F.lit(1)
    ).cast("long")
    hi = F.least(
        F.ceil((F.col("p") + F.lit(eps)) * F.col("n")), F.col("n")
    ).cast("long")
    return ranks.select(
        *on,
        "p",
        F.col("n").cast("long").alias("n"),
        ((F.col("__le") >= lo) & (F.col("__lt") + 1 <= hi)).alias("rank_ok"),
    )
