"""Sharded bloom filter over the URL-seen set — the dedup PRE-filter.

The north rule calls for a "partitioned bloom/cuckoo URL-seen structure keyed
by canonicalized-URL xxhash64". Design (SURVEY.md §4):

  * the EXACT ``url_seen`` table is the source of truth; the bloom is only a
    pre-filter that lets rows which are *definitely new* skip the exact
    anti-join — at 10^10 seen URLs that's the difference between shuffling
    every candidate and shuffling only the (tiny) maybe-seen fraction
  * the filter is SHARDED by ``bucket = pmod(url_hash, n_buckets)``, the same
    bucketing as ``url_seen``, so each shard stays MB-sized and a task probes
    exactly one shard file — nothing cluster-wide is broadcast
  * shards are rebuildable from ``url_seen`` at any snapshot (no opaque
    sidecar as source of truth) and live as ``.npy`` bitmaps on shared
    storage (locally: the store dir; on a cluster: DFS/object store)

Probing is vectorized numpy inside ``mapInPandas`` (double hashing,
``g_i(x) = h1 + i*h2 mod m`` — Kirsch-Mitzenmacher), zero per-row Python.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import bucket_col

DEFAULT_BITS_PER_KEY = 12   # ~0.4% fpp at k=8
DEFAULT_NUM_HASHES = 8


def _mix(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """splitmix64-style double-hash bases from int64 url_hash values."""
    x = h.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h1 = z ^ (z >> np.uint64(31))
    h2 = ((x << np.uint64(1)) | np.uint64(1))  # odd → full-period stepping
    return h1, h2


def _probe_bits(hashes: np.ndarray, m_bits: int, k: int) -> Iterator[np.ndarray]:
    h1, h2 = _mix(hashes)
    m = np.uint64(m_bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % m).astype(np.int64)


def shard_path(shards_dir: str, bucket: int) -> str:
    return os.path.join(shards_dir, f"bloom-{bucket:05d}.npy")


def build_bloom_shards(
    seen: DataFrame,
    shards_dir: str,
    n_buckets: int,
    expected_per_bucket: int,
    hash_col: str = "url_hash",
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    num_hashes: int = DEFAULT_NUM_HASHES,
    merge_existing: bool = False,
) -> dict:
    """(Re)build shards from ``seen``. Each task builds the bitmap for its
    bucket and writes it to shared storage directly — the driver never sees
    a bitmap. With ``merge_existing``, ``seen`` may be just the NEW keys and
    bits OR into the existing shard files (the per-round incremental path:
    O(new) not O(total)). Returns {n_buckets, m_bits, k}."""
    os.makedirs(shards_dir, exist_ok=True)
    m_bits = max(1024, int(expected_per_bucket * bits_per_key))
    m_bytes = (m_bits + 7) // 8
    if not merge_existing:
        # full rebuild (seed, or a capacity doubling): clear stale shards
        # first — a leftover bitmap from a previous sizing would be probed
        # at the wrong m_bits. O(n_buckets) unlink calls, metadata-sized.
        for name in os.listdir(shards_dir):
            if name.startswith("bloom-") and name.endswith(".npy"):
                os.unlink(os.path.join(shards_dir, name))

    df = seen.select(
        F.col(hash_col).alias("h"), bucket_col(F.col(hash_col), n_buckets).alias("bucket")
    ).repartition(n_buckets, "bucket")

    def build(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmaps: dict[int, np.ndarray] = {}

        def load(b: int) -> np.ndarray:
            if merge_existing:
                p = shard_path(shards_dir, b)
                if os.path.exists(p):
                    bm = np.load(p)
                    if len(bm) != m_bytes:
                        # NEVER silently reset: dropping a shard's existing
                        # keys creates bloom FALSE NEGATIVES, and
                        # anti_join_seen admits "definitely new" rows
                        # without the exact join — silent duplicates. A
                        # size mismatch means the caller merged at the
                        # wrong expected_per_bucket; resizes must go
                        # through a full rebuild (merge_existing=False).
                        raise ValueError(
                            f"bloom shard {p} is {len(bm)} bytes, merge "
                            f"expects {m_bytes}; rebuild shards instead "
                            "of merging at a new size")
                    return bm
            return np.zeros(m_bytes, dtype=np.uint8)

        for pdf in iterator:
            for b, grp in pdf.groupby("bucket"):
                bm = bitmaps.setdefault(int(b), load(int(b)))
                h = grp["h"].to_numpy(dtype=np.int64)
                for bits in _probe_bits(h, m_bits, num_hashes):
                    np.bitwise_or.at(bm, bits >> 3, (1 << (bits & 7)).astype(np.uint8))
        rows = []
        for b, bm in bitmaps.items():
            np.save(shard_path(shards_dir, b), bm)
            rows.append({"bucket": b, "n_bytes": len(bm)})
        yield pd.DataFrame(rows, columns=["bucket", "n_bytes"])

    built = df.mapInPandas(build, "bucket int, n_bytes long").count()
    meta = {"n_buckets": n_buckets, "m_bits": m_bits, "k": num_hashes,
            "shards_built": int(built),
            # capacity + footprint, persisted so the scheduler's resize
            # policy reads the SHARDS' actual sizing, not its constructor
            "expected_per_bucket": int(expected_per_bucket),
            "shard_bytes_total": int(n_buckets) * int(m_bytes)}
    return meta


def with_maybe_seen(
    candidates: DataFrame,
    shards_dir: str,
    meta: dict,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Add ``maybe_seen boolean``: False ⇒ definitely not in the seen set
    (bloom guarantee) ⇒ the row can skip the exact anti-join entirely.
    Missing shard file ⇒ empty bucket ⇒ definitely new."""
    n_buckets, m_bits, k = meta["n_buckets"], meta["m_bits"], meta["k"]
    df = candidates.withColumn("__bucket", bucket_col(F.col(hash_col), n_buckets))
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField("maybe_seen", BooleanType(), False)]
    )

    def probe(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, np.ndarray | None] = {}
        for pdf in iterator:
            flags = np.zeros(len(pdf), dtype=bool)
            for b, idx in pdf.groupby("__bucket").groups.items():
                b = int(b)
                if b not in cache:
                    p = shard_path(shards_dir, b)
                    cache[b] = np.load(p) if os.path.exists(p) else None
                bm = cache[b]
                if bm is None:
                    continue
                h = pdf.loc[idx, hash_col].to_numpy(dtype=np.int64)
                maybe = np.ones(len(h), dtype=bool)
                for bits in _probe_bits(h, m_bits, k):
                    maybe &= (bm[bits >> 3] & (1 << (bits & 7)).astype(np.uint8)) != 0
                    if not maybe.any():
                        break
                flags[pdf.index.get_indexer(idx)] = maybe
            pdf = pdf.copy()
            pdf["maybe_seen"] = flags
            yield pdf

    return df.mapInPandas(probe, out_schema).drop("__bucket")


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame | None,
    hash_col: str = "url_hash",
    shards_dir: str | None = None,
    bloom_meta: dict | None = None,
) -> DataFrame:
    """URL-seen dedup: the reference RequestQueue's uniqueKey rejection
    (reference src/core.ts:203-207,341,349) as an explicit LEFT ANTI join,
    with the bloom pre-filter splitting off definitely-new rows first.

    ``candidates`` must already carry ``url_hash``; in-batch duplicates are
    NOT removed here (callers dedup with dropDuplicates for first-wins
    semantics before calling).
    """
    if seen is None:
        return candidates
    if shards_dir and bloom_meta:
        flagged = with_maybe_seen(candidates, shards_dir, bloom_meta, hash_col)
        definitely_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        survivors = maybe.join(seen.select(hash_col), on=hash_col, how="left_anti")
        return definitely_new.unionByName(survivors)
    return candidates.join(seen.select(hash_col), on=hash_col, how="left_anti")
