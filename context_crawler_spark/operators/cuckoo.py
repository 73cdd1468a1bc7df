"""Sharded cuckoo filter — the delete-capable URL-seen prefilter.

Companion to the bloom shards (operators/bloom.py); same role (a prefilter
in front of the exact ``url_seen`` anti-join, never the source of truth)
and same sharding (``bucket = pmod(url_hash, n_buckets)``, one ``.npz``
table per shard on shared storage), different trade-offs:

  * supports DELETE (a bloom cannot) — needed if the seen-set ever expires
    entries (e.g. recrawl-after-TTL policies)
  * ~same space at 4 slots × 16-bit fingerprints with ≤95% load
  * probes are fully vectorized numpy (two bucket reads per key);
    inserts use a bounded-eviction loop per NEW key — fine for per-round
    increments, which is the only build path the scheduler uses after
    seeding

Standard partial-key cuckoo hashing (Fan et al., CoNEXT'14, public):
fingerprint ``fp = 16 low bits of splitmix64(h), 0 mapped to 1``;
buckets ``i1 = H(h)``, ``i2 = i1 XOR H'(fp)`` — XOR makes the pair
involutive so relocation never needs the original key.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import _mix  # splitmix64 double-hash bases (shared)
from .ids import bucket_col

SLOTS = 4
MAX_KICKS = 500


def shard_path(shards_dir: str, bucket: int) -> str:
    return os.path.join(shards_dir, f"cuckoo-{bucket:05d}.npy")


def _fingerprints(h: np.ndarray) -> np.ndarray:
    h1, _ = _mix(h)
    fp = (h1 & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _index1(h: np.ndarray, nb: int) -> np.ndarray:
    h1, _ = _mix(h)
    return ((h1 >> np.uint64(16)) & np.uint64(nb - 1)).astype(np.int64)


def _fp_offset(fp: np.ndarray, nb: int) -> np.ndarray:
    # H'(fp): cheap odd-multiplier mix of the fingerprint
    return ((fp.astype(np.uint64) * np.uint64(0x5BD1E995))
            & np.uint64(nb - 1)).astype(np.int64)


def _index2(i1: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    # XOR-involution (Fan et al.) REQUIRES nb to be a power of two: with a
    # `% nb` of arbitrary nb, an evicted fingerprint can relocate to a
    # bucket contains() never probes → false negatives → recrawls.
    return (i1 ^ _fp_offset(fp, nb)) & (nb - 1)


def _pow2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length()


class CuckooTable:
    """One shard: (nb, SLOTS) uint16 table. Pure numpy/python — runs inside
    mapInPandas tasks only."""

    def __init__(self, nb: int, table: np.ndarray | None = None):
        if nb & (nb - 1):
            raise ValueError(f"nb must be a power of two, got {nb}")
        self.nb = nb
        self.table = table if table is not None else np.zeros((nb, SLOTS), np.uint16)

    # -- single-key ops (insert path) --------------------------------------
    def _try_put(self, ix: int, fp: int) -> bool:
        row = self.table[ix]
        for s in range(SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def insert(self, h: np.ndarray, rng_seed: int = 12345) -> int:
        """Insert keys (int64 hashes); returns number that failed after
        MAX_KICKS (callers treat failures as always-maybe-seen overflow —
        tracked, never silently dropped)."""
        fps = _fingerprints(h)
        i1s = _index1(h, self.nb)
        rng = np.random.RandomState(rng_seed)
        failures = 0
        for fp0, i1 in zip(fps.tolist(), i1s.tolist()):
            fp = fp0
            ix = i1
            if self._try_put(ix, fp):
                continue
            ix = int(_index2(np.array([ix]), np.array([fp], np.uint16), self.nb)[0])
            placed = False
            for _ in range(MAX_KICKS):
                if self._try_put(ix, fp):
                    placed = True
                    break
                s = rng.randint(SLOTS)
                fp, self.table[ix, s] = int(self.table[ix, s]), fp
                ix = int(_index2(np.array([ix]), np.array([fp], np.uint16), self.nb)[0])
            if not placed:
                failures += 1
        return failures

    # -- vectorized probes ---------------------------------------------------
    def contains(self, h: np.ndarray) -> np.ndarray:
        fps = _fingerprints(h)
        i1 = _index1(h, self.nb)
        i2 = _index2(i1, fps, self.nb)
        t = self.table
        hit = (t[i1] == fps[:, None]).any(axis=1)
        hit |= (t[i2] == fps[:, None]).any(axis=1)
        return hit

    def delete(self, h: np.ndarray) -> int:
        """Remove one copy of each key's fingerprint; returns count removed."""
        fps = _fingerprints(h)
        i1 = _index1(h, self.nb)
        i2 = _index2(i1, fps, self.nb)
        removed = 0
        for fp, a, b in zip(fps.tolist(), i1.tolist(), i2.tolist()):
            done = False
            for ix in (a, b):
                row = self.table[ix]
                for s in range(SLOTS):
                    if row[s] == fp:
                        row[s] = 0
                        removed += 1
                        done = True
                        break
                if done:
                    break
        return removed


def build_cuckoo_shards(
    seen: DataFrame,
    shards_dir: str,
    n_buckets: int,
    expected_per_bucket: int,
    hash_col: str = "url_hash",
    merge_existing: bool = False,
) -> dict:
    """(Re)build/merge per-bucket cuckoo tables from (new) seen keys. Sized
    for ≤50% load at the expectation so per-round increments stay cheap."""
    os.makedirs(shards_dir, exist_ok=True)
    # power of two: the partial-key XOR pair is only involutive then
    nb = _pow2(max(64, int(expected_per_bucket * 2 / SLOTS)))
    df = seen.select(
        F.col(hash_col).alias("h"), bucket_col(F.col(hash_col), n_buckets).alias("bucket")
    ).repartition(n_buckets, "bucket")

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables: dict[int, CuckooTable] = {}

        def load(b: int) -> CuckooTable:
            p = shard_path(shards_dir, b)
            if merge_existing and os.path.exists(p):
                t = np.load(p)
                if t.shape == (nb, SLOTS):
                    return CuckooTable(nb, t)
            return CuckooTable(nb)

        rows = []
        for pdf in it:
            for b, grp in pdf.groupby("bucket"):
                t = tables.setdefault(int(b), load(int(b)))
                fails = t.insert(grp["h"].to_numpy(np.int64))
                if fails:
                    rows.append({"bucket": int(b), "overflow": int(fails)})
        for b, t in tables.items():
            np.save(shard_path(shards_dir, b), t.table)
            rows.append({"bucket": b, "overflow": 0})
        yield pd.DataFrame(rows, columns=["bucket", "overflow"])

    overflow = (
        df.mapInPandas(build, "bucket int, overflow int")
        .agg(F.sum("overflow")).collect()[0][0]
    ) or 0
    return {"n_buckets": n_buckets, "nb": nb, "slots": SLOTS,
            "overflow": int(overflow)}


def with_maybe_seen(
    candidates: DataFrame,
    shards_dir: str,
    meta: dict,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Add ``maybe_seen``: False ⇒ definitely new (modulo table overflow,
    which ``meta['overflow']`` reports — callers fall back to the exact
    join for everything when overflow > 0)."""
    n_buckets, nb = meta["n_buckets"], meta["nb"]
    df = candidates.withColumn("__bucket", bucket_col(F.col(hash_col), n_buckets))
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField("maybe_seen", BooleanType(), False)]
    )

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, CuckooTable | None] = {}
        for pdf in it:
            flags = np.zeros(len(pdf), dtype=bool)
            for b, idx in pdf.groupby("__bucket").groups.items():
                b = int(b)
                if b not in cache:
                    p = shard_path(shards_dir, b)
                    cache[b] = CuckooTable(nb, np.load(p)) if os.path.exists(p) else None
                t = cache[b]
                if t is None:
                    continue
                h = pdf.loc[idx, hash_col].to_numpy(np.int64)
                flags[pdf.index.get_indexer(idx)] = t.contains(h)
            out = pdf.copy()
            out["maybe_seen"] = flags
            yield out

    return df.mapInPandas(probe, out_schema).drop("__bucket")


def delete_keys(
    keys: DataFrame, shards_dir: str, meta: dict, hash_col: str = "url_hash"
) -> int:
    """Remove keys from the filter (the bloom can't do this) — used when
    seen entries expire for recrawl. Returns fingerprints removed."""
    n_buckets, nb = meta["n_buckets"], meta["nb"]
    df = keys.select(
        F.col(hash_col).alias("h"), bucket_col(F.col(hash_col), n_buckets).alias("bucket")
    ).repartition(n_buckets, "bucket")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables: dict[int, CuckooTable] = {}
        removed = 0
        for pdf in it:
            for b, grp in pdf.groupby("bucket"):
                b = int(b)
                if b not in tables:
                    p = shard_path(shards_dir, b)
                    if not os.path.exists(p):
                        continue
                    tables[b] = CuckooTable(nb, np.load(p))
                removed += tables[b].delete(grp["h"].to_numpy(np.int64))
        for b, t in tables.items():
            np.save(shard_path(shards_dir, b), t.table)
        yield pd.DataFrame({"removed": [removed]})

    res = df.mapInPandas(run, "removed long").agg(F.sum("removed")).collect()[0][0]
    return int(res or 0)
