"""Cuckoo-filter shards: no false negatives, useful fpp, delete support,
merge increments, overflow accounting."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from context_crawler_spark.operators import cuckoo
from context_crawler_spark.operators.cuckoo import CuckooTable


def test_table_roundtrip_and_delete_pure():
    t = CuckooTable(nb=1024)
    h = np.arange(1, 1500, dtype=np.int64) * 2654435761
    fails = t.insert(h)
    assert fails == 0
    assert t.contains(h).all()
    fresh = np.arange(100000, 102000, dtype=np.int64) * 2654435761
    fpp = t.contains(fresh).mean()
    assert fpp < 0.05
    removed = t.delete(h[:500])
    assert removed == 500
    assert not t.contains(h[:500]).any() or t.contains(h[:500]).mean() < 0.05
    assert t.contains(h[500:]).all()  # others untouched


def test_cuckoo_shards_no_false_negatives(spark, tmp_path):
    seen = spark.range(0, 4000).select(F.xxhash64("id").alias("url_hash"))
    meta = cuckoo.build_cuckoo_shards(seen, str(tmp_path), n_buckets=8,
                                      expected_per_bucket=1024)
    assert meta["overflow"] == 0
    flagged = cuckoo.with_maybe_seen(seen, str(tmp_path), meta)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
    fresh = spark.range(10**6, 10**6 + 4000).select(F.xxhash64("id").alias("url_hash"))
    fp = cuckoo.with_maybe_seen(fresh, str(tmp_path), meta).filter(
        F.col("maybe_seen")).count()
    assert fp < 200  # <5%


def test_cuckoo_incremental_merge_and_delete(spark, tmp_path):
    a = spark.range(0, 1000).select(F.xxhash64("id").alias("url_hash"))
    b = spark.range(1000, 2000).select(F.xxhash64("id").alias("url_hash"))
    meta = cuckoo.build_cuckoo_shards(a, str(tmp_path), 4, 1024)
    cuckoo.build_cuckoo_shards(b, str(tmp_path), 4, 1024, merge_existing=True)
    both = a.union(b)
    assert cuckoo.with_maybe_seen(both, str(tmp_path), meta).filter(
        ~F.col("maybe_seen")).count() == 0
    # delete the first half; they become (mostly) definitely-new again
    removed = cuckoo.delete_keys(a, str(tmp_path), meta)
    assert removed == 1000
    still = cuckoo.with_maybe_seen(a, str(tmp_path), meta).filter(
        F.col("maybe_seen")).count()
    assert still < 50  # only residual fp collisions
    assert cuckoo.with_maybe_seen(b, str(tmp_path), meta).filter(
        ~F.col("maybe_seen")).count() == 0  # b unaffected


def test_non_power_of_two_sizing_is_rounded_up():
    """ADVICE r1: i2 = (i1 XOR H'(fp)) is only involutive for power-of-two
    nb; arbitrary sizing could relocate evicted fingerprints to buckets
    contains() never probes (false negatives → recrawls). Sizing must
    round up; a direct non-pow2 table must be rejected."""
    import numpy as np
    import pytest as _pytest

    from context_crawler_spark.operators.cuckoo import CuckooTable, _pow2

    with _pytest.raises(ValueError):
        CuckooTable(nb=96)
    assert _pow2(96) == 128 and _pow2(128) == 128 and _pow2(1) == 1

    # heavy eviction pressure at a pow2-rounded size: inserted keys must
    # all still probe positive (the involution guarantee)
    rng = np.random.RandomState(7)
    keys = rng.randint(-2**62, 2**62, size=900, dtype=np.int64)
    t = CuckooTable(nb=_pow2(300))  # 512*4 slots, ~44% load → real kicking
    fails = t.insert(keys)
    ok = t.contains(keys)
    assert fails == 0 and bool(ok.all())


def test_shard_build_rounds_nb(spark, tmp_path):
    from context_crawler_spark.operators.cuckoo import build_cuckoo_shards

    df = spark.range(500).select(
        (F.col("id") * 2654435761).alias("url_hash")
    )
    meta = build_cuckoo_shards(df, str(tmp_path / "ck"), n_buckets=4,
                               expected_per_bucket=1000)  # 2*1000/4=500 → 512
    assert meta["nb"] == 512
