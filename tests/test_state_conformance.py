"""State-layer conformance suite (VERDICT r4 #5).

The engine talks to its durable state ONLY through the
``state.SnapshotStore`` surface (read / read_buckets / commit / snapshot /
snapshots / head_id / find_tag / rollback / bucket_table / bucket_tables /
expire_orphans). This file pins that contract with backend-parametrized
tests: any store passing them can be handed to ``CrawlScheduler`` /
``JobWorker`` unchanged.

Backends:
  * ``parquet`` — state.SnapshotStore (always runs; this is also what
    proves the suite itself, since every contract rule here is one the
    parity/soak tests already rely on implicitly)
  * ``iceberg`` — iceberg.IcebergSnapshotStore against a live catalog.
    The sandbox has no Iceberg jars, so the fixture probes and SKIPS; on a
    real cluster set CC_SPARK_ICEBERG_CATALOG (and optionally
    CC_SPARK_ICEBERG_NS) and the same tests run against Iceberg.

The ledger state machine the Iceberg adapter commits through
(iceberg.Ledger) is additionally unit-tested here directly — pure Python,
no catalog needed — so the adapter's manifest logic has first-class
coverage even where the catalog I/O cannot execute.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest

from context_crawler_spark.iceberg import Ledger
from context_crawler_spark.state import SnapshotStore


@pytest.fixture(params=["parquet", "iceberg"])
def make_store(request, spark, tmp_path):
    """Factory: each call returns a FRESH conformant store."""
    if request.param == "parquet":
        n = [0]

        def factory():
            n[0] += 1
            return SnapshotStore(str(tmp_path / f"s{n[0]}"))

        return factory
    catalog = os.environ.get("CC_SPARK_ICEBERG_CATALOG")
    if not catalog:
        pytest.skip("no Iceberg catalog in this environment "
                    "(set CC_SPARK_ICEBERG_CATALOG on a real cluster)")
    from context_crawler_spark.iceberg import IcebergSnapshotStore

    ns = os.environ.get("CC_SPARK_ICEBERG_NS", "cc_spark_conformance")
    n = [0]

    def factory():
        n[0] += 1
        return IcebergSnapshotStore(spark, catalog, f"{ns}_{n[0]}")

    return factory


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- contract


def test_commit_advances_head_and_roundtrips(spark, make_store):
    store = make_store()
    assert store.head_id() is None and store.snapshot() is None
    df = spark.range(5).withColumnRenamed("id", "k")
    s0 = store.commit({"t": df}, metadata={"round": 1}, tag="seed")
    assert s0.snapshot_id == store.head_id() == 0
    assert s0.metadata["round"] == 1 and "committed_at" in s0.metadata
    assert s0.tag == "seed" and s0.parent_id is None
    assert _rows(store.read(spark, "t")) == [(i,) for i in range(5)]
    assert store.read(spark, "missing") is None
    assert store.find_tag("seed").snapshot_id == 0


def test_untouched_tables_carry_forward_by_reference(spark, make_store):
    store = make_store()
    a = spark.range(3).withColumnRenamed("id", "a")
    b = spark.range(2).withColumnRenamed("id", "b")
    store.commit({"ta": a})
    s1 = store.commit({"tb": b})
    assert s1.parent_id == 0
    # ta was not rewritten, yet is fully readable at the new head
    assert _rows(store.read(spark, "ta")) == [(0,), (1,), (2,)]
    assert set(s1.tables) >= {"ta", "tb"}


def test_time_travel_and_snapshot_listing(spark, make_store):
    store = make_store()
    store.commit({"t": spark.range(3)})
    store.commit({"t": spark.range(10, 12)})
    assert _rows(store.read(spark, "t")) == [(10,), (11,)]
    assert _rows(store.read(spark, "t", snapshot_id=0)) == [(0,), (1,), (2,)]
    assert [s.snapshot_id for s in store.snapshots()] == [0, 1]


def test_rollback_then_recommit_replaces_forward_history(spark, make_store):
    store = make_store()
    store.commit({"t": spark.range(1)}, tag="r0")
    store.commit({"t": spark.range(2)}, tag="r1")
    store.rollback(0)
    assert store.head_id() == 0
    assert _rows(store.read(spark, "t")) == [(0,)]
    # replay: the new round 1 takes over snapshot id 1 (scheduler
    # rollback-replay contract — test_rollback_replays_round relies on it)
    s1b = store.commit({"t": spark.range(5, 7)}, tag="r1b")
    assert s1b.snapshot_id == 1 and store.head_id() == 1
    assert _rows(store.read(spark, "t")) == [(5,), (6,)]
    assert store.snapshot(1).tag == "r1b"
    assert store.find_tag("r1b").snapshot_id == 1


def test_drop_removes_from_head_but_not_history(spark, make_store):
    store = make_store()
    store.commit({"t": spark.range(3), "u": spark.range(1)})
    store.commit({}, drop=["u"])
    assert store.read(spark, "u") is None
    assert "u" not in store.snapshot().tables
    assert _rows(store.read(spark, "u", snapshot_id=0)) == [(0,)]
    assert _rows(store.read(spark, "t")) == [(0,), (1,), (2,)]


def test_bucketed_partition_overwrite_contract(spark, make_store):
    from pyspark.sql import functions as F

    store = make_store()

    def bdf(rows):  # (bucket, value)
        return spark.createDataFrame(rows, "__b int, v string")

    # seed buckets 0 and 1
    store.commit({}, bucketed={
        "fr": (bdf([(0, "a"), (0, "b"), (1, "c")]), "__b", [0, 1])})
    assert set(store.bucket_tables("fr")) == {0, 1}
    got = store.read_buckets(spark, "fr")
    # contract: bucket id is placement metadata, NOT part of the schema
    assert got.columns == ["v"]
    assert _rows(got) == [("a",), ("b",), ("c",)]
    # touch ONLY bucket 1; bucket 0 carries forward by reference
    store.commit({}, bucketed={"fr": (bdf([(1, "c2")]), "__b", [1])})
    assert _rows(store.read_buckets(spark, "fr")) == [("a",), ("b",), ("c2",)]
    assert _rows(store.read_buckets(spark, "fr", buckets=[1])) == [("c2",)]
    # drain bucket 0 (touched, zero rows) → gone from the manifest
    store.commit({}, bucketed={"fr": (bdf([]).limit(0), "__b", [0])})
    assert set(store.bucket_tables("fr")) == {1}
    assert _rows(store.read_buckets(spark, "fr")) == [("c2",)]
    # absent bucket reads as empty, not an error
    assert store.read_buckets(spark, "fr", buckets=[0]) is None
    # time travel still sees the fat version
    assert _rows(store.read_buckets(spark, "fr", snapshot_id=0)) == [
        ("a",), ("b",), ("c",)]
    assert store.bucket_table("fr", 3) == "fr#b3"


def test_partition_by_prunes_without_changing_contents(spark, make_store):
    store = make_store()
    df = spark.createDataFrame(
        [("pending", "u1"), ("completed", "u2"), ("pending", "u3")],
        "status string, url string")
    store.commit({"frontier": df})  # DEFAULT_PARTITIONING: status
    out = store.read(spark, "frontier").filter("status = 'pending'")
    assert sorted(r["url"] for r in out.collect()) == ["u1", "u3"]
    # full read carries both columns (partition col round-trips as data)
    assert set(store.read(spark, "frontier").columns) == {"status", "url"}


def test_expire_orphans_keeps_reachable_history(spark, make_store):
    store = make_store()
    store.commit({"t": spark.range(2)})
    store.commit({"t": spark.range(4)})
    store.expire_orphans()
    # every snapshot referenced by a manifest stays readable
    assert _rows(store.read(spark, "t", snapshot_id=0)) == [(0,), (1,)]
    assert _rows(store.read(spark, "t", snapshot_id=1)) == [
        (0,), (1,), (2,), (3,)]


def test_scheduler_runs_end_to_end_on_any_conformant_store(
        spark, make_store):
    """The engine needs NOTHING beyond the conformance surface: a real
    3-round crawl (seed → drain) against the factory store, with oracle
    fetch-order parity."""
    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.scheduler import CrawlScheduler
    from context_crawler_spark.sources.synthetic_web import PAGES_SCHEMA

    from .oracle import run_oracle

    web = {
        "https://c.test/": "<html><body><article>root "
        '<a href="/a">a</a><a href="/b">b</a></article></body></html>',
        "https://c.test/a": "<html><body><article>page a "
        '<a href="/b">b</a></article></body></html>',
        "https://c.test/b": "<html><body><article>page b"
        "</article></body></html>",
    }
    config = CrawlConfig(entry="https://c.test/",
                         match=["https://c.test/**"], selector="article",
                         politeness_budget=1, auto_discover_nav=False)
    oracle = run_oracle(config, web)
    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    pages = spark.createDataFrame(
        [(u, ts, h.encode(), "t", "en") for u, h in sorted(web.items())],
        PAGES_SCHEMA)
    store = make_store()
    eng = CrawlScheduler(spark, store, config, pages, n_buckets=4,
                         frontier_buckets=4)
    eng.seed()
    while not eng.meta.get("finished"):
        eng.run_round()
    assert eng.visit_order() == oracle.visit_order == [
        "https://c.test/", "https://c.test/a", "https://c.test/b"]


# ------------------------------------------------- pure ledger state machine


def _commit(led, tables, **kw):
    row = led.next_commit_row(
        {t: Ledger._entry(sid, bcol=kw.pop("bcol", None))
         if not isinstance(sid, dict) else sid
         for t, sid in tables.items()},
        committed_at=kw.pop("committed_at", 1.0), **kw)
    led.rows.append(row)
    return row


def test_ledger_head_and_carry_forward():
    led = Ledger()
    assert led.head_id() is None and led.snapshot() is None
    _commit(led, {"ta": 100}, metadata={"round": 0}, tag="seed")
    _commit(led, {"tb": 200})
    assert led.head_id() == 1
    snap = led.snapshot()
    # ta carried forward by reference into snapshot 1
    assert snap.tables["ta"]["snap"] == 100
    assert snap.tables["tb"]["snap"] == 200
    assert snap.parent_id == 0
    assert led.find_tag("seed").snapshot_id == 0
    assert led.snapshot(0).metadata["round"] == 0


def test_ledger_drop_and_bucket_entries():
    led = Ledger()
    _commit(led, {"t#b0": 10, "t#b1": 10}, bcol="__b")
    _commit(led, {"t#b1": 11}, drop=["t#b0"], bcol="__b")
    snap = led.snapshot()
    assert "t#b0" not in snap.tables
    assert snap.tables["t#b1"] == {"snap": 11, "bcol": "__b"}
    # history intact
    assert led.snapshot(0).tables["t#b0"]["snap"] == 10


def test_ledger_rollback_is_an_append_and_replay_shadows():
    led = Ledger()
    _commit(led, {"t": 1}, tag="r0")
    _commit(led, {"t": 2}, tag="r1")
    led.rows.append(led.head_move_row(0))
    assert led.head_id() == 0
    assert led.snapshot().tables["t"]["snap"] == 1
    # replay: next commit reuses id 1 and SHADOWS the stale branch
    row = _commit(led, {"t": 3}, tag="r1b")
    assert row["snapshot_id"] == 1
    assert led.head_id() == 1
    assert led.snapshot(1).tag == "r1b"
    assert led.snapshot(1).tables["t"]["snap"] == 3
    assert [s.snapshot_id for s in led.snapshots()] == [0, 1]
    with pytest.raises(ValueError):
        led.head_move_row(99)


def test_ledger_rows_are_json_safe():
    led = Ledger()
    row = _commit(led, {"t": 5}, metadata={"fetched_total": 7}, tag="x")
    # every value must survive a ledger-table round trip (strings/ints)
    rt = json.loads(json.dumps(row))
    assert rt == row
    assert json.loads(rt["tables"]) == {"t": {"snap": 5}}
    assert json.loads(rt["metadata"])["fetched_total"] == 7


# ------------------------------------------------------- crash injection

def test_crash_windows_leave_orphans_invisible_and_resume_clean(spark, tmp_path):
    """VERDICT r5 #4 fallback: the parquet store's one safety argument is
    that the atomic HEAD-pointer flip is the ONLY commit point. Simulate
    the two crash windows of ``commit()`` — (A) data dirs written but no
    manifest, (B) data dirs AND manifest written but HEAD never flipped —
    and assert that in both windows the orphans are invisible at HEAD, a
    fresh store over the same root resumes cleanly, a re-driven commit
    converges to the exact state an uninterrupted run reaches, and
    ``expire_orphans`` removes exactly the crashed dirs."""
    root = str(tmp_path / "crash")
    store = SnapshotStore(root)
    df = lambda v: spark.createDataFrame([(1, v)], "id long, v string")  # noqa: E731
    store.commit({"t": df("a")})
    store.commit({"t": df("b")})
    assert store.head_id() == 1

    def vals(st, sid=None):
        return sorted(r["v"] for r in st.read(spark, "t", sid).collect())

    # -- window A: data written, crash before the manifest existed
    orphan_a = os.path.join(root, "data", "t", "v99-crasha")
    df("ORPHAN-A").write.parquet(orphan_a)
    assert store.head_id() == 1 and vals(store) == ["b"]
    resumed = SnapshotStore(root)  # fresh process over the same root
    assert resumed.head_id() == 1 and vals(resumed) == ["b"]
    assert resumed.expire_orphans() == 1  # exactly the crashed dir
    assert not os.path.exists(orphan_a)
    assert vals(resumed) == ["b"] and vals(resumed, 0) == ["a"]

    # -- window B: data + manifest written, crash before the HEAD flip
    orphan_b = os.path.join("data", "t", "v2-crashb")
    df("ORPHAN-B").write.parquet(os.path.join(root, orphan_b))
    crashed = {
        "snapshot_id": 2, "parent_id": 1, "tables": {"t": orphan_b},
        "metadata": {"committed_at": 0.0}, "tag": "crashed",
    }
    with open(os.path.join(root, "manifests", "2.json"), "w") as f:
        json.dump(crashed, f)
    # HEAD never moved: the crashed snapshot is not the current state
    resumed2 = SnapshotStore(root)
    assert resumed2.head_id() == 1 and vals(resumed2) == ["b"]
    # resume: the next real commit reuses id 2, SHADOWING the crashed
    # manifest (same replay rule the Ledger pins), and flips HEAD once
    snap = resumed2.commit({"t": df("c")}, tag="real")
    assert snap.snapshot_id == 2 and resumed2.head_id() == 2
    assert vals(resumed2) == ["c"]
    assert resumed2.snapshot(2).tag == "real"
    # the crashed dir is now unreachable from any manifest -> GC'd
    assert resumed2.expire_orphans() == 1
    assert not os.path.exists(os.path.join(root, orphan_b))
    # full history intact and readable after both crashes + GC
    assert [s.snapshot_id for s in resumed2.snapshots()] == [0, 1, 2]
    assert vals(resumed2, 0) == ["a"] and vals(resumed2, 1) == ["b"]
    assert vals(resumed2, 2) == ["c"]
