"""Snapshot-committed table store — the engine's checkpoint/resume layer.

Semantics are Apache Iceberg's (MVCC snapshots, atomic commit, time travel,
rollback); the sandbox has no Iceberg runtime jars, so this module provides
the same contract over plain parquet + a manifest pointer:

  * every table version is an immutable parquet directory
    ``data/{table}/v{snapshot}/``
  * a snapshot is a JSON manifest mapping table → data dir, plus metadata
    (round number, counters, tag)
  * commit = write new table dirs, write ``manifests/{id}.json``, then
    atomically rename a temp HEAD file over ``HEAD`` — a crash at ANY point
    leaves the previous snapshot intact (the new dirs are invisible orphans)
  * resume = read HEAD; rollback = point HEAD at an older manifest

On a real cluster, swap ``SnapshotStore`` for an Iceberg catalog: commit →
one transaction of ``MERGE INTO``/``writeTo().overwritePartitions()``,
snapshots/tags → Iceberg snapshots/refs, rollback → ``rollback_to_snapshot``.
The engine code (plans/driver.py) only touches this interface, so that swap
is confined to this file. This mirrors the reference's durable-state design
where SQLite WAL *is* the bus and the checkpoint (reference src/queue.ts:65,
src/job-store.ts:38) — here the manifest pointer is the WAL tip.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    tables: dict[str, str]          # table name -> data dir (relative to root)
    metadata: dict[str, Any] = field(default_factory=dict)
    parent_id: int | None = None
    tag: str | None = None


class SnapshotStore:
    """Versioned multi-table store with atomic snapshot commits."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------

    @property
    def _head_path(self) -> str:
        return os.path.join(self.root, "HEAD")

    def head_id(self) -> int | None:
        try:
            with open(self._head_path) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _manifest_path(self, snapshot_id: int) -> str:
        return os.path.join(self.root, "manifests", f"{snapshot_id}.json")

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        sid = snapshot_id if snapshot_id is not None else self.head_id()
        if sid is None:
            return None
        try:
            with open(self._manifest_path(sid)) as f:
                d = json.load(f)
        except FileNotFoundError:
            return None
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            tables=d["tables"],
            metadata=d.get("metadata", {}),
            parent_id=d.get("parent_id"),
            tag=d.get("tag"),
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        mdir = os.path.join(self.root, "manifests")
        for name in sorted(os.listdir(mdir), key=lambda n: int(n.split(".")[0])):
            s = self.snapshot(int(name.split(".")[0]))
            if s:
                out.append(s)
        return out

    def find_tag(self, tag: str) -> Snapshot | None:
        for s in reversed(self.snapshots()):
            if s.tag == tag:
                return s
        return None

    # -- read/write -------------------------------------------------------------

    def read(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None) -> DataFrame | None:
        """Table contents at a snapshot (HEAD by default); None if absent."""
        snap = self.snapshot(snapshot_id)
        if snap is None or table not in snap.tables:
            return None
        return spark.read.parquet(os.path.join(self.root, snap.tables[table]))

    # Tables whose scans should partition-prune: frontier by status (rounds
    # read only status=pending; the Iceberg analog is a partition transform)
    DEFAULT_PARTITIONING: dict[str, list[str]] = {"frontier": ["status"]}

    @staticmethod
    def bucket_table(name: str, bucket: int) -> str:
        """Manifest key for one bucket of a bucketed table."""
        return f"{name}#b{bucket}"

    def bucket_tables(self, name: str,
                      snapshot_id: int | None = None) -> dict[int, str]:
        """bucket id → data dir (relative) for a bucketed table at a
        snapshot. Empty when the table has no live buckets."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            return {}
        prefix = f"{name}#b"
        return {
            int(t[len(prefix):]): rel
            for t, rel in snap.tables.items()
            if t.startswith(prefix)
        }

    def read_buckets(
        self,
        spark: SparkSession,
        name: str,
        buckets: list[int] | None = None,
        snapshot_id: int | None = None,
    ) -> DataFrame | None:
        """ONE multi-path parquet scan over a bucketed table's live bucket
        dirs (``buckets=None`` → all; ids with no live dir are skipped —
        an absent bucket is an empty bucket). None when nothing is live.
        The bucket column is a partition dir name, not file data, so the
        result carries the table's schema without it."""
        live = self.bucket_tables(name, snapshot_id)
        if buckets is not None:
            live = {k: rel for k, rel in live.items() if k in set(buckets)}
        if not live:
            return None
        paths = [os.path.join(self.root, rel) for _, rel in sorted(live.items())]
        return spark.read.parquet(*paths)

    def commit(
        self,
        updates: dict[str, DataFrame],
        metadata: dict[str, Any] | None = None,
        tag: str | None = None,
        partition_by: dict[str, list[str]] | None = None,
        drop: list[str] | None = None,
        bucketed: dict[str, tuple[DataFrame, str, list[int]]] | None = None,
    ) -> Snapshot:
        """Atomically commit new versions of ``updates`` tables; tables not
        named carry forward from the parent snapshot unchanged (no rewrite).
        ``partition_by`` (merged over DEFAULT_PARTITIONING) hive-partitions
        a table's files so downstream filters prune whole directories.
        ``drop`` removes tables from the new snapshot's manifest (their data
        dirs stay reachable from older snapshots until expire_orphans) — the
        Iceberg analog is dropping files from the table in the same
        transaction, used by delta compaction (url_seen_r{N} → url_seen).

        ``bucketed`` maps a table name to ``(df, bucket_col, touched)``:
        the df holds the NEW contents of exactly the ``touched`` buckets and
        is written ONCE, hive-partitioned by ``bucket_col``; each touched
        bucket's manifest entry (``name#b{K}``) is repointed at its
        partition subdir — or dropped when the bucket drained empty — while
        every untouched bucket carries forward by reference with zero I/O.
        This is the Iceberg partition-overwrite
        (``writeTo().overwritePartitions()``) analog: per-round write cost
        is O(rows in touched buckets), never O(table)."""
        parts = {**self.DEFAULT_PARTITIONING, **(partition_by or {})}
        parent = self.snapshot()
        new_id = (parent.snapshot_id + 1) if parent else 0
        tables = dict(parent.tables) if parent else {}
        for name in drop or []:
            tables.pop(name, None)
        for name, (df, bcol, touched) in (bucketed or {}).items():
            rel = os.path.join("data", name, f"v{new_id}-{uuid.uuid4().hex[:8]}")
            full = os.path.join(self.root, rel)
            # cluster rows by bucket before the partitioned write: ~1 file
            # per bucket instead of (tasks × buckets) shards
            (df.repartition(max(len(touched), 1), bcol)
             .write.mode("overwrite").partitionBy(bcol).parquet(full))
            written = {
                int(e.split("=", 1)[1])
                for e in os.listdir(full)
                if e.startswith(f"{bcol}=")
            }
            for k in touched:
                key = self.bucket_table(name, k)
                if k in written:
                    tables[key] = os.path.join(rel, f"{bcol}={k}")
                else:
                    tables.pop(key, None)  # bucket drained empty
        for name, df in updates.items():
            rel = os.path.join("data", name, f"v{new_id}-{uuid.uuid4().hex[:8]}")
            writer = df.write.mode("overwrite")
            cols = [c for c in parts.get(name, []) if c in df.columns]
            if cols:
                writer = writer.partitionBy(*cols)
            full = os.path.join(self.root, rel)
            writer.parquet(full)
            if cols and not any(
                e.startswith(f"{cols[0]}=") for e in os.listdir(full)
            ):
                # a zero-row partitioned write leaves no partition dirs and
                # no schema footer → unreadable; re-write a schema-bearing
                # empty file (limit(0) folds to an empty relation — the
                # upstream plan is NOT re-executed)
                df.limit(0).write.mode("overwrite").parquet(full)
            tables[name] = rel
        manifest = {
            "snapshot_id": new_id,
            "parent_id": parent.snapshot_id if parent else None,
            "tables": tables,
            "metadata": {**(metadata or {}), "committed_at": time.time()},
            "tag": tag,
        }
        with open(self._manifest_path(new_id), "w") as f:
            json.dump(manifest, f, indent=1)
        # atomic pointer flip — the commit point
        tmp = self._head_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(new_id))
        os.replace(tmp, self._head_path)
        return self.snapshot(new_id)  # type: ignore[return-value]

    def rollback(self, snapshot_id: int) -> None:
        """Point HEAD at an earlier snapshot (Iceberg rollback_to_snapshot)."""
        if not os.path.exists(self._manifest_path(snapshot_id)):
            raise ValueError(f"no snapshot {snapshot_id}")
        tmp = self._head_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, self._head_path)

    def expire_orphans(self) -> int:
        """GC data dirs unreachable from any manifest (Iceberg
        expire_snapshots/remove_orphan_files analog). Returns dirs removed."""
        live: set[str] = set()
        for s in self.snapshots():
            live.update(s.tables.values())
        removed = 0
        data_root = os.path.join(self.root, "data")
        for table in os.listdir(data_root):
            tdir = os.path.join(data_root, table)
            for v in os.listdir(tdir):
                rel = os.path.join("data", table, v)
                # bucketed manifests reference partition SUBdirs of a
                # version dir (data/t/vN/__b=K) — the version dir is live
                # if any such descendant is
                if rel not in live and not any(
                    l.startswith(rel + os.sep) for l in live
                ):
                    shutil.rmtree(os.path.join(tdir, v), ignore_errors=True)
                    removed += 1
        return removed
