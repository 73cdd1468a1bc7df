"""The bulk-synchronous frontier scheduler — the engine's heart.

Each crawl round (SURVEY.md §7.1), all as one declarative DataFrame plan
committed atomically to the snapshot store:

  1. read ``frontier`` @ HEAD; release stuck leases (reference
     src/queue.ts:232-245)
  2. retry-eligible pending rows (src/queue.ts:132-137)
  3. robots broadcast-join filter + per-host politeness budget with salted
     two-phase ranking (north rule; skew-proof)
  4. claim-order the batch — ``priority DESC, created_at/seq ASC``
     (src/queue.ts:131-137) — capped by the maxPages remainder
     (src/core.ts:169-175)
  5. "fetch" = join the Common-Crawl-style ``pages`` table on url (sandbox
     stand-in for the mapInPandas HTTP stage); misses become retries with
     exponential backoff (src/queue.ts:186-227)
  6. extract title/text with Arrow-batched UDFs (byte-identical parity,
     src/core.ts:32-51)
  7. expand links (DOM order, glob scope, src/core.ts:203-207), anti-join
     the bloom-prefiltered ``url_seen`` set, assign deterministic ``seq``
  8. MERGE the LIVE frontier per hash-bucket (``pmod(url_hash, NB)``):
     ONLY buckets holding a claimed/retry/new/robots-blocked row are
     rewritten — O(touched); untouched buckets carry forward by manifest
     reference (Iceberg ``overwritePartitions`` analog). Append the
     round's ``frontier_done_r{N}`` (terminal transitions, O(batch)),
     ``pages_out_r{N}``, ``url_seen_r{N}``, and ``host_state_r{N}``
     (hosts fetched this round) deltas — never an O(total-history)
     rewrite; deltas compact into base tables every
     ``seen_compact_every`` rounds (with TTL cleanup of old terminal
     rows at compaction); record metrics + per-partition lineage; commit
     ONE snapshot tagged ``round-N`` — the checkpoint a killed run
     resumes from

The crawl ordering produced at small scale is bit-for-bit the sequential
reference semantics (tests/oracle.py); the same plan shapes survive 10^10
rows: no collect() of data (only per-partition counts and single-page seed
lookups), no single-partition windows, anti-joins bloom-prefiltered, skew
salted, and every shuffle keyed on url_hash/host.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import SITEMAP_RE, CrawlConfig
from ..functions import extract
from ..functions.udfs import make_extract_page_udf
from ..operators import bloom
from ..operators.ids import with_url_identity
from ..operators.links import expand_links
from ..operators.ordering import emit_fetch_batch, with_global_seq
from ..operators.politeness import apply_politeness, apply_robots
from ..operators.retry import (
    apply_failures,
    cleanup_terminal,
    eligible_pending,
    release_stuck_claims,
)
from ..state import SnapshotStore

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
ROUND_INTERVAL_S = 60  # > max backoff (5s*2^2=20s), so retries mature next round

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canonical_url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), True),
        StructField("status", StringType(), False),
        StructField("priority", IntegerType(), False),
        StructField("depth", IntegerType(), False),
        StructField("parent_seq", LongType(), True),
        StructField("link_index", IntegerType(), True),
        StructField("seq", LongType(), False),
        StructField("attempts", IntegerType(), False),
        StructField("created_at", TimestampType(), False),
        StructField("next_retry_at", TimestampType(), True),
        StructField("claimed_at", TimestampType(), True),
        StructField("completed_at", TimestampType(), True),
        StructField("error", StringType(), True),
    ]
)

_FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA.fields]

# live-frontier bucket partition column (a directory name in the snapshot
# store, never file data — readers get _FRONTIER_COLS back unchanged)
FRONTIER_BUCKET_COL = "__fb"


def round_ts(round_ix: int) -> datetime:
    """Deterministic round clock (replaces wall-clock now(); reference
    timestamps are ISO strings of Date.now(), src/queue.ts:117)."""
    return EPOCH + timedelta(seconds=round_ix * ROUND_INTERVAL_S)


class CrawlScheduler:
    """One crawl job over one snapshot store (reference: one queue row →
    one ContextCrawlerCore run, src/worker.ts:28-128)."""

    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        config: CrawlConfig,
        pages: DataFrame | None = None,
        n_buckets: int = 32,
        use_bloom: bool = True,
        expected_urls_per_bucket: int = 1 << 14,
        visit_hook=None,
        hook_schema: str | None = None,
        seen_compact_every: int = 8,
        host_delays: DataFrame | None = None,
        fetcher=None,
        frontier_buckets: int = 32,
        frontier_rows_per_bucket: int = 1 << 16,
        trap_hosts: DataFrame | None = None,
        trap_budget: int = 0,
    ):
        # live-fetch alternative to the pages-table join (opt-in;
        # operators/fetch.HttpFetcher): fetcher(batch_df, round_ts) must
        # return the batch rows + (html binary, warc_ts timestamp)
        if pages is None and fetcher is None:
            raise ValueError("provide a pages table or a fetcher")
        self.fetcher = fetcher
        # onVisitPage analog (reference src/schema.ts:18-21; invoked per
        # page src/core.ts:197-199): hook(row)->list[rows] emitting into a
        # separate hook_out table (operators/hooks.py)
        self.visit_hook = visit_hook
        self.hook_schema = hook_schema
        self.spark = spark
        self.store = store
        self.config = config
        # the web stand-in: url -> (html, warc_ts, ...); cached because every
        # round's fetch stage joins it
        self.pages = pages
        self.n_buckets = n_buckets
        self.use_bloom = use_bloom
        self.expected_urls_per_bucket = expected_urls_per_bucket
        self.bloom_dir = f"{store.root}/bloom"
        # compact url_seen deltas back into one base table every K rounds:
        # bounds read fan-in at K dirs while keeping the per-round write
        # O(new URLs) instead of O(total seen)
        self.seen_compact_every = seen_compact_every
        # per-host Crawl-delay overrides (host, crawl_delay_s) — typically
        # functions/robots.robots_tables() output; rows override the global
        # config.host_crawl_delay_s for their host
        self.host_delays = host_delays
        # crawler-trap demotion (operators/politeness.apply_trap_budgets):
        # hosts flagged in trap_hosts (host, trap bool — url_trap_signals
        # output) get trap_budget claims per round instead of the config's
        # politeness_budget; None keeps the plain politeness path
        self.trap_hosts = trap_hosts
        self.trap_budget = trap_budget
        # live-frontier hash buckets (pmod(url_hash, NB)): the per-round
        # MERGE rewrites ONLY buckets containing a touched row; untouched
        # buckets carry forward by manifest reference — write cost is
        # O(touched), not O(backlog), at a 10^10-URL pending frontier.
        # NB SCALES with the backlog (VERDICT r3 #4): a fixed toy NB
        # degenerates O(touched) back to O(backlog) once any round
        # touches most buckets. The sizing rule is
        #   NB = next_pow2(backlog_estimate / frontier_rows_per_bucket),
        # checked each round against the estimate next_seq-fetched_total
        # (an overestimate — growth triggers early, never late); growth
        # re-buckets the live set in that round's commit (O(backlog)
        # once per doubling — amortized O(1)/row) and persists the new NB
        # in the snapshot metadata. The STORED NB always wins over the
        # constructor value: a resuming scheduler must target the same
        # pmod space the store was written with.
        self.frontier_buckets = frontier_buckets
        self.frontier_rows_per_bucket = max(1, frontier_rows_per_bucket)
        self._extract_page = make_extract_page_udf(
            config.selector,
            robots=bool(getattr(config, "honor_meta_robots", False)),
            canonical=bool(getattr(config, "honor_canonical", False)))

    def _nb(self) -> int:
        """Bucket count of the live store: persisted at seed (and bumped
        by re-bucketing); the constructor value only seeds new stores."""
        return int(self.meta.get("frontier_buckets", self.frontier_buckets))

    def _target_nb(self, meta: dict) -> int:
        """NB the backlog currently calls for (power of two, never
        shrinks — shrinking would rewrite the world for no read win)."""
        nb = int(meta.get("frontier_buckets", self.frontier_buckets))
        backlog_est = max(
            0, int(meta.get("next_seq", 0)) - int(meta.get("fetched_total", 0))
        )
        want = nb
        while want * self.frontier_rows_per_bucket < backlog_est \
                and want < (1 << 20):
            want *= 2
        return want

    def _with_fbucket(self, df: DataFrame, nb: int | None = None) -> DataFrame:
        return df.withColumn(
            FRONTIER_BUCKET_COL,
            F.pmod(F.col("url_hash"), F.lit(nb or self._nb())).cast("int"),
        )

    # -- crawl metrics: append-only TABLE, not manifest metadata -----------

    METRICS_SCHEMA = "sid long, round long, payload string"

    def _metrics_tables(self) -> list[str]:
        snap = self.store.snapshot()
        if snap is None:
            return []
        return sorted(
            (t for t in snap.tables if t.startswith("metrics_s")),
            key=lambda t: int(t[len("metrics_s"):]),
        )

    def _metrics_delta(self, row: dict, updates: dict,
                       drop: list[str]) -> None:
        """Stage this commit's one-row metrics delta into ``updates``
        (folding deltas into the ``crawl_metrics`` base on the compaction
        cadence, via ``drop``). Metrics — including per-partition lineage
        — live in an append-only TABLE, not snapshot metadata (VERDICT r3
        #4): the manifest is rewritten whole on EVERY commit, so an
        accumulating metrics list there becomes an O(rounds × partitions)
        JSON blob per commit at 10^4 rounds. Here each commit writes O(1)
        metric rows and the manifest stays O(tables)."""
        import json as _json

        snap = self.store.snapshot()
        sid = (snap.snapshot_id + 1) if snap else 0
        df = self.spark.createDataFrame(
            [(int(sid), int(row.get("round", -1)), _json.dumps(row))],
            self.METRICS_SCHEMA)
        deltas = self._metrics_tables()
        if len(deltas) + 1 >= self.seen_compact_every:
            base = self.store.read(self.spark, "crawl_metrics")
            out = base.unionByName(df) if base is not None else df
            for t in deltas:
                out = out.unionByName(self.store.read(self.spark, t))
            updates["crawl_metrics"] = out
            drop.extend(deltas)
        else:
            updates[f"metrics_s{sid}"] = df

    def metrics(self) -> list[dict]:
        """Per-round metrics history (base ∪ deltas) in commit order."""
        import json as _json

        snap = self.store.snapshot()
        if snap is None:
            return []
        names = (["crawl_metrics"] if "crawl_metrics" in snap.tables
                 else []) + self._metrics_tables()
        rows = []
        for t in names:
            rows.extend(self.store.read(self.spark, t).collect())
        rows.sort(key=lambda r: r["sid"])
        return [_json.loads(r["payload"]) for r in rows]

    def _touched_live(self, touched_ids: list[int], ts_lit):
        """Live rows of the touched buckets, ready for a bucketed MERGE.

        On a pre-bucketing store (monolithic ``frontier`` table, no
        buckets yet) every writer must run the SAME one-time migration
        run_round does: fold the WHOLE legacy table into the merge, mark
        every bucket touched, and have the caller drop ``frontier`` in
        the same atomic commit. Without this, a reseed/blocked-only
        commit would write buckets that shadow the legacy pending rows
        (read_buckets wins once any bucket exists) and the next
        run_round's migration would rebuild all buckets from the legacy
        table alone — discarding the new rows and resurrecting rows this
        commit terminalized.

        Returns ``(live_df, touched_ids, legacy_present)``; the caller
        adds ``"frontier"`` to its commit's ``drop=`` when
        ``legacy_present``."""
        legacy = self.store.read(self.spark, "frontier")
        if legacy is not None:
            return (release_stuck_claims(legacy, ts_lit),
                    list(range(self._nb())), True)
        live = (self.store.read_buckets(self.spark, "frontier", touched_ids)
                or self.spark.createDataFrame([], FRONTIER_SCHEMA))
        return release_stuck_claims(live, ts_lit), touched_ids, False

    # -- state accessors -------------------------------------------------------

    @property
    def meta(self) -> dict[str, Any]:
        snap = self.store.snapshot()
        m = dict(snap.metadata) if snap else {}
        # pre-r4 stores accumulated the metrics history IN the manifest;
        # dropping the key here migrates them — the next commit spreads
        # {**meta} without it and the manifest returns to O(tables)
        m.pop("metrics", None)
        return m

    def live_frontier(self) -> DataFrame | None:
        """Rows still in play (status pending, plus transient claimed) —
        the ONLY table the per-round MERGE rewrites. Terminal rows
        (completed / failed / robots-blocked) append to per-round
        ``frontier_done_r{N}`` deltas instead: at 10^10 crawled URLs the
        terminal history dwarfs the live backlog, and rewriting it every
        round would be the same O(total) step the url_seen deltas removed.
        Stored hash-bucketed (``frontier#b{K}`` manifest entries); reads are
        one multi-path scan. Falls back to a pre-bucketing monolithic
        ``frontier`` table (migrated on the next run_round)."""
        df = self.store.read_buckets(self.spark, "frontier")
        if df is None:
            df = self.store.read(self.spark, "frontier")
        if df is None and self.store.snapshot() is not None:
            # seeded store whose every bucket drained empty (a dropped
            # bucket IS an empty bucket) — an empty frontier, not an
            # unseeded one
            df = self.spark.createDataFrame([], FRONTIER_SCHEMA)
        return df

    def _done_delta_tables(self) -> list[str]:
        snap = self.store.snapshot()
        if snap is None:
            return []
        return sorted(
            (t for t in snap.tables if t.startswith("frontier_done_r")),
            key=lambda t: int(t[len("frontier_done_r"):]),
        )

    def done_frontier(self) -> DataFrame | None:
        """Terminal history at HEAD: compacted base ∪ per-round deltas."""
        snap = self.store.snapshot()
        if snap is None:
            return None
        names = (["frontier_done"] if "frontier_done" in snap.tables else []) + \
            self._done_delta_tables()
        out = None
        for t in names:
            df = self.store.read(self.spark, t)
            out = df if out is None else out.unionByName(df)
        return out

    def reseed_stale(self, max_age_s: float,
                     priority_delta: int = 0) -> int:
        """Recrawl (freshness) scheduling: completed URLs whose LATEST
        fetch is older than ``max_age_s`` on the round clock go back into
        the live frontier as pending — one atomic snapshot commit, write
        cost O(touched buckets) like any round's MERGE.

        Semantics chosen for append-only history: staleness is judged on
        each URL's newest terminal row (older completions of a recrawled
        URL stay in history, as Common Crawl keeps old segments), and rows
        already live are never double-enqueued (left-anti guard). Reading
        the terminal history is O(history) — this is a maintenance pass on
        the compaction cadence, not a per-round step. Returns the number
        of URLs re-enqueued."""
        meta = self.meta
        r = int(meta.get("round", 0))
        ts_lit = F.lit(round_ts(r))
        done = self.done_frontier()
        if done is None:
            return 0
        latest = (
            done.filter(F.col("status") == "completed")
            .groupBy("url_hash").agg(F.max("completed_at").alias("__last"))
        )
        stale = (
            done.filter(F.col("status") == "completed")
            .join(latest, "url_hash")
            .filter(F.col("completed_at") == F.col("__last"))
            .filter(F.col("completed_at")
                    + F.make_interval(secs=F.lit(float(max_age_s))) <= ts_lit)
            .drop("__last")
        )
        live = self.live_frontier()
        if live is not None:
            stale = stale.join(live.select("url_hash"), "url_hash",
                               "left_anti")
        reseeded = (
            stale.select(*_FRONTIER_COLS)
            .withColumn("status", F.lit("pending"))
            .withColumn("priority",
                        (F.col("priority") + priority_delta).cast("int"))
            .withColumn("attempts", F.lit(0))
            .withColumn("created_at", ts_lit)
            .withColumn("next_retry_at", F.lit(None).cast("timestamp"))
            .withColumn("claimed_at", F.lit(None).cast("timestamp"))
            .withColumn("completed_at", F.lit(None).cast("timestamp"))
            .withColumn("error", F.lit(None).cast("string"))
            .select(*_FRONTIER_COLS)
            .persist()
        )
        touched_ids = sorted(
            row["b"]
            for row in reseeded.select(
                F.pmod(F.col("url_hash"), F.lit(self._nb()))
                .cast("int").alias("b")
            ).distinct().collect()
        )
        if not touched_ids:
            reseeded.unpersist()
            return 0
        n = reseeded.count()
        touched_live, touched_ids, legacy = self._touched_live(
            touched_ids, ts_lit)
        next_live = touched_live.select(*_FRONTIER_COLS).unionByName(reseeded)
        updates: dict = {}
        drop: list[str] = ["frontier"] if legacy else []
        self._metrics_delta({"round": r, "reseeded": int(n)}, updates, drop)
        self.store.commit(
            updates,
            drop=drop,
            bucketed={"frontier": (
                self._with_fbucket(next_live), FRONTIER_BUCKET_COL,
                touched_ids)},
            metadata={**meta, "finished": False},
            tag=f"reseed-{r}",
        )
        reseeded.unpersist()
        return int(n)

    def frontier(self) -> DataFrame | None:
        """Full frontier view at HEAD: live ∪ compacted done ∪ done deltas."""
        if self.store.snapshot() is None:
            return None
        out = self.live_frontier()
        done = self.done_frontier()
        if done is not None:
            out = done if out is None else out.unionByName(done)
        return out

    def _seen_delta_tables(self) -> list[str]:
        snap = self.store.snapshot()
        if snap is None:
            return []
        return sorted(
            (t for t in snap.tables if t.startswith("url_seen_r")),
            key=lambda t: int(t[len("url_seen_r"):]),
        )

    def url_seen(self) -> DataFrame | None:
        """Seen set at HEAD = compacted base ∪ per-round deltas.

        Each round commits ONLY its delta (``url_seen_r{N}``, O(new URLs));
        the untouched base and older deltas carry forward by manifest
        reference. At 10^10 seen URLs a full per-round rewrite is the
        engine's one O(total) step — this removes it; ``seen_compact_every``
        bounds read fan-in. Iceberg analog: append-only MERGE + periodic
        rewrite_data_files compaction."""
        snap = self.store.snapshot()
        if snap is None:
            return None
        names = (["url_seen"] if "url_seen" in snap.tables else []) + \
            self._seen_delta_tables()
        out = None
        for t in names:
            df = self.store.read(self.spark, t)
            out = df if out is None else out.unionByName(df)
        return out

    def _host_delta_tables(self) -> list[str]:
        snap = self.store.snapshot()
        if snap is None:
            return []
        return sorted(
            (t for t in snap.tables if t.startswith("host_state_r")),
            key=lambda t: int(t[len("host_state_r"):]),
        )

    def host_state(self) -> DataFrame | None:
        """Per-host crawl state at HEAD: compacted base ∪ per-round deltas,
        folded by host. Each round appends ONLY the hosts it fetched
        (``host_state_r{N}``, O(hosts touched)); at web scale (10^8-10^9
        hosts) a per-round full rewrite would be the same O(total) step the
        url_seen/frontier deltas removed. Deltas compact into the base on
        the ``seen_compact_every`` cadence."""
        snap = self.store.snapshot()
        if snap is None:
            return None
        names = (["host_state"] if "host_state" in snap.tables else []) + \
            self._host_delta_tables()
        out = None
        for t in names:
            df = self.store.read(self.spark, t).select(
                "host", "last_fetch_ts", "fetched", "round")
            out = df if out is None else out.unionByName(df)
        if out is None:
            return None
        return out.groupBy("host").agg(
            F.max("last_fetch_ts").alias("last_fetch_ts"),
            F.sum("fetched").alias("fetched"),
            F.max("round").alias("round"),
        )

    def _read_rounds(self, prefix: str) -> DataFrame | None:
        """All per-round append tables with ``prefix`` as ONE multi-path
        parquet read — a 10^4-round crawl must not build 10^4 Union plan
        nodes (driver-side plan explosion); the reader lists every dir into
        a single scan instead. Requires the tables to be unpartitioned and
        share a schema, which per-round appends do."""
        import os as _os

        snap = self.store.snapshot()
        if snap is None:
            return None
        paths = [
            _os.path.join(self.store.root, rel)
            for t, rel in sorted(snap.tables.items())
            if t.startswith(prefix)
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def pages_out(self) -> DataFrame | None:
        """All per-round page outputs at HEAD (visit order =
        (round, fetch_order)) — one multi-path scan, not a union chain."""
        return self._read_rounds("pages_out_r")

    def hook_out(self) -> DataFrame | None:
        """All per-round visit-hook outputs (pushData analog)."""
        return self._read_rounds("hook_out_r")

    def visit_order(self, max_rows: int = 1_000_000) -> list[str]:
        """Every crawled URL in (round, fetch_order) order — a parity-test
        helper that COLLECTS to the driver. Guarded (r6, VERDICT r5 #7):
        on a big crawl this would be a driver-side copy of the page table;
        raise instead of OOMing, and raise ``max_rows`` explicitly if a
        large collect is really intended."""
        po = self.pages_out()
        if po is None:
            return []
        rows = po.orderBy("round", "fetch_order").select("url") \
            .limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"visit_order() would collect more than {max_rows} URLs to "
                "the driver; this helper is for tests/small crawls — raise "
                "max_rows explicitly if you really want the full list")
        return [r["url"] for r in rows]

    # -- seeding (reference src/core.ts:265-352) -------------------------------

    def _lookup_page_html(self, url: str) -> str | None:
        got = self._lookup_pages_html([url])
        return got.get(url)

    def _lookup_pages_html(self, urls: list[str]) -> dict[str, str]:
        """Seed-time bulk lookup: ALL of ``urls`` resolved in ONE Spark job
        (semi-join against the pages table) — a nested sitemapindex tree
        of hundreds of files costs O(depth) driver-blocking jobs, not
        O(files) (VERDICT r3 #9). Live-fetch mode falls back to
        sequential driver GETs (real HTTP has no batch form here)."""
        if not urls:
            return {}
        if self.pages is None:
            out = {}
            for u in urls:
                t = self.fetcher.fetch_text(u)
                if t is not None:
                    out[u] = t
            return out
        wanted = self.spark.createDataFrame(
            [(u,) for u in urls], "url string")
        rows = (
            self.pages.join(F.broadcast(wanted), "url")
            .select("url", "html").collect()
        )
        out = {}
        for r in rows:
            h = r["html"]
            out[r["url"]] = (
                bytes(h).decode("utf-8", "replace")
                if isinstance(h, (bytes, bytearray)) else h
            )
        return out

    def seed(self, extra_seeds: list[str] | None = None) -> None:
        """Build the round-0 frontier: entry URL, nav-discovered links (DOM
        order, scope-filtered), sitemap expansion — first-wins canonical
        dedup, seq assigned in discovery order (src/core.ts:265,315,335-352).
        """
        cfg = self.config
        seeds: list[str] = [cfg.entry] + list(extra_seeds or [])
        if cfg.auto_discover_nav:
            html = self._lookup_page_html(cfg.entry)
            if html:
                for u in extract.discover_nav_urls(html, cfg.entry, cfg.discovery_selector):
                    if cfg.in_scope(u):
                        seeds.append(u)
        expanded = extract.expand_sitemap_seeds(
            seeds,
            fetch=self._lookup_page_html,
            in_scope=cfg.in_scope,
            is_sitemap=lambda u: bool(SITEMAP_RE.search(u.split("?")[0])),
            fetch_many=self._lookup_pages_html,  # one Spark job per LEVEL
        )

        t0 = round_ts(0)
        rows = [(u, i) for i, u in enumerate(expanded)]
        df = self.spark.createDataFrame(rows, "url string, discovery_ix long")
        df = with_url_identity(df)
        # first-wins canonical dedup in discovery order (RequestQueue parity)
        first = df.groupBy("url_hash").agg(F.min("discovery_ix").alias("discovery_ix"))
        df = df.join(first, on=["url_hash", "discovery_ix"], how="inner")
        df = with_global_seq(df, [F.col("discovery_ix").asc()], seq_col="seq", start=0)
        frontier = df.select(
            "url", "canonical_url", "url_hash", "host",
            F.lit("pending").alias("status"),
            F.lit(cfg.priority).alias("priority"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("long").alias("parent_seq"),
            F.lit(None).cast("int").alias("link_index"),
            "seq",
            F.lit(0).alias("attempts"),
            F.lit(t0).alias("created_at"),
            F.lit(None).cast("timestamp").alias("next_retry_at"),
            F.lit(None).cast("timestamp").alias("claimed_at"),
            F.lit(None).cast("timestamp").alias("completed_at"),
            F.lit(None).cast("string").alias("error"),
        )
        seen = frontier.select("url_hash", "canonical_url").withColumn(
            "first_seen_round", F.lit(0)
        )
        n_seeds = frontier.count()
        if self.use_bloom:
            bloom_meta = bloom.build_bloom_shards(
                seen, self.bloom_dir, self.n_buckets,
                self.expected_urls_per_bucket,
            )
        else:
            bloom_meta = None
        self.store.commit(
            {"url_seen_r0": seen},
            bucketed={"frontier": (
                self._with_fbucket(frontier), FRONTIER_BUCKET_COL,
                list(range(self.frontier_buckets)))},
            metadata={
                "round": 0,
                "next_seq": int(n_seeds),
                "fetched_total": 0,
                "finished": False,
                "bloom": bloom_meta,
                "config": cfg.to_dict(),
                "frontier_buckets": int(self.frontier_buckets),
            },
            tag="seed",
        )

    # -- one BSP round ----------------------------------------------------------

    def run_round(self, robots: DataFrame | None = None) -> dict[str, Any]:
        """Execute one crawl round; returns the round's metrics dict."""
        meta = self.meta
        r = int(meta["round"]) + 1
        ts = round_ts(r)
        ts_lit = F.lit(ts)
        cfg = self.config

        live = self.live_frontier()
        if live is None:  # fully drained (every bucket empty)
            return self._finish(meta, r, reason="frontier_empty")
        frontier = release_stuck_claims(live, ts_lit)
        eligible = eligible_pending(frontier, ts_lit)
        if cfg.max_depth is not None:
            eligible = eligible.filter(F.col("depth") <= cfg.max_depth)
        if cfg.host_crawl_delay_s or self.host_delays is not None:
            # host_state gates eligibility (north rule: per-host last-fetch
            # timestamps joined in): a host fetched less than its crawl
            # delay ago sits this round out. Per-host robots Crawl-delay
            # rows override the global config value. host_state and the
            # delay table are one row per host → broadcast.
            hs = self.host_state()
            if hs is not None:
                gate = hs.select(F.col("host").alias("__gh"),
                                 F.col("last_fetch_ts").alias("__lft"))
                if self.host_delays is not None:
                    gate = gate.join(
                        self.host_delays.select(
                            F.col("host").alias("__gh"),
                            F.col("crawl_delay_s").alias("__delay")),
                        on="__gh", how="left",
                    )
                else:
                    gate = gate.withColumn("__delay", F.lit(None).cast("double"))
                delay_s = F.coalesce(
                    F.col("__delay"),
                    F.lit(float(cfg.host_crawl_delay_s or 0)),
                )
                eligible = (
                    eligible.join(F.broadcast(gate),
                                  eligible["host"] == F.col("__gh"), "left")
                    .filter(
                        F.col("__lft").isNull()
                        | (F.col("__lft") + F.make_interval(secs=delay_s)
                           <= ts_lit)
                    )
                    .drop("__gh", "__lft", "__delay")
                )
        if cfg.respect_robots and robots is not None:
            allowed = apply_robots(eligible, robots)
            # persisted: consumed by the done-delta append, the live-merge
            # anti-join, AND the touched-bucket calc — each would otherwise
            # recompute the whole eligibility+robots plan
            robots_blocked = eligible.join(
                allowed.select("url_hash"), "url_hash", "left_anti"
            ).withColumn("status", F.lit("failed")).withColumn(
                "error", F.lit("robots_disallowed")
            ).persist()
            eligible = allowed
        else:
            robots_blocked = None

        if self.trap_hosts is not None:
            from ..operators.politeness import apply_trap_budgets

            polite = apply_trap_budgets(
                eligible, self.trap_hosts, self.trap_budget,
                budget_per_host=cfg.politeness_budget)
        else:
            polite = apply_politeness(eligible, cfg.politeness_budget)
        remaining = None
        if cfg.max_pages is not None:
            remaining = cfg.max_pages - int(meta["fetched_total"])
            if remaining <= 0:
                return self._finish(meta, r, reason="max_pages")
        batch = emit_fetch_batch(polite, remaining).persist()
        n_batch = batch.count()
        if n_batch == 0:
            batch.unpersist()
            if robots_blocked is not None:
                # liveness: a round whose ELIGIBLE set is entirely robots-
                # blocked must still commit those terminal transitions —
                # otherwise the blocked rows stay pending forever and the
                # crawl idles to max_rounds instead of finishing
                n_blocked = robots_blocked.count()
                if n_blocked > 0:
                    m = self._commit_blocked_only(meta, r, ts_lit,
                                                  robots_blocked)
                    robots_blocked.unpersist()
                    return m
                robots_blocked.unpersist()
            n_pending = frontier.filter(F.col("status") == "pending").count()
            if n_pending > 0:
                # nothing eligible THIS round (crawl-delay gate or immature
                # retries) but work remains → commit ONE idle round fast-
                # forwarded to the earliest future eligibility instant,
                # instead of one no-op snapshot per wall-clock interval
                r_idle = self._fast_forward_round(r, ts)
                metrics = {"round": r_idle, "claimed": 0, "fetched": 0,
                           "idle": True, "pending": int(n_pending)}
                updates: dict = {}
                drop: list[str] = []
                self._metrics_delta(metrics, updates, drop)
                self.store.commit(
                    updates, drop=drop,
                    metadata={**meta, "round": r_idle},
                    tag=f"round-{r_idle}-idle",
                )
                return metrics
            return self._finish(meta, r, reason="frontier_empty")

        # fetch stage: real HTTP (opt-in HttpFetcher) or the default left
        # join against the web stand-in (pages table); both emit the batch
        # rows + (html, warc_ts) with NULL html as a retryable miss
        claimed = batch.withColumn("attempts", F.col("attempts") + 1)
        if self.fetcher is not None:
            fetched_raw = self.fetcher(claimed, ts).persist()
        else:
            fetched_raw = (
                claimed.join(
                    self.pages.select(
                        F.col("url").alias("__page_url"), "html", "warc_ts"
                    ),
                    F.col("url") == F.col("__page_url"),
                    "left",
                )
                .drop("__page_url")
                .persist()
            )
        missed = fetched_raw.filter(F.col("html").isNull()).select(*_FRONTIER_COLS)
        # fused extraction: title + text + links from ONE DOM parse per page
        fetched = (
            fetched_raw.filter(F.col("html").isNotNull())
            .withColumn("__page", self._extract_page(F.col("html"), F.col("url")))
            .persist()
        )

        # page-level robots directives (opt-in, config.honor_meta_robots):
        # noindex -> fetched + links expanded, but NOT emitted to the
        # dataset; nofollow -> emitted, but links NOT expanded; 'none'
        # implies both. With the flag off both sources stay `fetched`
        # and the plan is byte-identical to the parity-tested one.
        emit_src = follow_src = fetched
        if getattr(cfg, "honor_meta_robots", False):
            toks = F.split(F.coalesce(F.col("__page.robots"), F.lit("")), ",")
            noindex = F.array_contains(toks, "noindex") | \
                F.array_contains(toks, "none")
            nofollow = F.array_contains(toks, "nofollow") | \
                F.array_contains(toks, "none")
            emit_src = fetched.filter(~noindex)
            follow_src = fetched.filter(~nofollow)
        # rel=canonical identity (opt-in, config.honor_canonical; RFC 6596,
        # operators/links.canonical_dedup_key semantics in the loop): a page
        # declaring a valid absolute canonical to a DIFFERENT canonical
        # identity is a self-confessed duplicate — suppress its dataset
        # emit and enqueue the preferred TARGET in its place (prepended to
        # the page's link array at link_index -1, so it rides the whole
        # candidate pipeline: scope filter, outlink cap, first-wins dedup,
        # url-seen anti-join — and sorts before the page's own links in
        # discovery order). The duplicate's own links still expand; a
        # nofollow duplicate suppresses the target too (nofollow = "follow
        # nothing from this page"). Off (default), the plan is unchanged.
        links_col = "__page.links"
        if getattr(cfg, "honor_canonical", False):
            from ..functions.udfs import LINK_TYPE, canonicalize_url_udf

            hint = F.col("__page.canonical")
            hint_canon = canonicalize_url_udf(hint)
            is_dup = (
                hint.isNotNull() & hint.rlike(r"^https?://")
                & hint_canon.isNotNull()
                & (hint_canon != F.col("canonical_url"))
            )
            emit_src = emit_src.filter(~is_dup)
            # coalesce keeps href NOT NULL so the array element type casts
            # exactly to LINK_TYPE (the branch only fires on non-null hints)
            target = F.array(F.struct(
                F.coalesce(hint, F.lit("")).alias("href"),
                F.lit(-1).cast("int").alias("link_index"),
                F.lit(False).alias("is_nav"),
            )).cast(LINK_TYPE)
            follow_src = follow_src.withColumn(
                "__links_aug",
                F.when(is_dup, F.concat(target, F.col("__page.links")))
                .otherwise(F.col("__page.links")))
            links_col = "__links_aug"

        pages_out = emit_src.select(
            F.lit(cfg.name).alias("job"),
            "url", "canonical_url", "url_hash", "host", "depth", "seq",
            F.col("__page.title").alias("title"),
            F.col("__page.text").alias("text"),
            F.lit(r).alias("round"),
            "fetch_order",
            "warc_ts",
            F.col("__page.n_tokens").alias("n_tokens"),
        ).persist()
        # ONE job yields both the per-partition lineage and n_emitted
        lineage = [
            {"partition": int(row["pid"]), "rows": int(row["cnt"])}
            for row in pages_out.groupBy(
                F.spark_partition_id().alias("pid")
            ).agg(F.count("*").alias("cnt")).collect()
        ]
        n_emitted = sum(e["rows"] for e in lineage)
        # with meta-robots off (the default), emitted == fetched and no
        # extra job runs; on, fetched must count the noindex pages too
        # (they WERE fetched — counting them as misses would poison the
        # retry metrics and the host_state fetch tallies)
        n_fetched = n_emitted if emit_src is fetched else fetched.count()

        hook_out = None
        if self.visit_hook is not None and n_fetched > 0:
            from ..operators.hooks import apply_visit_hook

            hook_out = apply_visit_hook(
                fetched.select(
                    "url", "canonical_url", "host", "depth", "seq", "html",
                    F.col("__page.title").alias("title"),
                    F.col("__page.text").alias("text"),
                ),
                self.visit_hook,
                self.hook_schema,
            )

        # link expansion → new frontier rows
        candidates = expand_links(follow_src, cfg, links_col=links_col)
        if cfg.max_depth is not None:
            candidates = candidates.filter(F.col("depth") <= cfg.max_depth)
        seen = self.url_seen()
        bloom_meta = meta.get("bloom") if self.use_bloom else None
        new_links = bloom.anti_join_seen(
            candidates, seen,
            shards_dir=self.bloom_dir if bloom_meta else None,
            bloom_meta=bloom_meta,
        )
        seq_counts: dict = {}
        new_links = with_global_seq(
            new_links,
            [F.col("parent_seq").asc(), F.col("link_index").asc()],
            seq_col="seq",
            start=int(meta["next_seq"]),
            counts_out=seq_counts,  # n_new for free — no extra count() pass
        ).persist()
        n_new = seq_counts["total"]

        new_frontier_rows = new_links.select(
            "url", "canonical_url", "url_hash", "host",
            F.lit("pending").alias("status"),
            F.col("priority").cast("int"),
            F.col("depth").cast("int"),
            "parent_seq",
            "link_index",
            "seq",
            F.lit(0).alias("attempts"),
            ts_lit.alias("created_at"),
            F.lit(None).cast("timestamp").alias("next_retry_at"),
            F.lit(None).cast("timestamp").alias("claimed_at"),
            F.lit(None).cast("timestamp").alias("completed_at"),
            F.lit(None).cast("string").alias("error"),
        )

        # frontier MERGE, live/terminal split: the LIVE table carries only
        # rows that can still be claimed (pending retries, untouched,
        # new links) — O(backlog) per round; terminal transitions
        # (completed / terminal-failed / robots-blocked) append to this
        # round's frontier_done delta — O(batch), never O(history)
        completed = fetched.select(*_FRONTIER_COLS).withColumn(
            "status", F.lit("completed")
        ).withColumn("claimed_at", ts_lit).withColumn("completed_at", ts_lit)
        failed = apply_failures(
            missed.withColumn("error", F.lit("fetch_miss")),
            ts_lit, cfg.backoff_ms, cfg.max_attempts,
        ).withColumn("claimed_at", ts_lit)
        failed_retry = failed.filter(F.col("status") == "pending")
        # terminal rows need completed_at stamped (= this round's clock):
        # cleanup_terminal's TTL keys on it, so a NULL here would make
        # failed/robots-blocked history immortal on failure-heavy crawls
        failed_terminal = failed.filter(F.col("status") == "failed").withColumn(
            "completed_at", ts_lit
        )
        # which buckets changed: claimed rows (→ done/retry), robots-blocked
        # removals, newly discovered links. A ≤frontier_buckets metadata
        # collect — untouched buckets are never read OR written below.
        touched_keys = batch.select("url_hash")
        if robots_blocked is not None:
            touched_keys = touched_keys.unionByName(
                robots_blocked.select("url_hash"))
        touched_keys = touched_keys.unionByName(new_links.select("url_hash"))
        cur_nb = self._nb()
        nb = self._target_nb(meta)
        if nb > cur_nb:
            # the backlog outgrew the bucket fan-out: re-bucket the WHOLE
            # live set in this round's commit (read all buckets once,
            # write all of the new pmod space) — O(backlog) once per
            # doubling, amortized O(1)/row; NB persists in metadata below
            touched_live, _, legacy = self._touched_live(
                list(range(cur_nb)), ts_lit)
            touched_ids = list(range(nb))
        else:
            nb = cur_nb
            touched_ids = sorted(
                row["b"]
                for row in touched_keys.select(
                    F.pmod(F.col("url_hash"), F.lit(cur_nb))
                    .cast("int").alias("b")
                ).distinct().collect()
            )
            # one-time migration of a pre-bucketing store (monolithic live
            # table → buckets, dropped in this commit) is _touched_live's
            touched_live, touched_ids, legacy = self._touched_live(
                touched_ids, ts_lit)
        untouched = touched_live.join(
            batch.select("url_hash"), "url_hash", "left_anti")
        if robots_blocked is not None:
            untouched = untouched.join(
                robots_blocked.select("url_hash"), "url_hash", "left_anti"
            )
        next_live = (
            untouched.select(*_FRONTIER_COLS)
            .unionByName(failed_retry.select(*_FRONTIER_COLS))
            .unionByName(new_frontier_rows.select(*_FRONTIER_COLS))
        )
        done_delta = completed.select(*_FRONTIER_COLS).unionByName(
            failed_terminal.select(*_FRONTIER_COLS)
        )
        if robots_blocked is not None:
            done_delta = done_delta.unionByName(
                robots_blocked.select(*_FRONTIER_COLS)
                .withColumn("completed_at", ts_lit)
            )

        new_seen = new_links.select("url_hash", "canonical_url").withColumn(
            "first_seen_round", F.lit(r)
        )
        if self.use_bloom and n_new > 0 and bloom_meta:
            # Bloom capacity scales with the SAME backlog estimator that
            # drives NB (VERDICT r4 #8): fixed-size bitmaps saturate as the
            # seen set grows (fpp degrades exponentially in keys/bit).
            # next_seq counts every URL ever admitted == |url_seen|, an
            # exact load figure. On overflow, double expected_per_bucket
            # until it fits and REBUILD every shard from the full seen set
            # at the original bits_per_key — O(seen) once per doubling,
            # amortized O(1)/URL, the NB re-bucketing argument — keeping
            # the designed ~0.4% fpp bounded through growth. The shards'
            # own persisted sizing (bloom_meta) wins over the constructor
            # value so a resumed scheduler merges at the right m_bits.
            exp = int(bloom_meta.get("expected_per_bucket",
                                     self.expected_urls_per_bucket))
            seen_total = int(meta["next_seq"]) + n_new
            if seen_total > self.n_buckets * exp:
                while self.n_buckets * exp < seen_total:
                    exp *= 2
                full_seen = (seen.unionByName(new_seen)
                             if seen is not None else new_seen)
                bloom_meta = bloom.build_bloom_shards(
                    full_seen, self.bloom_dir, self.n_buckets, exp,
                )
            else:
                bloom.build_bloom_shards(
                    new_seen, self.bloom_dir, self.n_buckets, exp,
                    merge_existing=True,
                )

        # host_state delta (per-host last fetch + totals): append ONLY the
        # hosts fetched this round — O(hosts touched), never O(all hosts).
        # last_fetch_ts is the ROUND clock (fetch time), not the page's
        # warc_ts — it gates the crawl-delay eligibility join above.
        # Built from `fetched` (ALL successfully fetched rows), NOT the
        # noindex-filtered `pages_out` emit set: a request to a host is a
        # politeness event whether or not the page is emitted, so with
        # honor_meta_robots on, a host whose round was all-noindex must
        # still advance last_fetch_ts and count in the fetch tallies.
        host_delta = (
            fetched.groupBy("host")
            .agg(F.count("*").alias("fetched"))
            .withColumn("last_fetch_ts", ts_lit)
            .withColumn("round", F.lit(r))
            .select("host", "last_fetch_ts", "fetched", "round")
        )
        n_candidates = candidates.count()
        metrics = {
            "round": r,
            "claimed": int(n_batch),
            "fetched": int(n_fetched),
            "emitted": int(n_emitted),
            "fetch_misses": int(n_batch - n_fetched),
            "candidates": int(n_candidates),
            "new_urls": int(n_new),
            "deduped": int(n_candidates - n_new),
            "lineage": lineage,
        }
        if bloom_meta:
            metrics["bloom_shard_bytes"] = int(
                bloom_meta.get("shard_bytes_total", 0))
        updates = {
            f"frontier_done_r{r}": done_delta,
            f"pages_out_r{r}": pages_out,
        }
        # host_state: delta commit when hosts were fetched; fold base +
        # deltas into one base table on the compaction cadence
        host_deltas = self._host_delta_tables()
        host_drop: list[str] = []
        if n_fetched > 0:
            if len(host_deltas) + 1 >= self.seen_compact_every:
                prev = self.host_state()
                folded = (
                    prev.unionByName(host_delta).groupBy("host").agg(
                        F.max("last_fetch_ts").alias("last_fetch_ts"),
                        F.sum("fetched").alias("fetched"),
                        F.max("round").alias("round"),
                    ) if prev is not None else host_delta
                )
                updates["host_state"] = folded
                host_drop = host_deltas
            else:
                updates[f"host_state_r{r}"] = host_delta
        # url_seen: delta commit (O(new URLs)); every seen_compact_every
        # deltas, fold base + deltas + this round into one base table and
        # drop the deltas in the SAME atomic commit
        drop: list[str] = []
        deltas = self._seen_delta_tables()
        if n_new > 0 and len(deltas) + 1 >= self.seen_compact_every:
            base = seen.unionByName(new_seen) if seen is not None else new_seen
            updates["url_seen"] = base
            drop = deltas
        elif n_new > 0:
            updates[f"url_seen_r{r}"] = new_seen
        # frontier_done compaction on the same cadence (TTL cleanup of old
        # terminal rows — reference clearCompleted — applies here, at the
        # only point the history is rewritten anyway)
        done_deltas = self._done_delta_tables()
        if len(done_deltas) + 1 >= self.seen_compact_every:
            done_base = self.store.read(self.spark, "frontier_done")
            for t in done_deltas:
                d = self.store.read(self.spark, t)
                done_base = d if done_base is None else done_base.unionByName(d)
            done_base = done_base.unionByName(done_delta)
            updates["frontier_done"] = cleanup_terminal(done_base, ts_lit)
            updates.pop(f"frontier_done_r{r}")
            drop = drop + done_deltas
        if hook_out is not None:
            updates[f"hook_out_r{r}"] = hook_out
        drop = drop + host_drop + (["frontier"] if legacy else [])
        self._metrics_delta(metrics, updates, drop)
        self.store.commit(
            updates,
            drop=drop,
            bucketed={"frontier": (
                self._with_fbucket(next_live, nb), FRONTIER_BUCKET_COL,
                touched_ids)},
            partition_by={f"frontier_done_r{r}": ["status"],
                          "frontier_done": ["status"]},
            metadata={
                **meta,
                "round": r,
                "next_seq": int(meta["next_seq"]) + n_new,
                "fetched_total": int(meta["fetched_total"]) + n_fetched,
                "finished": False,
                "frontier_buckets": int(nb),
                # persists capacity doublings; unchanged rounds rewrite
                # the same dict (meta carries it forward anyway)
                **({"bloom": bloom_meta} if bloom_meta else {}),
            },
            tag=f"round-{r}",
        )
        for df in (batch, fetched_raw, fetched, pages_out, new_links):
            df.unpersist()
        if robots_blocked is not None:
            robots_blocked.unpersist()
        return metrics

    def _commit_blocked_only(self, meta: dict, r: int, ts_lit,
                             robots_blocked: DataFrame) -> dict[str, Any]:
        """Commit a round that fetched nothing but must terminalize
        robots-blocked rows: append them to the round's done delta and
        drop them from their (touched) live buckets."""
        touched_ids = sorted(
            row["b"]
            for row in robots_blocked.select(
                F.pmod(F.col("url_hash"), F.lit(self._nb()))
                .cast("int").alias("b")
            ).distinct().collect()
        )
        touched_live, touched_ids, legacy = self._touched_live(
            touched_ids, ts_lit)
        next_live = touched_live.select(*_FRONTIER_COLS).join(
            robots_blocked.select("url_hash"), "url_hash", "left_anti"
        ).select(*_FRONTIER_COLS)
        done_delta = (
            robots_blocked.select(*_FRONTIER_COLS)
            .withColumn("completed_at", ts_lit)
        )
        n_blocked = done_delta.count()
        metrics = {"round": r, "claimed": 0, "fetched": 0,
                   "robots_blocked": int(n_blocked)}
        updates: dict = {f"frontier_done_r{r}": done_delta}
        drop: list[str] = ["frontier"] if legacy else []
        self._metrics_delta(metrics, updates, drop)
        self.store.commit(
            updates,
            drop=drop,
            bucketed={"frontier": (
                self._with_fbucket(next_live), FRONTIER_BUCKET_COL,
                touched_ids)},
            partition_by={f"frontier_done_r{r}": ["status"]},
            metadata={**meta, "round": r, "finished": False},
            tag=f"round-{r}",
        )
        return metrics

    def _fast_forward_round(self, r: int, ts) -> int:
        """Smallest round index ≥ r whose clock reaches the earliest future
        eligibility instant (min over pending retries' next_retry_at and
        gated hosts' last_fetch_ts + crawl delay). Returns the round to
        RECORD (the next executed round is that + 1)."""
        import math

        frontier = self.live_frontier()
        instants = []
        row = (
            frontier.filter(
                (F.col("status") == "pending") & F.col("next_retry_at").isNotNull()
            ).agg(F.min("next_retry_at")).collect()[0][0]
        )
        if row is not None:
            instants.append(row)
        if self.config.host_crawl_delay_s or self.host_delays is not None:
            hs = self.host_state()
            if hs is not None:
                gated_hosts = (
                    frontier.filter(F.col("status") == "pending")
                    .select("host").distinct()
                    .join(hs.select("host", "last_fetch_ts"), "host")
                )
                if self.host_delays is not None:
                    gated_hosts = gated_hosts.join(
                        self.host_delays, on="host", how="left")
                else:
                    gated_hosts = gated_hosts.withColumn(
                        "crawl_delay_s", F.lit(None).cast("double"))
                delay_s = F.coalesce(
                    F.col("crawl_delay_s"),
                    F.lit(float(self.config.host_crawl_delay_s or 0)),
                )
                gated = (
                    gated_hosts
                    .select((F.col("last_fetch_ts")
                             + F.make_interval(secs=delay_s)).alias("__elig"))
                    .agg(F.min("__elig")).collect()[0][0]
                )
                if gated is not None:
                    instants.append(gated)
        if not instants:
            return r
        # collected timestamps come back session-TZ-naive (UTC values)
        target = min(
            t.replace(tzinfo=timezone.utc) if t.tzinfo is None else t
            for t in instants
        )
        # next executed round r'+1 must satisfy round_ts(r'+1) >= target
        need = math.ceil((target - EPOCH).total_seconds() / ROUND_INTERVAL_S)
        return max(r, need - 1)

    def _finish(self, meta: dict, r: int, reason: str) -> dict[str, Any]:
        metrics = {"round": r, "claimed": 0, "fetched": 0, "finished": reason}
        updates: dict = {}
        drop: list[str] = []
        self._metrics_delta(metrics, updates, drop)
        self.store.commit(
            updates, drop=drop,
            metadata={**meta, "round": r, "finished": True,
                      "finish_reason": reason},
            tag=f"round-{r}-final",
        )
        return metrics

    # -- the driver loop ---------------------------------------------------------

    def run(
        self,
        max_rounds: int = 1000,
        robots: DataFrame | None = None,
        extra_seeds: list[str] | None = None,
    ) -> dict[str, Any]:
        """Seed if fresh, then loop rounds until the frontier drains or a
        budget hits. Safe to call on a killed run's store — resumes from the
        last committed snapshot (north-rule resumability)."""
        if self.store.head_id() is None:
            self.seed(extra_seeds=extra_seeds)
        for _ in range(max_rounds):
            if self.meta.get("finished"):
                break
            m = self.run_round(robots=robots)
            if m.get("finished"):
                break
        return self.meta
