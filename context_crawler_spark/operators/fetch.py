"""Real HTTP fetch stage — the reference's live requestHandler
(reference src/core.ts:164-262) as a politeness-aware ``mapInPandas``
operator over the claimed batch.

GUARDED: network access is strictly opt-in. The engine's default fetch
stage is the pages-table join (plans/scheduler.py); an ``HttpFetcher`` runs
only when the caller constructs one and passes it to
``CrawlScheduler(fetcher=...)``. Pure stdlib ``urllib`` — no new deps.

Spark shape (why this scales):
  * the batch repartitions by ``host`` and sorts within partitions by
    (host, seq), so ONE task owns each host's requests for the round and
    issues them in claim order — the distributed analog of the reference's
    per-job maxConcurrency=2 browser (src/core.ts:214): politeness is a
    per-host serialization, so hash-partitioning on host parallelizes
    across hosts while keeping each host sequential
  * the per-host crawl delay (broadcast-joined ``__delay`` column from
    robots Crawl-delay rows, else the config default) is slept between
    same-host requests inside the task; cross-round spacing is already
    enforced by the scheduler's host_state gate
  * failures (timeouts, HTTP errors, refused connections) keep ``html``
    NULL — the miss flows into the scheduler's existing retry/backoff
    machinery (src/queue.ts:186-227) with no new code path
  * config honored (reference src/schema.ts:80-96): ``cookie`` → Cookie
    header (consent banners, src/core.ts:167-180);
    ``wait_for_selector_timeout`` → socket timeout;
    ``resource_exclusions`` → pre-fetch extension skip (the request-block
    list the reference installs at src/core.ts:243-250)
  * ``warc_ts`` is stamped with the ROUND clock passed by the scheduler,
    keeping pages_out deterministic and consistent with host_state
"""

from __future__ import annotations

import re
import time
from datetime import datetime
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_USER_AGENT = "contextcrawler"
DEFAULT_TIMEOUT_S = 10.0
DEFAULT_MAX_BYTES = 8 * 1024 * 1024  # cap pathological responses


def _cookie_header(cookie) -> str | None:
    """config.cookie ({name,value} or a list of them) → one Cookie header."""
    if not cookie:
        return None
    items = cookie if isinstance(cookie, list) else [cookie]
    return "; ".join(f"{c['name']}={c['value']}" for c in items)


def _exclusion_regex(resource_exclusions) -> str | None:
    """Extension skip-list → an anchored path regex (case-insensitive)."""
    if not resource_exclusions:
        return None
    exts = "|".join(re.escape(e.lstrip(".")) for e in resource_exclusions)
    return rf"(?i)\.({exts})([?#].*)?$"


MAX_REDIRECTS = 5


def fetch_url(
    url: str,
    headers: dict[str, str],
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_bytes: int = DEFAULT_MAX_BYTES,
    allow_hosts: set[str] | None = None,
    truncate_oversized: bool = False,
) -> tuple[int, bytes | None]:
    """One guarded GET: (status, body) on 2xx, (status-or-0, None) on any
    failure. http/https only. Shared by the executor loop and the driver's
    seed-time lookup.

    ``truncate_oversized=True`` returns the first ``max_bytes`` of an
    oversized 2xx body instead of a miss — the RFC 9309 §2.5 robots.txt
    contract ("crawlers SHOULD parse at least the first 500 KiB"); page
    fetches keep the default miss-on-oversize (a truncated page would
    extract wrong text silently).

    Redirects are followed MANUALLY (urllib's transparent follower is
    disabled): scope, robots, the allowlist, and the per-host politeness
    delay were all evaluated against the ORIGINAL URL, so a hop that
    leaves its hostname would fetch — and attribute to that host —
    content from a host that may be allowlisted-out, robots-blocked, or
    rate-gated differently (ADVICE r3). Same-host hops (the common
    http→https / trailing-slash cases) are followed up to
    ``MAX_REDIRECTS``; any cross-host or non-http hop is a miss."""
    import urllib.error
    import urllib.request
    from urllib.parse import urljoin, urlsplit

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):  # 3xx → HTTPError, not follow
            return None

    if not url.startswith(("http://", "https://")):
        return 0, None
    origin_host = urlsplit(url).hostname
    if allow_hosts is not None and origin_host not in allow_hosts:
        return 0, None
    opener = urllib.request.build_opener(_NoRedirect())
    cur = url
    for _ in range(MAX_REDIRECTS + 1):
        req = urllib.request.Request(cur, headers=headers)
        try:
            with opener.open(req, timeout=timeout_s) as resp:
                status = getattr(resp, "status", 200)
                body = resp.read(max_bytes + 1)
                if len(body) > max_bytes:
                    if truncate_oversized:
                        return status, body[:max_bytes]
                    return status, None  # oversized: miss (retryable)
                return status, body
        except urllib.error.HTTPError as e:
            if e.code in (301, 302, 303, 307, 308):
                loc = e.headers.get("Location")
                nxt = urljoin(cur, loc) if loc else None
                hop = urlsplit(nxt) if nxt else None
                if (
                    hop is None
                    or hop.scheme not in ("http", "https")
                    or hop.hostname != origin_host
                ):
                    return e.code, None  # off-origin redirect == miss
                cur = nxt
                continue
            return e.code, None
        except Exception:  # noqa: BLE001 — network failure == retryable miss
            return 0, None
    return 0, None  # redirect loop exhausted


class HttpFetcher:
    """The live fetch stage. Construct explicitly (network opt-in) and pass
    as ``CrawlScheduler(fetcher=...)``; it replaces the pages-table join
    with real GETs while every other plan stage (claim order, robots,
    politeness budget, retries, extraction, link expansion) is unchanged —
    a parity test drives both paths over the same site and asserts
    identical visit order and extracted text (tests/test_fetch.py)."""

    def __init__(
        self,
        config,
        host_delays: DataFrame | None = None,
        user_agent: str = DEFAULT_USER_AGENT,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        max_bytes: int = DEFAULT_MAX_BYTES,
        allow_hosts: set[str] | None = None,
        render=None,
    ):
        self.headers = {"User-Agent": user_agent}
        ck = _cookie_header(getattr(config, "cookie", None))
        if ck:
            self.headers["Cookie"] = ck
        wst = getattr(config, "wait_for_selector_timeout", None)
        self.timeout_s = (wst / 1000.0) if wst else timeout_s
        self.max_bytes = max_bytes
        self.exclusion_re = _exclusion_regex(
            getattr(config, "resource_exclusions", None))
        self.default_delay_s = float(getattr(config, "host_crawl_delay_s", None)
                                     or 0.0)
        self.host_delays = host_delays
        # optional allowlist (tests pin it to the local server) — a plain
        # safety rail, not part of crawl semantics
        self.allow_hosts = allow_hosts
        # THE RENDER SEAM (VERDICT r3): the reference navigates a real
        # browser and extracts from the RENDERED DOM after waiting for the
        # selector (reference src/core.ts:133-148, 164-262); a static GET
        # sees an SPA's empty shell. ``render(url, body) -> bytes`` runs
        # per successful response INSIDE the fetch task, before the body
        # reaches extraction/link expansion — a browser-pool adapter (e.g.
        # one Playwright page pool per executor) drops in here without
        # touching the scheduler. Must be picklable (ships to executors);
        # a raising renderer turns that page into a retryable miss.
        self.render = render

    # -- driver-side single fetch (seed-time nav/sitemap discovery) ---------

    def fetch_text(self, url: str) -> str | None:
        if self.allow_hosts is not None:
            from urllib.parse import urlsplit

            if urlsplit(url).hostname not in self.allow_hosts:
                return None
        _, body = fetch_url(url, self.headers, self.timeout_s, self.max_bytes)
        return body.decode("utf-8", "replace") if body is not None else None

    # -- the distributed batch stage ----------------------------------------

    def __call__(self, batch: DataFrame, fetch_ts: datetime) -> DataFrame:
        """claimed batch (+host,seq) → same rows + (html binary, warc_ts).
        NULL html = miss (scheduler turns it into a retry)."""
        import pandas as pd

        headers = dict(self.headers)
        timeout_s = self.timeout_s
        max_bytes = self.max_bytes
        exclusion_re = re.compile(self.exclusion_re) if self.exclusion_re else None
        default_delay = self.default_delay_s
        allow_hosts = self.allow_hosts
        render = self.render

        work = batch
        if self.host_delays is not None:
            work = work.join(
                F.broadcast(self.host_delays.select(
                    F.col("host").alias("__dh"),
                    F.col("crawl_delay_s").alias("__delay"),
                )),
                work["host"] == F.col("__dh"), "left",
            ).drop("__dh")
        else:
            work = work.withColumn("__delay", F.lit(None).cast("double"))

        in_cols = [c for c in batch.columns]
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in batch.schema.fields
        ) + ", html binary, warc_ts timestamp"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from urllib.parse import urlsplit as _urlsplit

            last_hit: dict[str, float] = {}  # host → monotonic last-request
            for pdf in batches:
                if pdf.empty:
                    continue
                htmls: list[bytes | None] = []
                for url, host, delay in zip(pdf["url"], pdf["host"],
                                            pdf["__delay"]):
                    # allowlist checks the URL's REAL hostname — the batch's
                    # host column is the registered (politeness) domain
                    if allow_hosts is not None and (
                            _urlsplit(url).hostname not in allow_hosts):
                        htmls.append(None)
                        continue
                    if exclusion_re is not None and exclusion_re.search(
                            url.split("?")[0].split("#")[0]):
                        htmls.append(None)
                        continue
                    d = float(delay) if pd.notna(delay) else default_delay
                    if d > 0 and host in last_hit:
                        wait = last_hit[host] + d - time.monotonic()
                        if wait > 0:
                            time.sleep(wait)
                    last_hit[host] = time.monotonic()
                    _status, body = fetch_url(url, headers, timeout_s,
                                              max_bytes,
                                              allow_hosts=allow_hosts)
                    if body is not None and render is not None:
                        try:
                            body = render(url, body)
                        except Exception:  # noqa: BLE001 — render failure
                            body = None    # == retryable miss
                    htmls.append(body)
                out = pdf[in_cols].copy()
                out["html"] = pd.Series(htmls, index=pdf.index, dtype=object)
                out["warc_ts"] = fetch_ts
                yield out

        # one task per host (hash-partitioned), claim order inside it
        return (
            work.repartition(F.col("host"))
            .sortWithinPartitions("host", "seq")
            .mapInPandas(run, schema)
        )

    # -- conditional refetch (HTTP revalidation) -----------------------------

    def revalidate(self, batch: DataFrame, fetch_ts: datetime) -> DataFrame:
        """Conditional-GET refetch stage over a revalidation batch — the
        rows ``sources/cdx.conditional_fetch_plan`` emits: ``(url, host,
        if_none_match?, if_modified_since?)`` (+ any passthrough columns).

        Per row, the stored validators are echoed back VERBATIM as
        ``If-None-Match`` / ``If-Modified-Since`` request headers
        (RFC 9110 §13.1 — validators are opaque; when both exist both are
        sent and the server must prefer If-None-Match). Outcomes:

          * ``304 Not Modified`` → ``not_modified=true``, ``html`` NULL —
            the caller keeps the prior capture's content and merely
            refreshes its freshness bookkeeping (completed_at / CDX ts);
            the unchanged body never crosses the wire.
          * ``2xx`` → ``not_modified=false`` + the new body: content
            changed, flows into extraction like any fetched page.
          * anything else → ``not_modified=false`` + NULL html: a plain
            retryable miss for the existing retry/backoff machinery.

        Same distributed shape as ``__call__``: one task per host, rows
        in deterministic (host, url) order, the same per-host delay gate
        — a revalidation wave is still a crawl and is still polite.
        """
        import pandas as pd

        headers = dict(self.headers)
        timeout_s = self.timeout_s
        max_bytes = self.max_bytes
        default_delay = self.default_delay_s
        allow_hosts = self.allow_hosts

        has_inm = "if_none_match" in batch.columns
        has_ims = "if_modified_since" in batch.columns
        in_cols = list(batch.columns)
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in batch.schema.fields
        ) + ", status int, html binary, not_modified boolean, warc_ts timestamp"

        def run(batches) -> "Iterator[pd.DataFrame]":
            last_hit: dict[str, float] = {}
            for pdf in batches:
                if pdf.empty:
                    continue
                statuses: list[int] = []
                htmls: list[bytes | None] = []
                fresh: list[bool] = []
                inm = pdf["if_none_match"] if has_inm else None
                ims = pdf["if_modified_since"] if has_ims else None
                for i, (url, host) in enumerate(zip(pdf["url"], pdf["host"])):
                    from urllib.parse import urlsplit as _urlsplit

                    if allow_hosts is not None and (
                            _urlsplit(url).hostname not in allow_hosts):
                        statuses.append(0); htmls.append(None)
                        fresh.append(False)
                        continue
                    h = dict(headers)
                    if inm is not None and pd.notna(inm.iloc[i]):
                        h["If-None-Match"] = str(inm.iloc[i])
                    if ims is not None and pd.notna(ims.iloc[i]):
                        h["If-Modified-Since"] = str(ims.iloc[i])
                    if default_delay > 0 and host in last_hit:
                        wait = (last_hit[host] + default_delay
                                - time.monotonic())
                        if wait > 0:
                            time.sleep(wait)
                    last_hit[host] = time.monotonic()
                    status, body = fetch_url(url, h, timeout_s, max_bytes,
                                             allow_hosts=allow_hosts)
                    statuses.append(status)
                    htmls.append(body)
                    fresh.append(status == 304)
                out = pdf[in_cols].copy()
                out["status"] = pd.Series(statuses, index=pdf.index,
                                          dtype="int32")
                out["html"] = pd.Series(htmls, index=pdf.index, dtype=object)
                out["not_modified"] = pd.Series(fresh, index=pdf.index,
                                                dtype=bool)
                out["warc_ts"] = fetch_ts
                yield out

        return (
            batch.repartition(F.col("host"))
            .sortWithinPartitions("host", "url")
            .mapInPandas(run, schema)
        )


def fetch_robots_batch(
    fetcher: HttpFetcher,
    hosts: DataFrame,
    fetch_ts: datetime,
    scheme: str = "https",
) -> DataFrame:
    """Distributed robots.txt fetch: one GET of ``{scheme}://{host}
    /robots.txt`` per DISTINCT host → ``(host, status, robots_text,
    fetched_at)``. No politeness gate needed — by construction every row
    is a different host. Bodies decode as UTF-8-with-replacement (RFC
    9309 §2.3 requires UTF-8); status carries the RFC's
    unavailable-vs-unreachable distinction downstream (transport failure
    = 0). Text is NULL on any non-2xx. Oversized 2xx bodies are truncated
    to the 500 KiB cap and the prefix parsed (RFC 9309 §2.5) — NOT
    treated as unreachable, which would wrongly disallow-all the host."""
    import pandas as pd

    headers = dict(fetcher.headers)
    timeout_s = fetcher.timeout_s
    max_bytes = min(fetcher.max_bytes, 512 * 1024)  # RFC 9309 §2.5: 500 KiB
    allow_hosts = fetcher.allow_hosts

    def run(batches) -> Iterator[pd.DataFrame]:
        from urllib.parse import urlsplit as _urlsplit

        for pdf in batches:
            if pdf.empty:
                continue
            statuses: list[int] = []
            texts: list[str | None] = []
            for host in pdf["host"]:
                url = f"{scheme}://{host}/robots.txt"
                if allow_hosts is not None and (
                        _urlsplit(url).hostname not in allow_hosts):
                    statuses.append(0)
                    texts.append(None)
                    continue
                status, body = fetch_url(url, headers, timeout_s, max_bytes,
                                         allow_hosts=allow_hosts,
                                         truncate_oversized=True)
                statuses.append(status)
                texts.append(body.decode("utf-8", "replace")
                             if body is not None and 200 <= status < 300
                             else None)
            out = pd.DataFrame({
                "host": pdf["host"],
                "status": pd.Series(statuses, index=pdf.index,
                                    dtype="int32"),
                "robots_text": pd.Series(texts, index=pdf.index,
                                         dtype=object),
            })
            out["fetched_at"] = fetch_ts
            yield out

    return hosts.select("host").distinct().mapInPandas(
        run, "host string, status int, robots_text string, "
             "fetched_at timestamp")


def refresh_robots_cache(
    spark,
    store,
    fetcher: HttpFetcher,
    hosts: DataFrame,
    now_ts: datetime,
    ttl_s: float = 86400.0,
    scheme: str = "https",
    table: str = "robots_cache",
) -> DataFrame:
    """TTL'd robots cache over the snapshot store (RFC 9309 §2.4 allows
    caching up to 24 h — the default). Hosts whose cached row is younger
    than ``ttl_s`` are served from the store and never hit the wire;
    stale/missing hosts are refetched in ONE distributed batch and the
    cache is committed back atomically. Returns the refreshed cache rows
    for the requested hosts — feed through
    ``functions.robots.parse_robots_rules_df`` + ``split_robots_rules``
    to get the (rules, delays) pair the scheduler consumes.

    Scale note: the cache table is per-host metadata (≤ ~10^7 rows for
    the web); the commit rewrites it whole, which is fine at that size —
    a 10^8-host deployment would switch it to the same hash-bucketed
    MERGE the frontier uses (state.py ``bucketed=``), a storage-layout
    change invisible to callers."""
    want = hosts.select("host").distinct()
    cached = store.read(spark, table)
    cutoff = F.lit(now_ts).cast("timestamp") - F.make_interval(
        secs=F.lit(float(ttl_s)))
    if cached is not None:
        fresh = cached.filter(F.col("fetched_at") >= cutoff)
        need = want.join(fresh.select("host"), "host", "left_anti")
    else:
        fresh = None
        need = want
    fetched = fetch_robots_batch(fetcher, need, now_ts, scheme=scheme)
    if cached is not None:
        # replace refetched hosts, carry every other cached row forward —
        # anti-join on NEED (the same host set, but a pure plan) so the
        # wire-touching fetch stage appears exactly ONCE in the commit
        # plan; referencing `fetched` twice would re-issue every GET
        carried = cached.join(need, "host", "left_anti")
        new_cache = carried.unionByName(fetched)
    else:
        new_cache = fetched
    # safe to read-old-while-writing-new: commits land in fresh
    # versioned dirs (state.py), never overwriting the files this plan
    # still reads
    store.commit({table: new_cache})
    out = store.read(spark, table)
    return out.join(want, "host", "left_semi")
