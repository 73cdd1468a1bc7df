"""Link expansion: fetched pages → in-scope candidate URLs.

The reference enqueues links per page in DOM order through glob filters
(``enqueueLinks`` with globs/exclude, reference src/core.ts:203-207); nav
discovery scopes to ``nav, aside, [role='navigation']``
(src/core.ts:87-131). Here link extraction is ONE Arrow-batched pandas UDF
over the html column; everything after (hygiene, glob scope, identity,
in-batch dedup) is built-in JVM expressions — the glob matchers were
compiled to anchored regexes at plan time (functions/globs.py) so scope
filtering is a codegen'd ``rlike``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions.udfs import extract_links_udf
from .ids import with_url_identity


def scope_filter(df: DataFrame, config: CrawlConfig, url_col: str = "url") -> DataFrame:
    """include ∧ ¬exclude (reference src/core.ts:115-128), compiled to rlike."""
    inc = config.include_matcher().combined_regex()
    exc = config.exclude_matcher().combined_regex()
    out = df
    if inc is not None:
        out = out.filter(F.col(url_col).rlike(inc))
    if exc is not None:
        out = out.filter(~F.col(url_col).rlike(exc))
    return out


def expand_links(
    fetched: DataFrame,
    config: CrawlConfig,
    nav_only: bool = False,
    html_col: str = "html",
    url_col: str = "url",
    links_col: str | None = None,
) -> DataFrame:
    """Fetched pages → candidate link rows.

    Output: (url, parent_seq, link_index, depth, priority, host,
    canonical_url, url_hash), first occurrence per canonical URL wins within
    the batch (RequestQueue in-page/in-batch dedup order parity — ordered by
    (parent_seq, link_index)).

    Expects ``fetched`` to carry ``seq`` (parent ordering key) and ``depth``.
    Pass ``links_col`` when links were already extracted by the fused page
    UDF — avoids a second DOM parse.
    """
    link_array = (
        F.col(links_col) if links_col
        else extract_links_udf(F.col(html_col), F.col(url_col))
    )
    links = fetched.select(
        F.col("seq").alias("parent_seq"),
        (F.col("depth") + 1).alias("depth"),
        F.posexplode_outer(link_array).alias("__pos", "__link"),
    ).select(
        F.col("__link.href").alias("url"),
        F.col("__link.link_index").alias("link_index"),
        F.col("__link.is_nav").alias("is_nav"),
        "parent_seq",
        "depth",
    ).filter(F.col("url").isNotNull())

    # link-farm defense (Mercator-style outlink cap, opt-in via
    # config.max_links_per_page): a spam page carrying 10^4 anchors must
    # not inject 10^4 frontier candidates. DOM order is the link_index,
    # so the cap keeps the FIRST k links — a pure within-row-ordered
    # filter, zero shuffle, and deterministic (the oracle replays it as
    # link_index < k).
    cap = getattr(config, "max_links_per_page", None)
    if cap is not None:
        links = links.filter(F.col("link_index") < int(cap))

    if nav_only:
        links = links.filter(F.col("is_nav"))
    links = scope_filter(links, config)
    links = with_url_identity(links)
    # first-wins in-batch dedup: min (parent_seq, link_index) per canonical URL
    w_key = F.struct(F.col("parent_seq"), F.col("link_index"))
    best = links.groupBy("url_hash").agg(F.min(w_key).alias("__k"))
    return (
        links.join(best, on="url_hash", how="inner")
        .filter(
            (F.col("parent_seq") == F.col("__k.parent_seq"))
            & (F.col("link_index") == F.col("__k.link_index"))
        )
        .drop("__k")
        .dropDuplicates(["url_hash"])
        .withColumn("priority", F.lit(config.priority))
    )


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Resolve redirect CHAINS to their final landing URL — the crawl-
    hygiene step URL identity needs before dedup: a→b→c must count as c
    (Common Crawl stores per-hop redirect records and dedups on the final
    target; the fetch stage's same-host follower handles hops WITHIN one
    request — this resolves chains assembled ACROSS fetch log records,
    including cross-host hops that were recorded as misses).

    Per distinct redirect source: ``final_url`` (the first node in its
    chain that is not itself a redirect source) and ``looped`` (chain
    cycles, or exceeds ``max_hops`` — crawlers treat both as errors;
    ``final_url`` is NULL there). Multiple recorded targets per source
    (re-crawled redirects that changed) resolve deterministically to the
    MIN target.

    Plan at 10^10 edges: POINTER HALVING, the connected-components trick
    — each round self-joins the mapping on its current target, so the
    followed distance DOUBLES per round and ceil(log2(max_hops)) rounds
    replace max_hops sequential joins. One keyed shuffle per round,
    lineage cut via localCheckpoint; no driver-side iteration over data.
    """
    import math

    m = (
        redirects.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("t"))
        .groupBy("u").agg(F.min("t").alias("t"))
        .withColumn("hops", F.lit(1).cast("long"))
    )
    rounds = max(1, math.ceil(math.log2(max(2, int(max_hops)))))
    for _ in range(rounds):
        nxt = m.select(F.col("u").alias("u2"), F.col("t").alias("t2"),
                       F.col("hops").alias("h2"))
        m = (
            m.join(nxt, m["t"] == F.col("u2"), "left")
            .select(
                "u",
                F.coalesce(F.col("t2"), F.col("t")).alias("t"),
                F.when(F.col("t2").isNotNull(),
                       F.col("hops") + F.col("h2"))
                .otherwise(F.col("hops")).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    # still pointing AT a redirect source after the halving budget, or
    # chain length beyond max_hops -> cycle / too-long: unresolved
    srcs = m.select(F.col("u").alias("__s")).distinct()
    return (
        m.join(srcs, m["t"] == F.col("__s"), "left")
        .select(
            F.col("u").alias(src_col),
            (F.col("__s").isNotNull() | (F.col("hops") > max_hops))
            .alias("looped"),
            F.when(F.col("__s").isNull() & (F.col("hops") <= max_hops),
                   F.col("t")).alias("final_url"),
            "hops",
        )
    )


def canonical_dedup_key(
    df: DataFrame,
    url_col: str = "url",
    hint_col: str = "canonical_hint",
) -> DataFrame:
    """Elect the dedup identity of a fetched page from its
    ``<link rel=canonical>`` hint (RFC 6596 — extracted by
    ``functions/extract.extract_canonical``): a page declaring a
    canonical is a self-confessed duplicate of that target, so the
    URL-seen/dedup layer should key on the TARGET (Google and Common
    Crawl both honor the hint when electing a duplicate cluster's
    representative).

    Per row: ``dedup_url`` (the valid absolute http(s) hint, else the
    page's own URL — relative hints must be resolved at extract time,
    malformed ones are ignored), ``used_hint``, and ``cross_host`` (hint
    points off-host — honored, but flagged: cross-domain canonicals are
    the abuse vector, and a downstream policy may demote them).

    Zero shuffle — pure JVM projection; feed ``dedup_url`` through
    ``ids.with_url_identity`` for normalization + hashing exactly like
    any other URL.
    """
    url = F.col(url_col)
    hint = F.col(hint_col)
    valid = hint.isNotNull() & hint.rlike(r"^https?://")
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    hhost = F.regexp_extract(hint, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    return (
        df.withColumn("dedup_url", F.when(valid, hint).otherwise(url))
        .withColumn("used_hint", valid)
        .withColumn(
            "cross_host",
            valid & (F.lower(host) != F.lower(hhost)),
        )
    )


def apply_meta_robots(
    df: DataFrame,
    directives_col: str = "meta_robots",
) -> DataFrame:
    """Split the page-level robots directive token list (from
    ``functions/extract.extract_meta_robots`` or an ``X-Robots-Tag``
    response header — same token grammar) into the two flags the
    pipeline acts on:

      * ``noindex`` — fetch stands, but the page must NOT be emitted to
        the dataset sink (``none`` implies it);
      * ``nofollow`` — the page's links must NOT be expanded into the
        frontier (``none`` implies it too).

    Token matching is exact on the comma-separated lowercase list
    (``index``/``follow``/``all`` are the defaults and need no action).
    Zero shuffle — a pure projection; compose as
    ``pages.where(~noindex)`` before the sink and ``~nofollow`` before
    link expansion. The reference crawler has no analog (it crawls
    configured doc sites); at web scale honoring these is table stakes.
    """
    toks = F.split(F.coalesce(F.col(directives_col), F.lit("")), ",")
    has = lambda t: F.array_contains(toks, t)  # noqa: E731
    return (
        df.withColumn("noindex", has("noindex") | has("none"))
        .withColumn("nofollow", has("nofollow") | has("none"))
    )
