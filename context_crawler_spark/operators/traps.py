"""Crawler-trap detection: flag hosts whose URL space is exploding.

Classic frontier safeguard (Heydon & Najork, "Mercator: a scalable,
extensible web crawler", WWW 1999 §3.2 — "crawler traps"; Lee et al.,
"IRLbot: scaling to 6 billion pages and beyond", WWW 2008 — spam/loop
budget control): calendars, session-id links, and cyclic path symlinks
generate unbounded URL sets under one host. The reference engine bounds
this only implicitly (maxRequestsPerCrawl, reference src/core.ts config);
at a 10^10-URL frontier explicit per-host signals are needed so the
scheduler can cap or drop trap hosts BEFORE they flood the frontier.

Signals per host, all pure JVM expressions over the candidate-URL batch
(zero Python, ONE shuffle — the host groupBy):

  * ``n_urls``            — candidate volume
  * ``avg_depth``         — mean path-segment count (deep = suspicious)
  * ``frac_query``        — fraction of URLs carrying a query string
    (session ids / faceted search)
  * ``urls_per_template`` — n_urls / distinct path TEMPLATES, where a
    template is the path with digit runs collapsed (``/2024/01/05/`` →
    ``/N/N/N/``); calendars and pagination collapse onto few templates,
    so a high ratio = generated URL space
  * ``avg_seg_repeat``    — mean (segments − distinct segments) per URL;
    cyclic-path traps (``/a/b/a/b/a``) repeat segments

``trap`` flags a host when ``urls_per_template`` or ``avg_seg_repeat``
clears its threshold. Feed flagged hosts to the politeness layer as a
budget-0 (or heavily capped) dimension — a broadcast join, like robots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_trap_signals(
    urls: DataFrame,
    url_col: str = "url",
    max_urls_per_template: float = 20.0,
    max_avg_seg_repeat: float = 1.0,
) -> DataFrame:
    """Per-host trap signals + flag over a candidate-URL batch.

    Output: (host, n_urls, avg_depth, frac_query, n_templates,
    urls_per_template, avg_seg_repeat, trap)."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    path = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    template = F.regexp_replace(path, r"[0-9]+", "N")
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    depth = F.size(segs)
    seg_repeat = F.size(segs) - F.size(F.array_distinct(segs))
    has_query = u.contains("?").cast("int")

    rows = urls.select(
        host.alias("host"),
        depth.alias("__depth"),
        seg_repeat.alias("__rep"),
        has_query.alias("__q"),
        template.alias("__tpl"),
    )
    agg = rows.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.round(F.avg("__depth"), 6).alias("avg_depth"),
        F.round(F.avg("__q"), 6).alias("frac_query"),
        F.countDistinct("__tpl").alias("n_templates"),
        F.round(F.avg("__rep"), 6).alias("avg_seg_repeat"),
    )
    return agg.withColumn(
        "urls_per_template",
        F.round(F.col("n_urls") / F.col("n_templates"), 6),
    ).withColumn(
        "trap",
        (F.col("urls_per_template") >= max_urls_per_template)
        | (F.col("avg_seg_repeat") >= max_avg_seg_repeat),
    ).select(
        "host", "n_urls", "avg_depth", "frac_query", "n_templates",
        "urls_per_template", "avg_seg_repeat", "trap",
    )


# soft-404 detection -----------------------------------------------------

# Error-page phrases (lowercase). Bar-Yossef, Broder, Kumar & Tomkins,
# "Sic transit gloria telae: towards an understanding of the web's
# decay", WWW 2004 §3 observed that a large share of dead pages answer
# HTTP 200 with an error BODY ("soft 404s"); crawl pipelines detect them
# by fingerprint phrases + degenerate content before the pages pollute
# the corpus and the link graph.
SOFT404_PHRASES = [
    "page not found", "404 not found", "404 error", "error 404",
    "page does not exist", "no longer available", "page cannot be found",
    "page you requested", "page has been removed", "file not found",
]


def soft_404_signals(
    pages: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    title_col: str = "title",
    text_col: str = "text",
    min_chars: int = 120,
    head_chars: int = 400,
) -> DataFrame:
    """Flag HTTP-200 responses whose BODY is an error page (soft 404s).

    Appends integer/boolean signal columns — all zero-shuffle JVM
    projections, oracle-replayable:

    ``s404_title_hit``  — an error phrase (or a bare "404") in the title;
    ``s404_head_hit``   — an error phrase in the first ``head_chars`` of
                          the text (error pages lead with the message;
                          bounding the scan keeps the work O(1) per row
                          and stops a long legit article that merely
                          MENTIONS "404 error" late from matching);
    ``s404_tiny``       — fewer than ``min_chars`` of text (stub body);
    ``soft_404``        — status==200 AND (title hit, or head hit on a
                          tiny body, or an empty body).

    Pair with the hard-status path: the fetch stage already turns real
    4xx/5xx into misses (operators/fetch.py); this catches the 200s that
    lie. Downstream: drop from the corpus, and feed ``soft_404`` URLs to
    the recrawl scheduler as dead (the reference has no equivalent — it
    stores whatever the selector extracts, src/core.ts:265).
    """
    title = F.coalesce(F.lower(F.col(title_col)), F.lit(""))
    text = F.coalesce(F.col(text_col), F.lit(""))
    head = F.lower(F.substring(text, 1, head_chars))

    def any_phrase(col):
        hit = F.lit(False)
        for p in SOFT404_PHRASES:
            hit = hit | col.contains(p)
        return hit

    title_hit = any_phrase(title) | title.rlike(r"(^|[^0-9])404([^0-9]|$)")
    head_hit = any_phrase(head)
    tiny = F.length(text) < min_chars
    return pages.withColumns({
        "s404_title_hit": title_hit,
        "s404_head_hit": head_hit,
        "s404_tiny": tiny,
        "soft_404": (F.col(status_col) == 200)
        & (title_hit | (head_hit & tiny) | (F.length(text) == 0)),
    })
