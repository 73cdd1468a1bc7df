"""DUST rule mining — "Different URLs with Similar Text" (Bar-Yossef,
Keidar & Schonfeld, WWW 2007, "Do not crawl in the DUST").

Large sites serve the same content under many URLs (session ids,
tracking params, mirror paths). Static canonicalization
(functions/urlnorm strips utm_*/fragments) only removes the universally
known offenders; DUST mining LEARNS site-specific rules from the crawl
itself: if pages at ``u?a=1`` and ``u?a=1&sid=xyz`` keep serving
byte-identical content, then ``sid`` is content-irrelevant on that host
and the frontier should canonicalize it away — shrinking a 10^10-URL
frontier by whole duplicate families before fetch, not after.

This implements the parameter-rule subset of DUST (the paper also mines
path-substitution rules): a rule is ``(host, param)`` meaning "dropping
``param`` from a URL on ``host`` does not change the content".

Evidence: a pair of same-host, same-path URLs whose payload digests are
EQUAL and whose sorted ``k=v`` param multisets differ by exactly that
one param (one side has it, everything else identical) — the paper's
"instance" of a rule. Support = number of distinct content groups
(digests) exhibiting an instance; requiring ``min_support`` distinct
groups (not raw pairs) blocks the single-page coincidence.

Plan shape: URLs parse to (host, path, params array) as JVM regex/split
projections; the pair generation is a self-equi-join on
``(digest, host, path)`` — digest groups are duplicate families, which
are SMALL (bounded by per-site mirror fan-out), so the join output is
O(Σ g²) with tiny g, never corpus-quadratic. A degenerate giant group
(the empty page, an error template) would blow that bound, so groups
larger than ``max_group`` are dropped first (the paper prunes these as
"too popular to be informative" — at web scale that cap is what keeps
the stage linear; soft-404 filtering upstream removes most of them
anyway). One exchange for the group key, one metadata-sized exchange
for the (host, param) support count.

``apply_dust_rules`` rewrites a URL batch against the mined rules: the
rules table (a few rows per host) joins broadcast on host and the param
strip is a within-row HOF filter — zero data-sized shuffle, the same
shape as the robots/politeness dimension joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def _url_parts(url_col: str):
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"), lambda p: p != ""))
    return host, path, params


def dust_rules(
    pages: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_support: int = 2,
    max_group: int = 64,
) -> DataFrame:
    """Mine (host, param) irrelevant-parameter rules from a crawled
    batch of (url, payload digest). Returns
    (host, param, support, n_pairs) for rules with ``support`` (distinct
    digest groups) >= ``min_support``."""
    host, path, params = _url_parts(url_col)
    e = pages.select(
        F.col(digest_col).alias("digest"),
        host.alias("host"), path.alias("path"),
        params.alias("params"), F.col(url_col).alias("url"),
    )
    # prune degenerate duplicate families before the self-join — by
    # DIGEST popularity: an error template / empty page shares one digest
    # across many paths, and every pair it forms mints a bogus rule
    # ("sid is irrelevant" because error pages are identical). The join
    # key below includes path, so the blowup risk is rule QUALITY more
    # than join size; the paper prunes these as too popular to inform.
    sizes = e.groupBy("digest").agg(F.count(F.lit(1)).alias("__g"))
    e = e.join(
        F.broadcast(sizes.filter(F.col("__g") > max_group)
                    .select("digest")),
        "digest", "left_anti",
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.digest") == F.col("b.digest"))
        & (F.col("a.host") == F.col("b.host"))
        & (F.col("a.path") == F.col("b.path"))
        & (F.col("a.url") < F.col("b.url")),
    )
    extra_a = F.array_except(F.col("a.params"), F.col("b.params"))
    extra_b = F.array_except(F.col("b.params"), F.col("a.params"))
    # exactly one extra k=v on exactly one side -> that param is the rule
    instance = F.when(
        (F.size(extra_a) == 1) & (F.size(extra_b) == 0), extra_a[0],
    ).when(
        (F.size(extra_b) == 1) & (F.size(extra_a) == 0), extra_b[0],
    )
    inst = pairs.select(
        F.col("a.host").alias("host"), F.col("a.digest").alias("digest"),
        F.split(instance, "=")[0].alias("param"),
    ).filter(F.col("param").isNotNull())
    out = inst.groupBy("host", "param").agg(
        F.count_distinct("digest").alias("support"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return out.filter(F.col("support") >= min_support)


def apply_dust_rules(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "dust_url",
) -> DataFrame:
    """Rewrite a URL batch under mined rules: strip every (host, param)
    the rules table names. Rules aggregate to one array per host
    (metadata-sized), broadcast in; the strip is a within-row filter
    over the param array — no data-sized shuffle."""
    per_host = rules.groupBy("host").agg(
        F.collect_set("param").alias("__drop"))
    host, path, params = _url_parts(url_col)
    scheme = F.regexp_extract(F.col(url_col), r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    u = urls.withColumns({
        "host": host, "__path": path, "__params": params,
        "__scheme": scheme,
    })
    joined = u.join(F.broadcast(per_host), "host", "left")
    kept = F.when(
        F.col("__drop").isNull(), F.col("__params"),
    ).otherwise(F.filter(
        F.col("__params"),
        lambda p: ~F.array_contains(F.col("__drop"), F.split(p, "=")[0]),
    ))
    rebuilt = F.concat(
        F.col("__scheme"), F.lit("://"), F.col("host"), F.col("__path"),
        F.when(F.size(kept) > 0,
               F.concat(F.lit("?"), F.array_join(kept, "&")))
         .otherwise(F.lit("")),
    )
    return joined.withColumn(out_col, rebuilt).drop(
        "__path", "__params", "__scheme", "__drop")
