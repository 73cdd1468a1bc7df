"""CDX capture index (sources/cdx.py): SURT key semantics, the index
projection, and the sorted-shard sink with cluster.idx boundaries."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from context_crawler_spark.sources.cdx import cdx_index, surt_key, write_cdx_shards


def _surt(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(surt_key(F.lit(url)).alias("k"))
        .collect()[0]["k"]
    )


def test_surt_host_reversal_and_www(spark):
    assert _surt(spark, "https://www.example.com/path") == "com,example)/path"
    assert _surt(spark, "http://a.b.example.com/") == "com,example,b,a)/"


def test_surt_case_port_query_fragment(spark):
    # lowercased, default port dropped, params sorted bytewise, fragment gone
    assert (
        _surt(spark, "HTTPS://WWW.Example.COM:443/A/B?b=2&a=1#frag")
        == "com,example)/a/b?a=1&b=2"
    )
    # non-default port survives in the host part
    assert _surt(spark, "http://example.com:8080/x") == "com,example:8080)/x"


def test_surt_empty_path_is_slash(spark):
    assert _surt(spark, "https://example.com") == "com,example)/"
    assert _surt(spark, "https://example.com?q=1") == "com,example)/?q=1"


def test_cdx_index_projection_zero_shuffle(spark):
    pages = spark.createDataFrame(
        [("https://www.a.test/x", "2024-01-01 00:00:05", b"<html>hi</html>")],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = cdx_index(pages)
    row = out.collect()[0]
    assert row["surt_key"] == "test,a)/x"
    assert row["length"] == 15
    assert len(row["digest"]) == 32
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_write_cdx_shards_sorted_with_cluster_idx(spark, tmp_path):
    rows = [
        (f"https://site{i % 7}.test/p{i}", "2024-01-01 00:00:00",
         f"payload {i}".encode())
        for i in range(200)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    res = write_cdx_shards(cdx_index(pages), str(tmp_path), n_shards=4)
    assert res["n_shards"] >= 1
    # concatenating shards in cluster.idx order must yield a globally
    # sorted key stream (the binary-searchable zipnum property)
    with open(res["index"], encoding="utf-8") as fh:
        entries = [ln.rstrip("\n").split("\t") for ln in fh]
    keys_all = []
    for _first_key, fname in entries:
        with open(os.path.join(str(tmp_path), "cdx", fname), encoding="utf-8") as fh:
            keys_all.extend(ln.split(" ", 1)[0] for ln in fh)
    assert keys_all == sorted(keys_all)
    assert len(keys_all) == 200
    # cluster.idx first-keys must be ascending too
    firsts = [e[0] for e in entries]
    assert firsts == sorted(firsts)


def test_lookup_prefix_binary_search(spark, tmp_path):
    from context_crawler_spark.sources.cdx import lookup_prefix

    rows = [
        (f"https://site{i % 7}.test/p{i}", "2024-01-01 00:00:00",
         f"payload {i}".encode())
        for i in range(200)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    write_cdx_shards(cdx_index(pages), str(tmp_path), n_shards=4)

    # SURT-prefix form: all captures of one host
    hits = lookup_prefix(str(tmp_path), "test,site3)")
    assert len(hits) == len([i for i in range(200) if i % 7 == 3])
    assert all(h.startswith("test,site3)/p") for h in hits)
    # full-URL form — prefix semantics (wayback `url/*`): p3 also
    # matches p31/p38; the exact capture sorts first
    one = lookup_prefix(str(tmp_path), "https://site3.test/p3")
    assert len(one) == 3 and " https://site3.test/p3 " in one[0]
    # miss
    assert lookup_prefix(str(tmp_path), "test,nonexistent)") == []
    # limit clamps
    assert len(lookup_prefix(str(tmp_path), "test,", limit=5)) == 5


def test_surt_param_order_invariance(spark):
    """The SURT key is invariant to query-param order (the property that
    makes captures of semantically-equal URLs adjacent in the index)."""
    import itertools

    params = ["b=2", "a=1", "c=x%20y"]
    keys = {
        _surt(spark, "https://example.com/p?" + "&".join(perm))
        for perm in itertools.permutations(params)
    }
    assert len(keys) == 1
    assert keys.pop() == "com,example)/p?a=1&b=2&c=x%20y"


def test_surt_matches_driver_side_lookup_transform(spark, tmp_path):
    """lookup_prefix's pure-Python URL->SURT fast path must agree with the
    JVM expression for every URL shape the crawler emits — otherwise a
    lookup by URL misses captures the index holds."""
    from context_crawler_spark.sources.cdx import lookup_prefix

    urls = [
        "https://www.Example.com/Path/Q?b=2&a=1#f",
        "http://a.b.example.com:8080/",
        "HTTPS://EXAMPLE.COM:443/x",
        "https://example.com",
        "https://example.com?z=1",
    ]
    rows = [(u, "2024-01-01 00:00:00", b"x") for u in urls]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    write_cdx_shards(cdx_index(pages), str(tmp_path), n_shards=2)
    for u in urls:
        hits = lookup_prefix(str(tmp_path), u)
        assert any(f" {u} " in h for h in hits), u


def test_cdx_diff_statuses(spark):
    """added / removed / changed / unchanged per surt_key, diffing the
    LATEST capture on each side."""
    from context_crawler_spark.sources.cdx import cdx_diff, cdx_index

    def snap(rows):
        df = spark.createDataFrame(
            rows, "url string, warc_ts string, html binary"
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
        return cdx_index(df)

    old = snap([
        ("https://a.test/keep", "2024-01-01 00:00:00", b"same"),
        ("https://a.test/edit", "2024-01-01 00:00:00", b"v1"),
        ("https://a.test/gone", "2024-01-01 00:00:00", b"bye"),
        # two captures of /edit — the LATER one (v2) is the diff basis
        ("https://a.test/edit", "2024-01-02 00:00:00", b"v2"),
    ])
    new = snap([
        ("https://a.test/keep", "2024-02-01 00:00:00", b"same"),
        ("https://a.test/edit", "2024-02-01 00:00:00", b"v3"),
        ("https://a.test/born", "2024-02-01 00:00:00", b"hi"),
    ])
    got = {r["surt_key"]: r for r in cdx_diff(old, new).collect()}
    assert got["test,a)/keep"]["status"] == "unchanged"
    assert got["test,a)/edit"]["status"] == "changed"
    assert got["test,a)/gone"]["status"] == "removed"
    assert got["test,a)/born"]["status"] == "added"
    assert got["test,a)/gone"]["new_digest"] is None
    assert got["test,a)/born"]["old_digest"] is None
    # latest-capture reduction: old side of /edit is v2's digest, and its
    # old_ts is the later capture time
    import hashlib
    assert got["test,a)/edit"]["old_digest"] == hashlib.md5(b"v2").hexdigest()
    assert str(got["test,a)/edit"]["old_ts"]).startswith("2024-01-02")


def test_cdx_diff_same_content_same_digest_unchanged_roundtrip(spark):
    """A snapshot diffed against itself is all-unchanged (idempotence)."""
    from context_crawler_spark.sources.cdx import cdx_diff, cdx_index

    rows = [(f"https://h{i % 3}.test/p{i}", "2024-01-01 00:00:00",
             f"body {i}".encode()) for i in range(30)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    idx = cdx_index(df)
    out = cdx_diff(idx, idx)
    assert out.count() == 30
    assert out.filter(F.col("status") != "unchanged").count() == 0


def test_sitemap_recrawl_set_reasons(spark):
    """new / stale / fresh / unknown classification against the capture
    history; refetch = new + stale."""
    from datetime import datetime

    from context_crawler_spark.sources.cdx import (
        cdx_index, sitemap_recrawl_set,
    )

    cap_rows = [
        ("https://a.test/fresh", "2024-02-01 00:00:00", b"x"),
        ("https://a.test/stale", "2024-01-01 00:00:00", b"y"),
        ("https://a.test/nolm", "2024-01-01 00:00:00", b"z"),
    ]
    cdx = cdx_index(spark.createDataFrame(
        cap_rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")))
    entries = spark.createDataFrame(
        [
            ("https://a.test/fresh", datetime(2024, 1, 15)),
            ("https://a.test/stale", datetime(2024, 1, 20)),
            ("https://a.test/nolm", None),
            ("https://a.test/never", datetime(2024, 1, 1)),
        ],
        "url string, lastmod timestamp",
    )
    got = {r["url"].rsplit("/", 1)[1]: r for r in
           sitemap_recrawl_set(entries, cdx).collect()}
    assert got["fresh"]["reason"] == "fresh" and not got["fresh"]["refetch"]
    assert got["stale"]["reason"] == "stale" and got["stale"]["refetch"]
    assert got["nolm"]["reason"] == "unknown" and not got["nolm"]["refetch"]
    assert got["never"]["reason"] == "new" and got["never"]["refetch"]


def test_sitemap_changefreq_due(spark):
    """<changefreq> hint: captured URLs without lastmod become 'due' when
    the hint interval has elapsed at now_ts; 'never' and absent hints
    stay 'unknown'; lastmod takes precedence over the hint."""
    from pyspark.sql import functions as F

    from context_crawler_spark.sources.cdx import sitemap_recrawl_set

    entries = spark.createDataFrame([
        ("https://s.test/daily", None, "daily"),
        ("https://s.test/yearly", None, "yearly"),
        ("https://s.test/never", None, "never"),
        ("https://s.test/nohint", None, None),
        # lastmod after capture wins over the yearly (not-due) hint
        ("https://s.test/stale", "2023-11-20 00:00:00", "yearly"),
    ], "url string, lastmod string, changefreq string")
    cdx = spark.createDataFrame(
        [(f"test,s)/{p}", "2023-11-15 00:00:00")
         for p in ("daily", "yearly", "never", "nohint", "stale")],
        "surt_key string, ts string",
    ).select("surt_key", F.col("ts").cast("timestamp").alias("ts"))
    out = sitemap_recrawl_set(
        entries, cdx, changefreq_col="changefreq",
        # 2 days after the captures: daily elapsed, yearly not
        now_ts=F.to_timestamp(F.lit("2023-11-17 00:00:00")),
    )
    got = {r["url"].rsplit("/", 1)[1]: (r["reason"], r["refetch"])
           for r in out.collect()}
    assert got == {
        "daily": ("due", True),
        "yearly": ("unknown", False),
        "never": ("unknown", False),
        "nohint": ("unknown", False),
        "stale": ("stale", True),
    }


def test_parse_sitemap_entries_full():
    from context_crawler_spark.functions.extract import (
        parse_sitemap_entries, parse_sitemap_entries_full,
    )

    xml = """<?xml version="1.0"?>
    <urlset><url><loc>https://a.test/1</loc>
      <lastmod>2024-01-01</lastmod><changefreq>Daily</changefreq>
      <priority>0.8</priority></url>
    <url><loc>https://a.test/2</loc><priority>bogus</priority></url>
    </urlset>"""
    full = parse_sitemap_entries_full(xml)
    assert full == [
        ("https://a.test/1", "2024-01-01", "daily", 0.8),
        ("https://a.test/2", None, None, None),
    ]
    # back-compat wrapper keeps the (loc, lastmod) shape
    assert parse_sitemap_entries(xml) == [
        ("https://a.test/1", "2024-01-01"),
        ("https://a.test/2", None),
    ]
