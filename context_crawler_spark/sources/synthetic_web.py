"""Deterministic synthetic web — the engine's test/bench input corpus.

Generates a Common-Crawl-style ``pages`` table (FIXTURES.md §1 schema:
``url, warc_ts, html binary, text, lang``) from a seeded site graph. The
``html`` uses only the restricted deterministic subset the extraction UDF
pins (functions/extract.py), and ``text`` is the golden extraction of that
html with selector ``article`` — so byte-identical-extraction tests are
enforced end-to-end.

Everything is a pure function of the integer seed: page sets, link graphs,
and prose are reproducible across runs, cluster sizes, and the
oracle-vs-engine parity suite. In the sandboxed engine the "fetch" stage is
a join against this table (SURVEY.md §2.1); on a real cluster the same
scheduler feeds a ``mapInPandas`` HTTP fetch stage instead.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import extract

_WORDS = (
    "spark frontier crawl schedule batch shuffle partition bloom filter queue "
    "priority host budget robots sitemap anchor extract text token chunk embed "
    "vector index search snapshot commit resume lineage metric scale skew salt "
    "merge window order hash seen dedup fetch parse render link graph depth"
).split()

SECTIONS = ("docs", "guide", "api", "blog", "support", "changelog", "private")

EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _prose(key: str, n_sentences: int) -> str:
    """Deterministic filler prose: sentences of 6-12 words from _WORDS."""
    out = []
    for i in range(n_sentences):
        h = _h(f"{key}:{i}")
        n = 6 + h % 7
        words = [_WORDS[_h(f"{key}:{i}:{j}") % len(_WORDS)] for j in range(n)]
        words[0] = words[0].capitalize()
        out.append(" ".join(words) + ".")
    return " ".join(out)


@dataclass(frozen=True)
class SitePage:
    url: str
    title: str
    nav_links: tuple[str, ...]    # rendered inside <nav> (discovery scope)
    body_links: tuple[str, ...]   # rendered inside <article>, DOM order
    prose_key: str
    ts_offset: int                # seconds after EPOCH


def host_of(site_ix: int) -> str:
    return f"site{site_ix}.test"


def _page_url(site_ix: int, section: str, page_ix: int) -> str:
    return f"https://{host_of(site_ix)}/{section}/page-{page_ix}"


def build_site_graph(
    seed: int = 42,
    n_hosts: int = 3,
    pages_per_section: int = 8,
    sections: tuple[str, ...] = SECTIONS[:5],
    cross_host_links: bool = True,
    skew_host: int | None = None,
    skew_factor: int = 1,
) -> list[SitePage]:
    """Seeded site graph. Per host: a root page (nav → section indexes),
    one index per section (links to its pages), and leaf pages that link
    to siblings / next pages / occasional cross-host and dirty-URL variants.

    ``skew_host`` gets ``skew_factor``× the pages (politeness/skew tests).
    """
    pages: list[SitePage] = []
    counter = 0
    for s in range(n_hosts):
        host = host_of(s)
        mult = skew_factor if (skew_host is not None and s == skew_host) else 1
        n_pages = pages_per_section * mult
        section_urls = [f"https://{host}/{sec}" for sec in sections]
        # root page: nav links to sections (plus a dirty self-variant to
        # exercise canonicalization dedup) and a couple of body links
        root_url = f"https://{host}/"
        pages.append(
            SitePage(
                url=root_url,
                title=f"{host} home",
                nav_links=tuple(section_urls),
                body_links=(
                    f"https://{host.upper()}/{sections[0]}?utm_source=x#top",
                    _page_url(s, sections[0], 0),
                ),
                prose_key=f"{seed}:{host}:root",
                ts_offset=counter,
            )
        )
        counter += 1
        for sec_ix, sec in enumerate(sections):
            sec_url = section_urls[sec_ix]
            page_urls = [_page_url(s, sec, i) for i in range(n_pages)]
            pages.append(
                SitePage(
                    url=sec_url,
                    title=f"{host} {sec} index",
                    nav_links=tuple(section_urls),
                    body_links=tuple(page_urls),
                    prose_key=f"{seed}:{sec_url}",
                    ts_offset=counter,
                )
            )
            counter += 1
            for i, purl in enumerate(page_urls):
                links: list[str] = []
                if i + 1 < n_pages:
                    links.append(page_urls[i + 1])
                links.append(sec_url + "/")  # trailing-slash dup of the index
                if i % 3 == 0 and sec_ix + 1 < len(sections):
                    links.append(section_urls[sec_ix + 1])
                if cross_host_links and i % 5 == 2 and n_hosts > 1:
                    links.append(f"https://{host_of((s + 1) % n_hosts)}/")
                pages.append(
                    SitePage(
                        url=purl,
                        title=f"{host} {sec} page {i}",
                        nav_links=(),
                        body_links=tuple(links),
                        prose_key=f"{seed}:{purl}",
                        ts_offset=counter,
                    )
                )
                counter += 1
    return pages


def render_html(p: SitePage) -> str:
    """Render one page in the restricted deterministic HTML subset."""
    nav = ""
    if p.nav_links:
        items = "".join(f'<li><a href="{u}">{u.rsplit("/", 1)[-1] or "home"}</a></li>'
                        for u in p.nav_links)
        nav = f"<nav><ul>{items}</ul></nav>"
    paras = []
    n_paras = 2 + _h(p.prose_key) % 3
    for i in range(n_paras):
        paras.append(f"<p>{_prose(f'{p.prose_key}:{i}', 3 + _h(p.prose_key + str(i)) % 4)}</p>")
        if i < len(p.body_links):
            u = p.body_links[i]
            paras.append(f'<p>See <a href="{u}">{u}</a> for more.</p>')
    for u in p.body_links[n_paras:]:
        paras.append(f'<p><a href="{u}">{u}</a></p>')
    body = "".join(paras)
    return (
        f"<html><head><title>{p.title}</title></head><body>{nav}"
        f"<article><h1>{p.title}</h1>{body}</article>"
        f"</body></html>"
    )


def generate_pages(
    seed: int = 42,
    n_hosts: int = 3,
    pages_per_section: int = 8,
    sections: tuple[str, ...] = SECTIONS[:5],
    selector: str = "article",
    **kwargs,
) -> list[dict]:
    """Site graph → list of pages-table rows (FIXTURES.md §1)."""
    graph = build_site_graph(
        seed=seed, n_hosts=n_hosts, pages_per_section=pages_per_section,
        sections=sections, **kwargs,
    )
    rows = []
    langs = ("en", "de", "fr")
    for p in graph:
        html = render_html(p)
        rows.append(
            {
                "url": p.url,
                "warc_ts": EPOCH + timedelta(seconds=p.ts_offset),
                "html": html.encode("utf-8"),
                "text": extract.extract_text(html, selector),
                "lang": langs[_h(p.url) % 3],
            }
        )
    return rows


def pages_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def tiny_site(spark: SparkSession, seed: int = 42) -> DataFrame:
    """~200 pages / 3 hosts — unit + parity tests."""
    return pages_df(spark, generate_pages(seed=seed, n_hosts=3, pages_per_section=8))


def skewed_site(spark: SparkSession, seed: int = 42) -> DataFrame:
    """50 hosts, one holding ~40% of URLs — politeness/skew tests."""
    return pages_df(
        spark,
        generate_pages(
            seed=seed, n_hosts=50, pages_per_section=4,
            skew_host=0, skew_factor=60,
        ),
    )


def synthetic_frontier(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 1000,
    zipf_exponent: float = 1.1,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Large synthetic frontier for throughput benchmarks: ``n_urls`` rows
    of (url, host, priority, created_at, seq) with a Zipf host distribution
    (the skew profile real crawl frontiers show). Generated DISTRIBUTED via
    ``spark.range`` + JVM expressions — no Python, no driver materialization
    — so 10^7+ rows are cheap and the generator itself never bottlenecks
    the benchmark."""
    from pyspark.sql import functions as F

    df = spark.range(0, n_urls, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    # Deterministic pseudo-random u in [0,1) from the row id, then inverse-CDF
    # of a (truncated) Zipf over hosts: host_ix = floor(N * u^alpha) biases
    # low indexes. alpha > 1 sharpens the head.
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1 << 31)) / F.lit(float(1 << 31)))
    host_ix = F.floor(F.pow(u, F.lit(zipf_exponent)) * n_hosts).cast("int")
    return (
        df.withColumn("host_ix", host_ix)
        .select(
            F.concat(
                F.lit("https://host"), F.col("host_ix"), F.lit(".test/p/"), F.col("id")
            ).alias("url"),
            F.concat(F.lit("host"), F.col("host_ix"), F.lit(".test")).alias("host"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(10)).cast("int").alias("priority"),
            F.timestamp_seconds(F.lit(EPOCH.timestamp()) + F.col("id") / 1000.0).alias("created_at"),
            F.col("id").alias("seq"),
        )
    )
