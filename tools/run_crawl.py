"""spark-submit entrypoint for the frontier scheduler.

Cluster usage (the north rule's deployment shape):

    python tools/make_dist.py        # → dist/context_crawler_spark.zip
    spark-submit \\
        --master <cluster> \\
        --py-files dist/context_crawler_spark.zip \\
        tools/run_crawl.py \\
        --entry https://docs.example.test/ \\
        --match 'https://docs.example.test/**' \\
        --exclude '**/changelog' \\
        --selector article \\
        --pages /data/pages_parquet \\
        --store /data/crawl-state \\
        --politeness-budget 64 --host-crawl-delay 5

Local smoke: same command with ``python`` instead of spark-submit (the
session factory falls back to local[*]). The store directory is the
resumable checkpoint: re-running the identical command continues a killed
crawl from its last committed round.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _is_parquet_dataset(path: str) -> bool:
    """Detect parquet datasets POSITIVELY: Spark-written rule tables always
    carry _SUCCESS / part-*.parquet / .crc sidecars, so "contains a
    non-.parquet entry" would misdetect them as robots.txt dirs."""
    if not os.path.isdir(path):
        return path.endswith(".parquet")
    names = os.listdir(path)
    return any(
        n == "_SUCCESS" or (n.startswith("part-") and ".parquet" in n)
        or n.endswith(".parquet")
        for n in names
    )


def _read_robots_txt_dir(path: str) -> dict[str, str]:
    """{host: robots.txt text} from a directory of <host>[.txt] files,
    skipping hidden files and Spark sidecars."""
    texts = {}
    for n in sorted(os.listdir(path)):
        if n.startswith((".", "_")) or n.endswith(".crc"):
            continue
        host = n[:-4] if n.endswith(".txt") else n
        with open(os.path.join(path, n)) as f:
            texts[host] = f.read()
    return texts


def main() -> None:
    p = argparse.ArgumentParser(description="Run a crawl job")
    p.add_argument("--job", help="named job from the registry (may be multi-config)")
    p.add_argument("--entry")
    p.add_argument("--match", action="append", default=[])
    p.add_argument("--exclude", action="append", default=[])
    p.add_argument("--selector", default="body")
    p.add_argument("--pages",
                   help="parquet/Iceberg path of the Common-Crawl-style pages "
                        "table, or a directory of .warc/.warc.gz files")
    p.add_argument("--store", required=True, help="snapshot-store directory")
    p.add_argument("--politeness-budget", type=int, default=2 ** 31 - 1)
    p.add_argument("--host-crawl-delay", type=int, default=None)
    p.add_argument("--max-pages", type=int, default=None)
    p.add_argument("--max-depth", type=int, default=None)
    p.add_argument("--max-rounds", type=int, default=1000)
    p.add_argument("--robots", default=None,
                   help="optional robots rules: a parquet of (host, rule_type, "
                        "path_prefix) OR a directory of robots.txt files named "
                        "<host>[.txt] (parsed per RFC 9309, Crawl-delay honored)")
    p.add_argument("--artifacts", action="store_true",
                   help="generate llms.txt/chunks/embeddings after the crawl")
    p.add_argument("--warc-out", default=None,
                   help="directory to re-emit the crawled pages as CC-native "
                        ".warc.gz files (one gzip member per record)")
    p.add_argument("--cdx-out", default=None,
                   help="directory for a CDX capture index over the crawled "
                        "pages (SURT-keyed sorted shards + cluster.idx)")
    p.add_argument("--soft404-report", action="store_true",
                   help="after the crawl, flag HTTP-200 error pages "
                        "(traps.soft_404_signals) over the extracted "
                        "output and report the count")
    p.add_argument("--demo", action="store_true",
                   help="run on the built-in tiny synthetic site")
    args = p.parse_args()
    if args.demo:
        args.entry = args.entry or "https://site0.test/"
        args.match = args.match or ["https://site0.test/**"]
        args.selector = "article" if args.selector == "body" else args.selector
    elif not args.job and not (args.entry and args.pages):
        p.error("--entry and --pages are required (or use --job / --demo)")

    from context_crawler_spark.config import CrawlConfig
    from context_crawler_spark.plans.scheduler import CrawlScheduler
    from context_crawler_spark.session import get_spark
    from context_crawler_spark.state import SnapshotStore

    spark = get_spark(app_name="crawl")
    spark.sparkContext.setLogLevel("WARN")
    if args.demo:
        from context_crawler_spark.sources.synthetic_web import tiny_site

        pages = tiny_site(spark)
    else:
        if args.pages.rstrip("/").endswith((".warc", ".warc.gz")) or any(
            n.endswith((".warc", ".warc.gz"))
            for n in (os.listdir(args.pages) if os.path.isdir(args.pages) else [])
        ):
            from context_crawler_spark.sources.warc import read_warc

            pages = read_warc(spark, args.pages)
        else:
            pages = spark.read.parquet(args.pages)
    robots = None
    host_delays = None
    if args.robots:
        if _is_parquet_dataset(args.robots):
            robots = spark.read.parquet(args.robots)
        else:
            # directory of robots.txt files named <host> or <host>.txt →
            # parse (RFC 9309) into rules + per-host Crawl-delay tables
            from context_crawler_spark.functions.robots import robots_tables

            robots, host_delays = robots_tables(
                spark, _read_robots_txt_dir(args.robots)
            )

    if args.job:
        # named (possibly multi-config) job → the queue worker path, the
        # reference's `cli single/batch <job>` analog
        from context_crawler_spark.plans.jobs import JobWorker
        from context_crawler_spark.registry import get_job_configs

        worker = JobWorker(spark, SnapshotStore(args.store), pages,
                           generate_artifacts=args.artifacts)
        worker.enqueue(get_job_configs(args.job))
        results = worker.run_until_drained()
        print(json.dumps({
            "job": args.job,
            "results": [r.__dict__ for r in results],
            "stats": worker.stats(),
        }))
        return

    cfg = CrawlConfig(
        entry=args.entry,
        match=args.match or "**",
        exclude=args.exclude or None,
        selector=args.selector,
        politeness_budget=args.politeness_budget,
        host_crawl_delay_s=args.host_crawl_delay,
        max_pages=args.max_pages,
        max_depth=args.max_depth,
        respect_robots=robots is not None,
    )
    store = SnapshotStore(args.store)
    eng = CrawlScheduler(spark, store, cfg, pages, host_delays=host_delays)
    meta = eng.run(max_rounds=args.max_rounds, robots=robots)
    if args.artifacts and meta.get("fetched_total"):
        from context_crawler_spark.plans.artifacts import ArtifactService

        ArtifactService(spark, store).generate(eng.pages_out(), store.head_id())
    n_warc = None
    if args.warc_out and meta.get("fetched_total") and pages is not None:
        from context_crawler_spark.sources.warc import write_warc_files

        crawled = pages.join(
            eng.pages_out().select("url").distinct(), "url"
        ).select("url", "warc_ts", "html")
        n_warc = write_warc_files(crawled, args.warc_out)
    cdx = None
    if args.cdx_out and meta.get("fetched_total") and pages is not None:
        from context_crawler_spark.sources.cdx import cdx_index, write_cdx_shards

        crawled = pages.join(
            eng.pages_out().select("url").distinct(), "url"
        ).select("url", "warc_ts", "html")
        cdx = write_cdx_shards(cdx_index(crawled), args.cdx_out)
    soft404 = None
    if args.soft404_report and meta.get("fetched_total"):
        from pyspark.sql import functions as F

        from context_crawler_spark.operators.traps import soft_404_signals

        po = eng.pages_out().withColumn("status", F.lit(200))
        soft404 = (
            soft_404_signals(po).filter("soft_404").count()
        )
    print(json.dumps({
        "job": cfg.name,
        "rounds": meta.get("round"),
        "fetched": meta.get("fetched_total"),
        "finished": meta.get("finished"),
        "reason": meta.get("finish_reason"),
        "snapshot": store.head_id(),
        "warc_files": n_warc,
        "cdx": cdx,
        "soft_404_flagged": soft404,
        "metrics_tail": eng.metrics()[-3:],
    }))


if __name__ == "__main__":
    main()
