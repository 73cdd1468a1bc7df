"""spark-submit entrypoint for the Common-Crawl-native export job.

Takes a pages table (url, warc_ts, html binary) — the engine's crawl
output (plans/scheduler dataset sink, or sources/warc.read_warc of an
existing archive) — and writes the full CC distribution layout in ONE
Spark application:

    warc/  part-*.warc.gz       raw response records    (sources/warc)
    wet/   part-*.warc.wet.gz   extracted-text records  (conversion)
    wat/   part-*.warc.wat.gz   title+links metadata    (canonical JSON)
    cdx/   cdx-*.gz + cluster.idx  sorted capture index (sources/cdx)

Extraction (title/text/links) runs ONCE via the fused Arrow UDF and feeds
both WET and WAT — no second DOM parse; the four sinks each add exactly
one exchange (their own range partitioning) over the shared extracted
frame, which is persisted so the scan+extract cost is paid once.

Cluster usage:

    spark-submit --master <cluster> \\
        --py-files dist/context_crawler_spark.zip \\
        tools/export_cc.py --input /data/pages --output /data/cc \\
        --selector article --target-mb 256

Local smoke: python tools/export_cc.py --demo

Prints ONE JSON line: records in, files written per format.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="pages parquet (url, warc_ts, html)")
    ap.add_argument("--output", help="export root (warc/wet/wat/cdx subdirs)")
    ap.add_argument("--demo", action="store_true",
                    help="run on a synthetic site into a temp dir")
    ap.add_argument("--selector", default="body",
                    help="extraction scope selector for WET text")
    ap.add_argument("--target-mb", type=int, default=256,
                    help="target uncompressed payload per WARC file")
    ap.add_argument("--cdx-shards", type=int, default=8)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from context_crawler_spark.functions.udfs import make_extract_page_udf
    from context_crawler_spark.session import get_spark
    from context_crawler_spark.sources.cdx import cdx_index, write_cdx_shards
    from context_crawler_spark.sources.warc import (
        write_warc_files, write_wat_files, write_wet_files,
    )

    spark = get_spark(app_name="cc-export", cores=args.cores)

    if args.demo:
        import tempfile

        from context_crawler_spark.sources.synthetic_web import tiny_site

        out_root = args.output or tempfile.mkdtemp(prefix="cc_export_")
        pages = tiny_site(spark).select("url", "warc_ts", "html")
    else:
        if not args.input or not args.output:
            ap.error("--input and --output are required without --demo")
        out_root = args.output
        pages = spark.read.parquet(args.input).select(
            "url", "warc_ts", F.col("html").cast("binary").alias("html"))

    page_udf = make_extract_page_udf(args.selector)
    extracted = (
        pages.withColumn("__p", page_udf("html", "url"))
        .select(
            "url", "warc_ts", "html",
            F.col("__p.title").alias("title"),
            F.col("__p.text").alias("text"),
            F.transform(F.col("__p.links"), lambda l: l["href"])
            .alias("links"),
        )
        .persist()
    )
    n_records = extracted.count()  # materialize once; sinks reuse

    n_warc = write_warc_files(
        extracted.select("url", "warc_ts", "html"),
        os.path.join(out_root, "warc"), target_mb=args.target_mb)
    n_wet = write_wet_files(
        extracted.select("url", "warc_ts", "text"),
        os.path.join(out_root, "wet"))
    n_wat = write_wat_files(
        extracted.select("url", "warc_ts", "title", "links"),
        os.path.join(out_root, "wat"))
    cdx_meta = write_cdx_shards(
        cdx_index(extracted), os.path.join(out_root, "cdx"),
        n_shards=args.cdx_shards)
    extracted.unpersist()

    print(json.dumps({
        "records": n_records,
        "warc_files": n_warc,
        "wet_files": n_wet,
        "wat_files": n_wat,
        "cdx_shards": cdx_meta.get("n_shards"),
        "output": out_root,
    }))


if __name__ == "__main__":
    main()
