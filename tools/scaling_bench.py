"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors).

No real cluster exists in the sandbox, so per BASELINE.md the evidence is
the SAME job at two local parallelism levels — each in its own process
(fresh JVM, fixed cores), like two spark-submit runs:

  * strong scaling: same input at local[N] and local[4N]
  * weak scaling:   input scaled 4× alongside cores (the regime a 10^10-URL
    frontier actually runs in: more executors ⇒ more frontier per round)

The measured job is one full crawl-round hot path: synthetic Zipf frontier
(JVM-side datagen) → url_hash identity → salted politeness budget →
claim-order batch emission (distributed range-sort zipWithIndex) →
JVM-synthesized page html → fused title/text/links extraction (Arrow UDF)
→ token counts → noop sink. That is "URLs scheduled + extracted".

Usage:
  python tools/scaling_bench.py              # orchestrate, print summary JSON
  python tools/scaling_bench.py --worker C N # one measured run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_URLS = int(os.environ.get("SCALING_BASE_URLS", 2_400_000))
N_SMALL = int(os.environ.get("SCALING_N_SMALL", 2))
N_BIG = int(os.environ.get("SCALING_N_BIG", 8))


def pipeline(spark, n_urls: int, cores: int) -> dict:
    from pyspark.sql import functions as F

    from context_crawler_spark.functions.udfs import make_extract_page_udf
    from context_crawler_spark.operators.ordering import emit_fetch_batch
    from context_crawler_spark.operators.politeness import apply_politeness
    from context_crawler_spark.sources.synthetic_web import synthetic_frontier

    n_hosts = max(1000, n_urls // 500)
    frontier = synthetic_frontier(
        spark, n_urls, n_hosts=n_hosts, zipf_exponent=1.2, partitions=cores * 2
    ).withColumn("url_hash", F.xxhash64("url")).persist()
    n_in = frontier.count()  # materialize input outside the measurement

    debug = os.environ.get("SCALING_DEBUG")
    t0 = time.time()
    polite = apply_politeness(frontier, budget_per_host=100)
    batch = emit_fetch_batch(polite)
    if debug:
        print(f"DEBUG sched done {time.time()-t0:.2f}s parts={batch.rdd.getNumPartitions()}", flush=True)
    # fetch stand-in: synthesize page html JVM-side (no Python in datagen)
    body = F.concat(
        F.lit("<html><head><title>Page "), F.col("seq").cast("string"),
        F.lit('</title></head><body><nav><a href="/docs">docs</a>'
              '<a href="/api">api</a></nav><article><h1>Heading</h1><p>'),
        F.repeat(F.concat(F.lit("token words for "), F.col("url"), F.lit(" ")), 40),
        F.lit('</p><p>See <a href="'), F.col("url"), F.lit('/next">next</a> and <a href="'),
        F.col("url"), F.lit('/prev">prev</a>.</p></article></body></html>'),
    )
    pages = batch.withColumn("html", F.encode(body, "utf-8"))
    page_udf = make_extract_page_udf("article")
    extracted = pages.withColumn("__page", page_udf("html", "url")).select(
        "url", "url_hash", "fetch_order",
        F.col("__page.title").alias("title"),
        F.col("__page.text").alias("text"),
        F.size("__page.links").alias("n_links"),
        F.col("__page.n_tokens").alias("n_tokens"),
    )
    if debug:
        t1 = time.time()
        extracted.write.mode("overwrite").format("noop").save()
        print(f"DEBUG extract {time.time()-t1:.2f}s", flush=True)
    else:
        extracted.write.mode("overwrite").format("noop").save()
    dt = time.time() - t0
    n_batch = batch.count()
    frontier.unpersist()
    return {
        "cores": cores, "n_urls": n_in, "n_scheduled_extracted": n_batch,
        "sec": round(dt, 3),
        "urls_per_sec": round(n_in / dt, 1),
        "pages_per_sec": round(n_batch / dt, 1),
    }


def worker(cores: int, n_urls: int) -> None:
    from context_crawler_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}", cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = pipeline(spark, n_urls, cores)
    print("RESULT " + json.dumps(res))
    spark.stop()


def run_one(cores: int, n_urls: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(n_urls)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    small = run_one(N_SMALL, BASE_URLS)
    big_strong = run_one(N_BIG, BASE_URLS)
    big_weak = run_one(N_BIG, BASE_URLS * (N_BIG // N_SMALL))
    ratio = N_BIG / N_SMALL
    strong_eff = big_strong["urls_per_sec"] / (small["urls_per_sec"] * ratio)
    weak_eff = big_weak["urls_per_sec"] / (small["urls_per_sec"] * ratio)
    print(json.dumps({
        "base_urls": BASE_URLS,
        "small": small,
        "big_strong": big_strong,
        "big_weak": big_weak,
        "strong_scaling_efficiency": round(strong_eff, 3),
        "weak_scaling_efficiency": round(weak_eff, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
