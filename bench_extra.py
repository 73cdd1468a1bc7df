"""Optimization-round helper bench (guide §1.4): time individual declared
queries with the noop sink, capture .explain("formatted") plans, and label
jobs so the UI/eventlog attributes stages to queries.

NOT the driver bench — bench.py stays frozen. Usage:

  python bench_extra.py --sf-dir /root/testdata/sf1.0 --repeats 2 \
      --plans plans/r06 --suffix before embedding_near_dup containment_pairs

Prints one JSON line: {"sf_dir": ..., "queries": {name: [s1, s2, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="before",
                    help="plan file suffix: <name>_<suffix>.txt")
    ap.add_argument("--ui", action="store_true",
                    help="enable the Spark UI for stage inspection")
    args = ap.parse_args()

    from context_crawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    extra = {"spark.ui.showConsoleProgress": "false"}
    if args.ui:
        extra["spark.ui.enabled"] = "true"
    spark = get_spark(app_name="cc-spark-bench-extra", cores=cpus,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    # same warmup as bench.py so first-query numbers are comparable
    from pyspark.sql import functions as F
    from context_crawler_spark.functions.udfs import quality_score_udf
    spark.range(100_000).select(F.xxhash64("id")).write.mode(
        "overwrite").format("noop").save()
    spark.range(1000).select(
        quality_score_udf(F.lit("warm up the python workers"))
    ).write.mode("overwrite").format("noop").save()

    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            p = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(p, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.mode("overwrite").format(
                "noop").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"## {name}: {samples}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
