"""Frontier-scheduling scale evidence (VERDICT r5 #2): run the bench.py
scheduling round at 5M and 50M synthetic URLs in ONE session and report
URLs/s + per-round wall at both sizes. The claim under test: nothing in
the per-round hot path is O(backlog) beyond the linear pass itself, so
10x the frontier should cost ~10x the wall (within noise), i.e. URLs/s
roughly flat.

Usage: python tools/frontier_scale_bench.py [n_small] [n_big]
Prints one JSON line; does not touch bench.py (frozen).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from context_crawler_spark.session import get_spark

    spark = get_spark(app_name="frontier-scale-bench", cores=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    out = {"cpus": cpus, "loadavg_start": list(os.getloadavg())}
    for label, n in (("small", n_small), ("big", n_big)):
        spark.sparkContext.setJobDescription(f"frontier {n} URLs")
        t0 = time.time()
        r = bench.bench_frontier(spark, n)
        r["total_wall_sec"] = round(time.time() - t0, 3)
        out[label] = r
    s, b = out["small"], out["big"]
    out["urls_per_sec_ratio_big_over_small"] = round(
        b["sched_urls_per_sec"] / s["sched_urls_per_sec"], 3)
    out["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
