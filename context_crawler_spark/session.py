"""SparkSession factory tuned for the frontier workload.

Defaults target the sandbox (single JVM, ``local[N]``) but every setting is
the one you would ship to a 1000-executor cluster: AQE on (runtime skew-join
splitting + shuffle-partition coalescing), Arrow on (all our Python surface
is pandas-UDF batches, never per-row), and shuffle partitions sized to the
parallelism at hand instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "context-crawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or all local cores. On a real
    cluster you would drop ``master`` and submit with ``spark-submit
    --py-files``; nothing else here changes.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        # 2x cores keeps every slot busy through AQE coalescing without
        # creating thousands of tiny shuffle files at sandbox scale.
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds pandas-UDF memory per batch; 10k rows of
        # ~50 KB html ≈ 500 MB worst case is too big for wide html columns,
        # so cap lower — extraction UDFs re-batch internally anyway.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local[N] runs every task slot inside the driver JVM, so this IS
        # the executor-fleet memory: 8g across 32 concurrent tasks left
        # ~150 MB of execution memory each and large aggregations spilled
        # multi-GiB to disk (r6 profile: containment's pair dedup alone
        # spilled 11 GiB). 32g default in the 128 GiB sandbox; override
        # with $SPARK_DRIVER_MEM. On a real cluster the driver goes back
        # to being a coordinator and executor memory is sized per node.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
