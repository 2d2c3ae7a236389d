"""SparkSession factory with the engine's performance profile.

Single place where the scale knobs live so tests / bench / CLI all run the
same configuration (AQE on, Arrow on, zstd parquet — SURVEY.md §4.2/§4.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lash_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # Under spark-submit the launcher already created the JVM gateway
    # (PYSPARK_GATEWAY_PORT) carrying the submit conf: spark.master
    # (yarn / k8s / standalone) AND any --conf sizing like
    # spark.sql.shuffle.partitions. Builder .config()/.master() values win
    # over submit conf, so forcing driver-cpu-derived defaults there would
    # silently collapse a 1000-executor job's parallelism onto the driver's
    # core count. Only apply local-mode defaults for plain-python launches;
    # explicit arguments always win.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted:
        master = f"local[{cores}]"
    # shuffle partitions ∝ cores so both local[8] and local[32] saturate
    # (scaling-efficiency evidence, BASELINE.md)
    nshuffle = shuffle_partitions
    if nshuffle is None and not submitted:
        nshuffle = max(2 * cores, 32)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions toward the advisory SIZE instead
        # of stopping at default parallelism (parallelismFirst=true, the
        # Spark default, keeps 100 KB partitions when parallelism is 256 —
        # hundreds of near-empty tasks per stage whose scheduling overhead
        # dominates every small-to-mid shuffle; guide §2.2). Size-targeted
        # coalescing is scale-adaptive by construction: a 100 TB shuffle has
        # every partition above the advisory size and is untouched, while a
        # 100 MB shuffle collapses to a handful of real tasks.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # allow shuffled-hash join when the per-partition build side fits
        # (guide §3.1/§9): the verify/candidate equi-joins carry big array
        # payloads on the probe side, and SMJ would sort those bytes; the
        # build sides (id->set tables) are small per partition. Skew-heavy
        # buckets are already handled upstream by the explicit salt tiers.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("LASH_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master is not None:
        b = b.master(master)
    if nshuffle is not None:
        b = b.config("spark.sql.shuffle.partitions", str(nshuffle)).config(
            "spark.default.parallelism", str(nshuffle)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
