"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same settings (AQE, shuffle
partitions, Arrow) are what we'd ship to a 1000-executor cluster, where
``spark.sql.shuffle.partitions`` would be raised to ~2-3× total cores
and AQE coalesces the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "job_post_similarity_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # Local mode: ~cores. On a real cluster this is 2-3x total cores,
        # with AQE coalescing small post-shuffle partitions.
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-optimize CACHED plans too (off by default): every
        # persisted fixture/signature/word table otherwise pins the
        # static shuffle-partition count, so each downstream job over
        # a small cached relation schedules `shuffle.partitions` tasks
        # regardless of data size. AQE sizes the cached layout by
        # BYTES (advisory/min partition size), which is the
        # scale-adaptive behavior we want on a cluster as much as
        # locally — iterative drivers (EM trainers, Lloyd, NN-Descent)
        # measured 20-39% faster with no result change (partitioning
        # never feeds a value: ranks come from total orders, sums are
        # integer/decimal).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # has no native type for: read as long, convert at the scan
        # (sources.io.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
