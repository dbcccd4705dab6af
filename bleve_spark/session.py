"""SparkSession helper tuned for the sandbox (local[N]) while keeping the
settings that matter on a real multi-executor cluster (AQE, Arrow,
shuffle-partition sizing)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "bleve_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # 2x cores: smooths hot-bucket skew and straggler imbalance
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 2 * (cpus if inner == "*" else int(inner))
        else:
            shuffle_partitions = 2 * cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BLEVE_SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # keep input splits fine-grained enough that the pandas-UDF
        # analysis stage parallelizes even over few/small files; on a
        # production cluster with TB-scale inputs these also behave
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.files.openCostInBytes", "131072")
        # >= 4 tasks per slot: avoids 1.1-wave scheduling cliffs on the
        # expensive pandas-UDF stages and smooths stragglers
        .config("spark.sql.files.minPartitionNum", str(4 * cpus))
        # let the docid rank table broadcast in the docs-stage join so the
        # corpus content never shuffles; big rank tables (10^9+ docs) fall
        # back to a shuffle join automatically
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
