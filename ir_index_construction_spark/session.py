"""SparkSession factory with the engine's required confs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ir-index-construction-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """local[N] session tuned for this engine. On a real cluster the same
    confs apply; only master/memory come from spark-submit."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # smaller scan splits: the Python-UDF extraction stage needs at
        # least one task per core even on modestly-sized inputs; at
        # cluster scale files are >=128MB and this only adds tasks, never
        # starves them
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
