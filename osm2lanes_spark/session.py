"""SparkSession factory with the engine's tuned defaults.

Settings chosen for the 100 TB design point (AQE + skew-join handling on,
Arrow batches for the Python stages, partition sizing) but safe on
``local[*]``; tests override parallelism via ``cpus``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "osm2lanes-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # split even a single small parquet file across the cluster: a
        # 1-file scan otherwise serializes every downstream JVM pipeline
        # onto one core (round-2 profiling: the whole minhash signature
        # pass ran single-threaded). Scale-neutral — inputs bigger than
        # minPartitionNum * maxPartitionBytes are unaffected.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
