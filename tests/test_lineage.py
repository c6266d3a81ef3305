"""Checkpoint/resume + per-partition lineage metrics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm2lanes_spark.plans import lineage as L


def test_checkpoint_and_resume(spark, tmp_path):
    path = str(tmp_path / "stage1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(1000).withColumn("v", F.col("id") * 2)

    df1 = L.resumable(spark, path, build)
    assert df1.count() == 1000
    assert calls["n"] == 1
    # second call resumes from the checkpoint — build not re-run
    df2 = L.resumable(spark, path, build)
    assert df2.count() == 1000
    assert calls["n"] == 1
    # lineage metrics exist and sum to the row count
    metrics = spark.read.parquet(os.path.join(path, L.LINEAGE_DIR))
    assert sum(r["rows"] for r in metrics.collect()) == 1000
    rep = L.skew_report(path, spark)
    assert rep["median"] >= 0


def test_incomplete_checkpoint_rebuilt(spark, tmp_path):
    path = str(tmp_path / "stage2")
    spark.range(10).write.parquet(path)  # data present but no manifest
    assert not L.checkpoint_complete(path)
    df = L.resumable(spark, path, lambda: spark.range(77))
    assert df.count() == 77
    assert L.checkpoint_complete(path)
