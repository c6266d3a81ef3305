"""Bucketed co-located joins produce shuffle-free plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2lanes_spark.operators.bucketing import bucketed_join, write_bucketed


def test_bucketed_join_no_shuffle(spark):
    a = spark.range(10000).select(F.col("id").alias("k"),
                                  (F.col("id") * 2).alias("va"))
    b = spark.range(10000).select(F.col("id").alias("k"),
                                  (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", "k", buckets=8)
    write_bucketed(b, "bkt_b", "k", buckets=8)
    joined = bucketed_join(spark, "bkt_a", "bkt_b", "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert joined.count() == 10000
    row = joined.where(F.col("k") == 7).collect()[0]
    assert row["va"] == 14 and row["vb"] == 21


def test_streaming_dedup(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import types as T

    from osm2lanes_spark.streaming.jobs import stream_dedup

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        text = f"document number {i % 40}"  # 40 distinct, 2.5x duplicated
        rows.append((i, base + dt.timedelta(minutes=i), text))
    src = str(tmp_path / "in")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ])
    spark.createDataFrame(rows, schema).write.parquet(src)
    q = stream_dedup(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
                     schema, watermark="10 hours")
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 40
    texts = sorted(r["text"] for r in out.collect())
    assert texts == sorted(f"document number {i}" for i in range(40))
