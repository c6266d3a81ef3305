"""Bucketed tables: shuffle-free co-located joins.

At 100 TB, repeated joins on the same key (doc_id, cell prefix) should
not re-shuffle per query. Writing both sides bucketed by the join key
pre-co-locates them: Spark's scan exposes the bucketing as a hash
partitioning, and the sort-merge join runs with **zero Exchange** on
either side (asserted in tests). The same applies to groupBy on the
bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 16,
                   sort: bool = True) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale warehouse dir from a previous session is untracked by the
    # in-memory catalog — clear it so saveAsTable can recreate the table
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = warehouse.removeprefix("file:") + "/" + table.lower()
    shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table, format="parquet")


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Sort-merge join two same-bucketed tables — no shuffle on either side.

    The merge hint keeps the planner from broadcasting small inputs, so
    the plan demonstrates the bucketed shape that matters at scale: both
    scans expose their bucketing as hash partitioning and the join runs
    without any ``Exchange hashpartitioning``.
    """
    return (spark.table(left_table).hint("merge")
            .join(spark.table(right_table).hint("merge"), key))
