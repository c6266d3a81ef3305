"""Shared plan-shape helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives in fewer partitions.

    A single small parquet file (one row group) scans as ONE task, which
    serializes every downstream JVM pipeline — interpreted HOFs, Python
    stages, window functions — onto one core (round-2 profiling: the
    whole MinHash signature pass ran single-threaded at sf0.1). No-op
    shape at scale: big inputs already exceed default parallelism, so the
    extra shuffle only ever touches small inputs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, F.col(key_col))
    return df
