"""Deterministic dataset sampling / splitting for training pipelines.

At 100 TB a train/val/test split must be (a) a pure function of the row
id — re-runs, backfills and late-arriving shards land in the same split
with no coordination — and (b) computable inside whole-stage codegen.
``hash_split`` derives a uniform [0, 1) variate from the md5 of the id
(md5 rather than xxhash64 so an external system — or the DuckDB oracle —
can reproduce assignments bit-for-bit) and thresholds it by the
cumulative weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(id_col: Column) -> Column:
    """Deterministic uniform [0, 1) from an id: the first 8 md5 hex chars
    as a 32-bit integer over 2^32. JVM-side, reproducible anywhere."""
    return (F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
            .cast("double") / F.lit(float(1 << 32)))


def hash_split(df: DataFrame, id_col: str = "doc_id",
               splits: dict[str, float] | None = None,
               out: str = "split") -> DataFrame:
    """Assign every row a split label by deterministic id hash.

    ``splits`` maps label → weight (normalized internally); iteration
    order fixes the threshold order, so pass an explicit dict. Default
    80/10/10 train/val/test.
    """
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(splits.values())
    u = hash_uniform(F.col(id_col))
    expr = None
    acc = 0.0
    labels = list(splits)
    for name in labels[:-1]:
        acc += splits[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(labels[-1]) if expr is None
            else expr.otherwise(labels[-1]))
    return df.withColumn(out, expr)
