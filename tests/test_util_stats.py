"""Checkpoint-stats cap (util._cap_leaf_stats) regression tests.

``Dataset.localCheckpoint`` stores the optimized plan's computed
sizeInBytes in the new LogicalRDD leaf. Iterative operators that
self-join each round's checkpoint square that BigInt every round —
bit-length doubles per round, and ~22 rounds in, the stats visitor OOMs
multiplying 30M-bit integers (hit by dbscan's path-shaped ε-graph at
sf0.01). These tests pin the cap that prevents it.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest  # noqa: F401

from pyspark.sql import functions as F

from osm2lanes_spark.util import _MAX_STAT_BITS, tracked_checkpoint


def _leaf_stat_bits(df) -> int:
    return int(df._jdf.queryExecution().optimizedPlan().stats()
               .sizeInBytes()).bit_length()


def test_small_stats_pass_through(spark):
    """Below the cap, the checkpointed frame keeps its accurate stats
    (broadcast decisions for one-shot checkpoints depend on them)."""
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    ck, _ = tracked_checkpoint(df)
    assert 0 < _leaf_stat_bits(ck) <= _MAX_STAT_BITS
    assert ck.count() == 100


def test_exploded_stats_are_reset(spark):
    """A plan whose computed sizeInBytes exceeds 2^256 (7 one-row
    cross joins: the stat squares per join while the data stays 1 row)
    checkpoints to a leaf with sane default stats, same rows."""
    x = spark.range(1).select(F.lit(1).alias("c0"))
    for i in range(7):
        x = x.crossJoin(x.select(F.col("c0").alias(f"d{i}")).limit(1))
    assert _leaf_stat_bits(x) > _MAX_STAT_BITS  # precondition: exploded
    ck, ids = tracked_checkpoint(x)
    assert _leaf_stat_bits(ck) <= 70  # defaultSizeInBytes ≈ 2^63
    assert ck.count() == 1
    assert ids  # block tracking still reports the checkpoint's RDDs


def test_connected_components_path_graph_converges_fast(spark):
    """The OOM reproducer: a pure path graph maximizes pointer-jump
    rounds. Pre-fix this ran minutes per round by round ~20 and then
    OOM'd the driver; with the cap it completes in bounded time and
    labels every node with the path's minimum id."""
    from osm2lanes_spark.operators.dedup import connected_components

    n = 600
    edges = spark.createDataFrame(
        pd.DataFrame({"left_id": list(range(n - 1)),
                      "right_id": list(range(1, n))}))
    t0 = time.time()
    out = connected_components(edges).toPandas()
    assert time.time() - t0 < 300
    assert len(out) == n
    assert set(out["component"]) == {0}
