#!/usr/bin/env python
"""Skewed-source EXACT packing A/B (VERDICT r04 #1 done-criterion).

Same corpus shape as BENCH/packing_skew.py — ONE source holds 90% of the
documents — but for the strict greedy packer. The r04 formulation ran
one ``applyInPandas`` task per source: on 90%-skew the big source
serializes onto one core AND must fit in one pandas frame (at 100 TB a
90 TB "crawl" source is not a slow task, it is an OOM). The r05
formulation chases pack boundaries over the distributed prefix sums
(interval-bucket join → per-partition numpy chain compression → pointer
doubling over segment exits), so its latency is bounded by partition
size and doubling rounds, never by key size; memory is bounded by the
range partition everywhere.

Note on reading the numbers: the sequential side is a tight numpy/python
loop on one core — at small corpus sizes its absolute time is low, so
the distributed side's round structure (log2(segments-per-key) join
rounds + two Arrow stages) only pulls ahead once the biggest key is
large enough. The A/B reports both times at increasing sizes to show
the crossover; the 100 TB argument is the shape (per-key task ∝ key
size and key-sized memory vs rounds ∝ log and partition-sized memory),
which the measured slope demonstrates.

Usage: python BENCH/packing_exact_skew.py [n_docs ...] (default 2M 8M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm2lanes_spark.operators.packing import (
    _sequential_greedy_reference, contiguous_packs)
from osm2lanes_spark.session import get_spark

SIZES = [int(x) for x in sys.argv[1:]] or [2_000_000, 8_000_000]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def corpus(spark, n):
    # 90% "crawl", the rest spread over 9 small sources
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.pmod("id", F.lit(10)) < 9, "crawl")
                    .otherwise(F.concat(F.lit("s"), F.pmod("id", F.lit(10))))
                    .alias("source"),
                    (F.pmod(F.xxhash64("id"), F.lit(900)) + 50)
                    .alias("n_tokens"))
            .repartition(2 * CPUS).persist())


def timed(label, out_df, trials=3):
    best, got = None, None
    for _ in range(trials):
        t0 = time.perf_counter()
        got = (out_df.groupBy("source", "pack_id")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("n_tokens").alias("tok"))
               .agg(F.count(F.lit(1)), F.sum("n"), F.sum("tok"))
               .collect()[0])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s  (packs={got[0]}, docs={got[1]})",
          flush=True)
    return best, (got[0], got[1], got[2])


def main():
    spark = get_spark("packing-exact-skew", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    for n in SIZES:
        docs = corpus(spark, n)
        docs.count()
        print(f"--- {n} docs, 90% skew, local[{CPUS}], budget=2048")
        par, chk_a = timed(
            "distributed boundary chase (exact=True)  ",
            contiguous_packs(docs, "n_tokens", budget=2048,
                             part_col="source", exact=True))
        seq, chk_b = timed(
            "sequential one-task-per-key applyInPandas",
            _sequential_greedy_reference(docs, "n_tokens", 2048,
                                         "doc_id", "source"))
        assert chk_a == chk_b, (chk_a, chk_b)  # identical packing
        print(f"distributed/sequential at {n}: {seq / par:.2f}x "
              f"(>1 means distributed wins)", flush=True)
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
