#!/usr/bin/env python
"""Skewed-source packing A/B (VERDICT r03 #1 done-criterion).

Builds a corpus where ONE source holds 90% of the documents (the common
LLM-pipeline shape: "crawl" dwarfs "books"/"code"), then times
``contiguous_packs`` (range-partitioned two-pass prefix sum) against the
naive one-window formulation (``Window.partitionBy(source)``), which
serializes the big source into a single task. Results → stdout; curated
numbers live in BENCH/BASELINE.md.

Usage: python BENCH/packing_skew.py [n_docs]  (default 2_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from osm2lanes_spark.operators.packing import contiguous_packs
from osm2lanes_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def naive_window_packs(df, token_col, budget, order_col, part_col):
    w = (Window.partitionBy(part_col).orderBy(F.col(order_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    preceding = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("pack_id", F.floor(preceding / F.lit(budget)))


def main():
    spark = get_spark("packing-skew", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # 90% "crawl", the rest spread over 9 small sources
    docs = (spark.range(N)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.pmod("id", F.lit(10)) < 9, "crawl")
                    .otherwise(F.concat(F.lit("s"), F.pmod("id", F.lit(10))))
                    .alias("source"),
                    (F.pmod(F.xxhash64("id"), F.lit(900)) + 50)
                    .alias("n_tokens"))
            .repartition(2 * CPUS).persist())
    docs.count()

    def timed(label, out_df):
        best = None
        for _ in range(3):
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

    two_pass, chk_a = timed(
        "two-pass (range-partitioned prefix sum)",
        contiguous_packs(docs, "n_tokens", budget=2048, part_col="source"))
    naive, chk_b = timed(
        "naive (one window per source)        ",
        naive_window_packs(docs, "n_tokens", 2048, "doc_id", "source"))
    assert chk_a == chk_b, (chk_a, chk_b)  # identical packing
    print(f"speedup on 90%-skew: {naive / two_pass:.2f}x "
          f"({N} docs, local[{CPUS}])")
    spark.stop()


if __name__ == "__main__":
    main()
