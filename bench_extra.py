#!/usr/bin/env python
"""Per-query measurement harness for optimization work (guide §1).

``bench.py`` is FROZEN for driver measurement; this file is the
playground: it times INDIVIDUAL queries with the same methodology as
bench.py's aux loop (``df.agg(count(*)).collect()``), optionally via the
noop sink (full-column materialization, guide §1.4), captures
``.explain("formatted")`` plans, and labels jobs for the UI.

Usage:
    python bench_extra.py fuzzy_names jaccard_prefix        # time legs
    python bench_extra.py --plans fuzzy_names               # dump plan
    python bench_extra.py --noop fuzzy_names                # noop sink
    python bench_extra.py --trials 3 --out /tmp/x.json ...  # json out

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_df(spark, name: str, sf_dir: str):
    """Build the DataFrame for a leg, replicating bench.py's special
    bench-only legs (ann_ivf_nprobe4, contamination_hash,
    chunk_pack_chain) so their numbers are comparable."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E

    if name == "ann_ivf_nprobe4":
        from osm2lanes_spark.operators.similarity import ivf_topk
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .withColumn("embedding",
                           F.col("embedding").cast("array<double>")))
        ivf_queries = (emb.where(F.col("vec_id") < 10)
                       .select(F.col("vec_id").alias("query_id"),
                               "embedding"))
        return ivf_topk(ivf_queries, emb, k=5, n_centroids=16, nprobe=4)
    if name == "contamination_hash":
        from osm2lanes_spark.operators.profiling import ngram_overlap
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return ngram_overlap(d.where(F.col("doc_id") % 97 != 0),
                             d.where(F.col("doc_id") % 97 == 0),
                             n=3, broadcast_reference=False)
    if name == "chunk_pack_chain":
        from osm2lanes_spark.operators.packing import (
            chunk_documents, contiguous_packs, pack_texts)
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        chunks = chunk_documents(d, chunk_tokens=64, overlap_tokens=8)
        items = chunks.withColumn(
            "item_id",
            F.concat_ws("#", F.col("doc_id").cast("string"),
                        F.col("chunk_idx").cast("string")))
        packed = contiguous_packs(items, "n_chunk_tokens", budget=2048,
                                  order_col="item_id")
        return pack_texts(packed, text_col="chunk_text",
                          order_col="item_id")
    return E.queries()[name](spark, sf_dir)


def time_leg(spark, name: str, sf_dir: str, trials: int = 3,
             noop: bool = False) -> list[float]:
    from pyspark.sql import functions as F
    out = []
    for i in range(trials):
        spark.sparkContext.setJobDescription(f"{name} trial {i}")
        t0 = time.perf_counter()
        df = build_df(spark, name, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.agg(F.count("*")).collect()
        out.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("legs", nargs="+")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", action="store_true",
                    help="dump explain('formatted') instead of timing")
    ap.add_argument("--plan-dir", default="plans/r07")
    ap.add_argument("--plan-suffix", default="",
                    help="e.g. _before / _after")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from osm2lanes_spark.session import get_spark
    spark = get_spark("osm2lanes-bench-extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, object] = {}
    if args.plans:
        os.makedirs(args.plan_dir, exist_ok=True)
        for name in args.legs:
            df = build_df(spark, name, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.plan_dir,
                                f"{name}{args.plan_suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            n_ex = plan.count("Exchange")
            print(f"{name}: plan -> {path} (Exchange x{n_ex})")
            results[name] = {"plan": path, "exchanges": n_ex}
    else:
        for name in args.legs:
            ts = time_leg(spark, name, SF_DIR, trials=args.trials,
                          noop=args.noop)
            results[name] = ts
            print(f"{name}: min={min(ts)} trials={ts}", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "cpus": CPUS, "noop": args.noop,
                       "results": results}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
