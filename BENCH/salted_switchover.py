#!/usr/bin/env python
"""Salted-containment switchover evidence (VERDICT r02 next-round #9).

Measures `containment_join` strategy='broadcast' vs 'salted' against a
SYNTHETIC polygon dim grown past the broadcast threshold, with a skewed
point set (a hot polygon holding ~30% of all points), and demonstrates
`plans.lineage.skew_report` flagging the hot cell under the natural
(cell) partitioning vs the spread under (cell, salt).

Run: python BENCH/salted_switchover.py  → one JSON line; curated analysis
goes in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = 200_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def square(cx: float, cy: float, half: float) -> np.ndarray:
    return np.array([[cx - half, cy - half], [cx + half, cy - half],
                     [cx + half, cy + half], [cx - half, cy + half]],
                    np.float64)


def synth_polygons(n: int) -> dict:
    """n small squares tiled over [-170,170]x[-80,80] (row-major)."""
    cols = int(np.ceil(np.sqrt(n * 2)))
    rows = int(np.ceil(n / cols))
    out = {}
    k = 0
    for r in range(rows):
        for c in range(cols):
            if k >= n:
                return out
            cx = -170 + (c + 0.5) * 340.0 / cols
            cy = -80 + (r + 0.5) * 160.0 / rows
            out[f"p{k:06d}"] = square(cx, cy, min(340.0 / cols,
                                                  160.0 / rows) * 0.45)
            k += 1
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from osm2lanes_spark.plans.lineage import skew_report, write_checkpoint
    from osm2lanes_spark.session import get_spark
    from osm2lanes_spark.spatial.joins import (containment_join,
                                               polygon_cells_pdf, with_cell)

    spark = get_spark("salted-switchover", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    level = 8

    # skewed points: 30% inside one hot polygon, the rest uniform.
    # Deterministic integer-hash jitter — no RNG state.
    pts = (spark.range(N_POINTS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit(0.0)
               + (F.pmod(F.xxhash64("id"), 1000) / 1000.0 - 0.5) * 0.5)
        .otherwise(F.pmod(F.xxhash64("id"), 3400) / 10.0 - 170.0).alias("lon"),
        F.when(F.col("id") % 10 < 3, F.lit(0.0)
               + (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 1000.0 - 0.5) * 0.5)
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), 1600) / 10.0 - 80.0)
        .alias("lat"))).persist()
    pts.count()

    results = {"n_points": N_POINTS, "level": level, "legs": []}
    for n_poly in (1_000, 20_000, 80_000):
        polys = synth_polygons(n_poly)
        dim_rows = len(polygon_cells_pdf(polys, level))
        leg = {"n_poly": n_poly, "dim_rows": dim_rows}
        for strategy in ("broadcast", "salted"):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                out = containment_join(pts, polys, level=level,
                                       strategy=strategy)
                n_matched = out.where(F.col("key").isNotNull()).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            leg[strategy] = round(best, 3)
            leg["n_matched"] = n_matched
        results["legs"].append(leg)

    # skew detection: candidates partitioned by the natural join key
    # (cell) concentrate in the hot cell; (cell, salt) spreads them.
    import tempfile
    polys = synth_polygons(1_000)
    cand = with_cell(pts, level)
    with tempfile.TemporaryDirectory() as td:
        by_cell = os.path.join(td, "by_cell")
        write_checkpoint(cand.repartition(64, "cell"), by_cell)
        results["skew_by_cell"] = skew_report(by_cell, spark)
        by_salt = os.path.join(td, "by_salt")
        salted = cand.withColumn(
            "salt", F.pmod(F.xxhash64("doc_id"), F.lit(16)))
        write_checkpoint(salted.repartition(64, "cell", "salt"), by_salt)
        results["skew_salted"] = skew_report(by_salt, spark)
    for k in ("skew_by_cell", "skew_salted"):
        results[k]["n_skewed"] = len(results[k].pop("skewed"))
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
