#!/usr/bin/env python
"""Hot-key A/B for the r05 skew-safe temporal formulations.

Same corpus philosophy as BENCH/packing_exact_skew.py — ONE user holds
90% of the events — applied to the two temporal operators that
previously documented (rather than solved) the hot-key caveat:

- ``sessionize``: the plain path sorts the hot user's events in ONE
  window task; ``scale_safe=True`` range-partitions on (user, ts) and
  stitches lag + session-count across partitions through a tiny
  subtotal table (the packing two-pass prefix decomposition), so the
  hot user spreads over all cores.
- ``asof_join``: the plain union-window serializes the hot user;
  ``bucket_seconds`` partitions the window by (user, time-bucket) with
  carry-in state from a bucket-level as-of.

Both A/Bs assert IDENTICAL output aggregates before reporting times.
As with the packing A/B, the headline is the SHAPE: plain-path latency
is proportional to the hot key's row count on one core (and its memory
to the hot key's size); the skew-safe latency is bounded by partition /
bucket size. The measured slope demonstrates it.

Usage: python BENCH/temporal_skew.py [n_events ...] (default 2M 8M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm2lanes_spark.operators.temporal import asof_join, sessionize
from osm2lanes_spark.session import get_spark

SIZES = [int(x) for x in sys.argv[1:]] or [2_000_000, 8_000_000]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SPAN_S = 30 * 86400  # events spread over 30 days


def events(spark, n, salt):
    # 90% of rows on user 0; pseudo-random second within the span
    return (spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.pmod("id", F.lit(10)) < 9, F.lit(0))
        .otherwise(F.pmod("id", F.lit(10))).cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.xxhash64("id", F.lit(salt)), F.lit(SPAN_S)))
        .alias("ts"))
        .repartition(2 * CPUS).persist())


def timed(label, agg_fn, trials=3):
    best, got = None, None
    for _ in range(trials):
        t0 = time.perf_counter()
        got = agg_fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s  (checksum={got})", flush=True)
    return best, got


def main():
    spark = get_spark("temporal-skew", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    for n in SIZES:
        ev = events(spark, n, salt=1)
        views = events(spark, n // 2, salt=2).select(
            F.col("event_id").alias("view_id"), "user_id", "ts")
        ev.count(); views.count()

        print(f"--- {n} events, 90% one user, local[{CPUS}]")

        def sess_agg(df):
            return tuple((df.groupBy("user_id", "session_id")
                          .agg(F.count(F.lit(1)).alias("c"))
                          .agg(F.count(F.lit(1)), F.sum("c"),
                               F.sum(F.col("session_id") * F.col("c")))
                          .collect()[0]))

        t_plain, a = timed(
            "sessionize plain (per-user window)   ",
            lambda: sess_agg(sessionize(ev, key="user_id", ts="ts",
                                        gap_seconds=600,
                                        tiebreak="event_id")))
        t_safe, b = timed(
            "sessionize scale_safe (range 2-pass) ",
            lambda: sess_agg(sessionize(ev, key="user_id", ts="ts",
                                        gap_seconds=600,
                                        tiebreak="event_id",
                                        scale_safe=True)))
        assert a == b, (a, b)
        print(f"sessionize scale_safe speedup at {n}: "
              f"{t_plain / t_safe:.2f}x", flush=True)

        def asof_agg(df):
            return tuple((df.agg(
                F.count(F.lit(1)), F.count("view_id"),
                F.sum(F.unix_micros(F.col("ts"))
                      - F.unix_micros(F.col("asof_ts"))))
                .collect()[0]))

        t_plain, a = timed(
            "asof plain (per-user window)         ",
            lambda: asof_agg(asof_join(ev, views, on="user_id", ts="ts",
                                       tiebreak="view_id")))
        t_buck, b = timed(
            "asof bucketed (user x day window)    ",
            lambda: asof_agg(asof_join(ev, views, on="user_id", ts="ts",
                                       tiebreak="view_id",
                                       bucket_seconds=86400.0)))
        assert a == b, (a, b)
        print(f"asof bucketed speedup at {n}: {t_plain / t_buck:.2f}x",
              flush=True)
        ev.unpersist(); views.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
