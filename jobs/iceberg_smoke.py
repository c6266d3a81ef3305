#!/usr/bin/env python
"""Iceberg adapter smoke (VERDICT r04 #8).

Exercises the jar-gated adapters in ``osm2lanes_spark.io.snapshots``
end-to-end: write → append → full read → incremental diff → overwrite.
With ``iceberg-spark-runtime`` on the classpath (e.g.

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=/tmp/iceberg-wh \
      jobs/iceberg_smoke.py local.db.smoke

) the same call sites run against a real Iceberg catalog; without it
(this sandbox: pypi.org/repo1.maven.org unreachable, no jar fetchable)
``have_iceberg`` is False and the flock/parquet stand-in runs — which is
what this script pins in-container.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2lanes_spark.io.snapshots import (
    SnapshotTable, have_iceberg, read_table, read_table_diff, write_table)
from osm2lanes_spark.session import get_spark


def main() -> None:
    spark = get_spark("iceberg-smoke", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    iceberg = have_iceberg(spark)
    if len(sys.argv) > 1:
        target = sys.argv[1]
        cleanup = None
    else:
        tmp = tempfile.mkdtemp(prefix="iceberg-smoke-")
        target = os.path.join(tmp, "smoke")
        cleanup = tmp
    print(f"runtime: {'ICEBERG' if iceberg else 'parquet stand-in'} "
          f"target={target}")

    e1 = write_table(spark.range(10).toDF("id"), target, mode="overwrite")
    s1 = e1["id"] if e1 else spark.sql(
        f"SELECT snapshot_id FROM {target}.snapshots "
        "ORDER BY committed_at DESC LIMIT 1").collect()[0][0]
    write_table(spark.range(10, 15).toDF("id"), target, mode="append")
    assert read_table(spark, target).count() == 15
    diff = read_table_diff(spark, target, s1)
    got = sorted(r["id"] for r in diff.collect())
    assert got == list(range(10, 15)), got
    write_table(spark.range(3).toDF("id"), target, mode="overwrite")
    assert read_table(spark, target).count() == 3
    if not iceberg:
        # stand-in-only semantics: retention + reclaim
        t = SnapshotTable(target)
        t.expire_snapshots(keep_last=1)
    print("iceberg_smoke OK")
    if cleanup:
        import shutil
        shutil.rmtree(cleanup, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
