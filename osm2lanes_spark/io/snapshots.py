"""Snapshot tables: Iceberg-shaped semantics with a parquet fallback.

The north rule mandates Iceberg tables with snapshot-diff incremental
scans and idempotent commits. This container ships no Iceberg runtime
jar, so :class:`SnapshotTable` provides the same API over plain parquet:

- every commit is an immutable snapshot directory (``snap-<id>/``) plus a
  JSON manifest appended to ``_snapshots.json`` under an atomic rename —
  readers never see partial commits;
- ``read()`` = current table state (all snapshots for *append*, the
  latest for *overwrite* commits);
- ``read_diff(since)`` = rows added after a snapshot id — the
  snapshot-diff incremental scan;
- commits carry per-partition lineage (``plans.lineage``) so any stage
  resumes idempotently.

When an Iceberg catalog is configured (``spark.sql.catalog.*`` + runtime
jar), :func:`have_iceberg` flips and the same call sites can use
``df.writeTo(table).append()`` / ``spark.read.option("start-snapshot-id",
…)`` — the semantics here are a strict subset of Iceberg's.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def have_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_snapshots.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)

    def current_snapshot_id(self) -> Optional[int]:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    # --- writes -----------------------------------------------------------
    def commit(self, df: DataFrame, mode: str = "append") -> dict:
        """Write a new snapshot; invisible until the manifest rename lands."""
        snaps = self.snapshots()
        snap_id = (snaps[-1]["id"] + 1) if snaps else 1
        snap_dir = os.path.join(self.path, f"snap-{snap_id}")
        df.write.mode("overwrite").parquet(snap_dir)
        rows = df.sparkSession.read.parquet(snap_dir).count()
        entry = {"id": snap_id, "dir": f"snap-{snap_id}", "mode": mode,
                 "rows": rows, "committed_at": time.time()}
        new_manifest = snaps + [entry]
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_manifest, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point
        return entry

    # --- reads ------------------------------------------------------------
    def _dirs_for(self, snaps: list[dict]) -> list[str]:
        # an overwrite snapshot supersedes everything before it
        start = 0
        for i, s in enumerate(snaps):
            if s["mode"] == "overwrite":
                start = i
        return [os.path.join(self.path, s["dir"]) for s in snaps[start:]]

    def read(self, spark: SparkSession) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        return spark.read.parquet(*self._dirs_for(snaps))

    def read_diff(self, spark: SparkSession, since_snapshot_id: int) -> DataFrame:
        """Incremental scan: rows appended after ``since_snapshot_id``."""
        newer = [s for s in self.snapshots() if s["id"] > since_snapshot_id]
        if not newer:
            return spark.read.parquet(*self._dirs_for(self.snapshots())).limit(0)
        return spark.read.parquet(
            *[os.path.join(self.path, s["dir"]) for s in newer])

    def read_at(self, spark: SparkSession, snapshot_id: int) -> DataFrame:
        """Time travel: the table state as of ``snapshot_id``."""
        upto = [s for s in self.snapshots() if s["id"] <= snapshot_id]
        if not upto:
            raise FileNotFoundError(
                f"snapshot {snapshot_id} predates {self.path}")
        return spark.read.parquet(*self._dirs_for(upto))
