"""Snapshot-table semantics: commits, incremental diff scans, overwrite."""

from __future__ import annotations

from osm2lanes_spark.io.snapshots import SnapshotTable


def test_append_and_diff(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.current_snapshot_id() is None
    t.commit(spark.range(0, 100).toDF("id"))
    s1 = t.current_snapshot_id()
    t.commit(spark.range(100, 150).toDF("id"))
    assert t.read(spark).count() == 150
    # incremental scan sees only rows after s1
    diff = t.read_diff(spark, s1)
    ids = sorted(r["id"] for r in diff.collect())
    assert ids[0] == 100 and len(ids) == 50
    assert t.read_diff(spark, t.current_snapshot_id()).count() == 0


def test_overwrite_supersedes(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl2"))
    t.commit(spark.range(10).toDF("id"))
    t.commit(spark.range(5).toDF("id"), mode="overwrite")
    assert t.read(spark).count() == 5
    t.commit(spark.range(100, 103).toDF("id"))
    assert t.read(spark).count() == 8


def test_resume_idempotent(spark, tmp_path):
    """A crashed write (snapshot dir present, manifest absent) is invisible."""
    t = SnapshotTable(str(tmp_path / "tbl3"))
    t.commit(spark.range(10).toDF("id"))
    # simulate a crash: data written but no manifest entry
    spark.range(999).toDF("id").write.parquet(str(tmp_path / "tbl3" / "snap-99"))
    assert t.read(spark).count() == 10
    assert t.current_snapshot_id() == 1


def test_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tt"))
    t.commit(spark.range(10).toDF("id"))
    s1 = t.current_snapshot_id()
    t.commit(spark.range(10, 30).toDF("id"))
    s2 = t.current_snapshot_id()
    t.commit(spark.range(5).toDF("id"), mode="overwrite")
    assert t.read_at(spark, s1).count() == 10
    assert t.read_at(spark, s2).count() == 30
    assert t.read(spark).count() == 5
