"""merge_upsert / compact_cdc_log semantics (operators/cdc.py)."""

import pytest
from pyspark.sql import functions as F

from osm2lanes_spark.operators.cdc import compact_cdc_log, merge_upsert


def test_merge_upsert_three_arms(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    source = spark.createDataFrame(
        [(2, "B", 99.0, False),   # update
         (4, "d", 40.0, False),   # insert
         (3, "c", 30.0, True)],   # delete
        "k long, s string, v double, del boolean")
    got = {r.k: (r.s, r.v) for r in merge_upsert(
        target, source, ["k"], delete_col="del").collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}


def test_merge_upsert_one_sided_payloads_and_nulls(spark):
    # target-only column passes through (null on inserts); source-only
    # column passes through (null on untouched target rows); a source
    # row whose payload is entirely NULL still counts as matched
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, tonly string")
    source = spark.createDataFrame(
        [(2, None), (5, "s5")], "k long, sonly string")
    got = {r.k: (r.tonly, r.sonly)
           for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 5: (None, "s5")}
    with pytest.raises(ValueError, match="keys"):
        merge_upsert(target, source, [])
    with pytest.raises(ValueError, match="delete_col"):
        merge_upsert(target, source, ["k"], delete_col="nope")


def test_merge_upsert_broadcast_source_same_result(spark):
    target = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    source = spark.createDataFrame([(2, 9.0), (3, 3.0)], "k long, v double")
    a = sorted(merge_upsert(target, source, ["k"]).collect())
    b = sorted(merge_upsert(target, source, ["k"],
                            broadcast_source=True).collect())
    assert a == b == [(1, 1.0), (2, 9.0), (3, 3.0)]


def test_compact_cdc_log_latest_wins_and_delete_tiebreak(spark):
    log = spark.createDataFrame(
        [(1, 1, "I", "x"), (1, 2, "U", "y"),        # survives as y
         (2, 1, "I", "x"), (2, 5, "D", None),       # deleted
         (3, 7, "U", "p"), (3, 7, "D", None),       # tie → delete wins
         (4, 1, "I", "q")],
        "k long, ver long, op string, payload string")
    got = {r.k: (r.op, r.payload) for r in compact_cdc_log(
        log, ["k"], "ver").collect()}
    assert got == {1: ("U", "y"), 4: ("I", "q")}
    with pytest.raises(ValueError, match="keys"):
        compact_cdc_log(log, [], "ver")
