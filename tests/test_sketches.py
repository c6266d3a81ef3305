"""Unit tests for operators/sketches.py (deterministic HyperLogLog).

Accuracy, merge exactness and rank edge cases on small frames; the
sf0.01 bit-parity vs the DuckDB register replay runs through the
driver contract (query ``hll_users``).
"""

from pyspark.sql import functions as F

from osm2lanes_spark.operators.sketches import (hll_distinct, hll_estimate,
                                                hll_merge, hll_sketch)


def test_hll_accuracy_linear_counting(spark):
    """5k distinct longs at p=12 sit in the linear-counting regime:
    the estimate lands within 5% of truth."""
    df = spark.range(5000).select((F.col("id") * 7 + 3).alias("v"))
    est = hll_distinct(df, "v", p=12).collect()[0]["est_distinct"]
    assert abs(est - 5000) / 5000 < 0.05, est


def test_hll_accuracy_raw_regime(spark):
    """200k distinct values overflow linear counting at p=12 (raw HLL
    regime, σ≈1.6%): estimate within 6%."""
    df = spark.range(200_000).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v", p=12).collect()[0]["est_distinct"]
    assert abs(est - 200_000) / 200_000 < 0.06, est


def test_hll_merge_exact_and_idempotent(spark):
    """Sketch(A) ⊕ Sketch(B) has exactly the registers of Sketch(A∪B);
    merging a sketch with itself is the identity (max semantics)."""
    df = spark.range(3000).select(F.col("id").alias("v"),
                                  (F.col("id") % 2).alias("half"))
    a = hll_sketch(df.where("half = 0"), "v")
    b = hll_sketch(df.where("half = 1"), "v")
    whole = hll_sketch(df, "v")
    merged = hll_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    twice = hll_merge(whole, whole)
    assert sorted(map(tuple, twice.collect())) == \
        sorted(map(tuple, whole.collect()))
    # duplicated data never moves the estimate — the property exact
    # COUNT(DISTINCT) pays a full shuffle for
    est_m = hll_estimate(merged).collect()[0]["est_distinct"]
    est_w = hll_estimate(whole).collect()[0]["est_distinct"]
    assert est_m == est_w


def test_hll_grouped_and_nulls(spark):
    """Per-group sketches are independent; NULL values are ignored
    (COUNT DISTINCT semantics); a group of one NULL row vanishes."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 9), ("b", None),
         ("c", None)],
        "g string, v int")
    out = {r["g"]: (r["n_registers"], r["est_distinct"])
           for r in hll_distinct(df, "v", by=["g"], p=12).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"][0] == 2          # two registers set for 2 distinct
    assert out["b"][0] == 1
    # linear counting is near-exact at this scale
    assert round(out["a"][1]) == 2
    assert round(out["b"][1]) == 1


def test_hll_rank_string_scan_edges(spark):
    """The hex-scan rank: plant words with known leading-zero shapes
    through the public sketch by checking rank bounds — every rank is
    in [1, 33] and registers are in [0, 2^p)."""
    df = spark.range(20_000).select(F.col("id").alias("v"))
    sk = hll_sketch(df, "v", p=8).collect()
    assert all(0 <= r["register"] < 256 for r in sk)
    assert all(1 <= r["rank"] <= 33 for r in sk)
    # p=8 with 20k values: every register is hit
    assert len(sk) == 256
