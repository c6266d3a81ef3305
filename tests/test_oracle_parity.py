"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares row count, schema
(column names) and *exact* sorted values against the matching
``oracle_sql()`` run in DuckDB — the same shape as CORRECTNESS_r{N}.json.
Rows-only queries are smoke-checked for determinism across two runs.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df):
    """pandas → (cols+dtype kinds, sorted list-of-tuples).

    Dtype *kind* is part of the key: the driver's value hash distinguishes
    int64 from float64 even when values are numerically equal (the r01
    ``events_props`` failure mode), so the local gate must too.
    """
    cols = sorted(df.columns)
    kinds = [f"{c}:{df[c].dtype.kind}" for c in cols]
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return kinds, sorted(out)


ORACLED = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, ddb, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, sf_dir).toPandas()
    duck_pdf = ddb.sql(entry_mod.oracle_sql()[name]).df()
    s_cols, s_rows = _normalize(spark_pdf)
    d_cols, d_rows = _normalize(duck_pdf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), \
        f"{name}: rows {len(s_rows)} != {len(d_rows)}"
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_deterministic(spark, sf_dir, name):
    q = entry_mod.queries()[name]
    a = _normalize(q(spark, sf_dir).toPandas())
    b = _normalize(q(spark, sf_dir).toPandas())
    assert a == b, f"{name}: nondeterministic output"
    assert len(a[1]) > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 46
    assert all(r["error"] is None for r in rows)


def test_lanes_roundtrip_oracle_fuzz(ddb, tmp_path, monkeypatch):
    """The lanes_roundtrip oracle SQL is a faithful translation of the
    lanes_to_tags kernel BEYOND the corpus: 400 random lane arrays
    (types, directions, designations, speeds incl. disagreeing ones,
    widths, bike access, red separators) produce identical
    (case_id, tag_key, tag_value) sets from the kernel and from the SQL
    run over the same JSON — including the __error__ abort rows."""
    import json
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm2lanes_spark.core.lanes_to_tags import lanes_to_tags
    from osm2lanes_spark.core.locale import Locale

    rng = random.Random(7)
    cases = []
    for n in range(400):
        lanes = []
        for _ in range(rng.randint(1, 7)):
            t = rng.choice(["travel", "travel", "travel", "parking",
                            "shoulder", "separator"])
            l = {"type": t}
            if t == "travel":
                l["direction"] = rng.choice(["forward", "backward", "both"])
                l["designated"] = rng.choice(
                    ["motor_vehicle", "motor_vehicle", "bus", "bicycle", "foot"])
                if rng.random() < 0.3:
                    l["max_speed"] = rng.choice(
                        [("kph", 100.0), ("kph", 50.0), ("mph", 25.0),
                         ("mph", 22.5)])
                if rng.random() < 0.2:
                    l["width"] = rng.choice([1.0, 1.5, 2.25])
                if rng.random() < 0.15:
                    l["access"] = {"bicycle": {"access": "yes",
                                               "direction": "both"}}
            elif t == "parking":
                l["direction"] = rng.choice(["forward", "backward"])
                l["designated"] = "motor_vehicle"
            elif t == "separator" and rng.random() < 0.7:
                l["markings"] = [{"style": "solid_line",
                                  "color": rng.choice(["white", "red"])}]
            lanes.append(l)
        cases.append({
            "case_id": f"fz/{n:04d}",
            "expected_json": json.dumps(
                [{k: (list(v) if isinstance(v, tuple) else v)
                  for k, v in l.items()} for l in lanes]),
            "expected_highway": rng.choice(["residential", "primary"]),
            "lanes": lanes,
            "driving_side": rng.choice(["left", "right"]),
            "iso_3166_2": rng.choice([None, "US-WA", "NL-FR", "GB-LBH"]),
        })

    gold = str(tmp_path / "fz_golden.parquet")
    docs = str(tmp_path / "fz_docs.parquet")
    pq.write_table(pa.table({
        "case_id": [c["case_id"] for c in cases],
        "expected_json": [c["expected_json"] for c in cases],
        "expected_highway": [c["expected_highway"] for c in cases]}), gold)
    pq.write_table(pa.table({
        "doc_id": [c["case_id"] for c in cases],
        "driving_side": [c["driving_side"] for c in cases],
        "iso_3166_2": pa.array([c["iso_3166_2"] for c in cases],
                               pa.string())}), docs)

    truth = set()
    for c in cases:
        road = {"highway": c["expected_highway"], "lifecycle": "active",
                "lanes": c["lanes"]}
        try:
            tags = lanes_to_tags(road,
                                 Locale.build(c["iso_3166_2"],
                                              c["driving_side"]),
                                 check_roundtrip=False)
            truth |= {(c["case_id"], k, v) for k, v in tags.items()}
        except Exception as e:
            truth.add((c["case_id"], "__error__", type(e).__name__))
    assert any(t[1] == "__error__" for t in truth)  # fuzz hits the abort path

    import os
    sql = entry_mod._lanes_roundtrip_oracle()
    sql = sql.replace(os.path.join(entry_mod.FIXTURE_DIR, "golden.parquet"),
                      gold)
    sql = sql.replace(os.path.join(entry_mod.FIXTURE_DIR, "documents.parquet"),
                      docs)
    got = set(map(tuple, ddb.sql(sql).fetchall()))
    assert got == truth
