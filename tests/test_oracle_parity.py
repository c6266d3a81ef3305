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
