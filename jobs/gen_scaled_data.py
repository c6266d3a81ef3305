#!/usr/bin/env python
"""Generate sf-scaled LOCAL test data shaped like /root/testdata.

The driver's round-end bench runs at a larger, driver-generated scale
factor (BENCH_r06.json: sf=1.0) that is not present under
/root/testdata (which is read-only and capped at sf0.1). This script
synthesizes tables with the SAME schemas and measured distributions
(seeded, deterministic) at an arbitrary sf so optimization work can be
validated at driver scale. It is a measurement aid only — correctness
gates still run against the committed driver data; nothing here is read
by bench.py or the declared queries.

Distribution notes (measured from /root/testdata/sf0.1 — see
OPTIMIZATION_r07.md):
  customer  n=150000*sf  Customer#%09d names, 25 nations, 5 segments
  supplier  n=10000*sf   Supplier#%09d, 25 nations
  part      n=200000*sf  8 colors x 8 nouns, 25 brands, 6 types,
                         size 1..50, retail uniform(900,1000)
  orders    n=1500000*sf custkey uniform, status O/P/F uniform,
                         totalprice uniform(1e3,5e5), date uniform
                         1995-01-01..2001-08-01 (day granularity)
  lineitem  n=6000000*sf orderkey uniform (Poisson(4) lines/order),
                         partkey/suppkey uniform, qty 1..50,
                         extprice uniform(900,105000), disc 0..0.10,
                         tax 0..0.08, shipdate uniform (independent)
  events    n=1000000*sf ts sorted-uniform over 30 days from
                         2024-01-01, users 15000*sf, 5 types uniform,
                         value Exp(50), props {"k": 0..99}
  documents n=50000*sf   10..100 words uniform from the 30-word vocab,
                         5%% docs get one 'dup' token, ~0.16%% exact
                         duplicates, lang 41%% en / rest even, 20 srcs
  embeddings n=max(500, 20000*sf) unit 64-d vectors, 10 soft label
                         clusters
  region/nation          copied verbatim from sf0.1

Usage: python jobs/gen_scaled_data.py [sf] [outdir]
  default: sf=1.0, outdir=/root/testdata_local/sf1.0
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
COLORS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "zh", "es", "fr", "de"]


def _write(outdir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(outdir, f"{name}.parquet")
    # one rowgroup per file: mirrors the observed driver layout (the
    # worst case for scan parallelism — exactly what we must survive)
    pq.write_table(table, path, row_group_size=1 << 31,
                   compression="snappy")
    print(f"{name}: {table.num_rows} rows -> {path}")


def gen(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(20260822)

    for t in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(outdir, f"{t}.parquet"))

    # --- customer
    n = int(150000 * sf)
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n), 2), pa.float64()),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n)]),
    }))

    # --- supplier
    n = int(10000 * sf)
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.uniform(-1000, 10000, n), 2), pa.float64()),
    }))

    # --- part
    n = int(200000 * sf)
    names = np.array([f"{c} {w}" for c in COLORS for w in NOUNS])
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, len(names), n)]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n)]),
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.uniform(900, 1000, n), 1), pa.float64()),
    }))

    # --- orders
    n_ord = int(1500000 * sf)
    n_cust = int(150000 * sf)
    d0 = np.datetime64("1995-01-01")
    d1 = np.datetime64("2001-08-01")
    days = int((d1 - d0) / np.timedelta64(1, "D"))
    odate = (d0 + rng.integers(0, days + 1, n_ord)
             * np.timedelta64(1, "D")).astype("datetime64[us]")
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, n_ord), 2), pa.float64()),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # --- lineitem
    n = int(6000000 * sf)
    s0 = np.datetime64("1995-01-02")
    s1 = np.datetime64("2001-11-04")
    sdays = int((s1 - s0) / np.timedelta64(1, "D"))
    sdate = (s0 + rng.integers(0, sdays + 1, n)
             * np.timedelta64(1, "D")).astype("datetime64[us]")
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n), pa.int64()),
        "l_partkey": pa.array(
            rng.integers(0, int(200000 * sf), n), pa.int64()),
        "l_suppkey": pa.array(
            rng.integers(0, int(10000 * sf), n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n), pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, n).astype("float64"), pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, n), 2), pa.float64()),
        "l_discount": pa.array(
            np.round(rng.integers(0, 11, n) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(
            np.round(rng.integers(0, 9, n) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))

    # --- events (ts sorted-uniform over 30 days)
    n = int(1000000 * sf)
    span_us = 30 * 86400 * 1000000
    ts = np.sort(rng.integers(0, span_us, n))
    ts = (np.datetime64("2024-01-01").astype("datetime64[us]")
          + ts * np.timedelta64(1, "us"))
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, int(15000 * sf), n), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n)]),
        "value": pa.array(
            np.round(rng.exponential(50.0, n), 2), pa.float64()),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    }))

    # --- documents
    n = int(50000 * sf)
    vocab = np.array(VOCAB)
    texts = []
    lang_pool = np.concatenate([
        np.repeat("en", 41), np.repeat("zh", 15), np.repeat("es", 15),
        np.repeat("fr", 15), np.repeat("de", 14)])
    langs = lang_pool[rng.integers(0, len(lang_pool), n)]
    srcs = np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n)]
    for i in range(n):
        k = rng.integers(10, 101)
        words = list(vocab[rng.integers(0, len(vocab), k)])
        if rng.random() < 0.05:
            words[int(rng.integers(0, len(words)))] = "dup"
        texts.append(" ".join(words))
    # exact duplicates of earlier docs (~0.16%)
    for _ in range(max(1, int(0.0016 * n))):
        j, i = sorted(rng.integers(0, n, 2))
        texts[i] = texts[j]
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # --- embeddings (unit vectors, 10 soft clusters)
    n = max(500, int(20000 * sf))
    labels = rng.integers(0, 10, n)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = rng.standard_normal((n, 64)) + 0.8 * centers[labels]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v.astype("float32"))),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/testdata_local/sf{sf}"
    gen(sf, out)
