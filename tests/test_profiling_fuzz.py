"""Property tests for the r05 profiling/chunking operators.

Driven through ONE Spark job per property over a batch of generated
cases (hypothesis generates the corpus; Spark evaluates all rows at
once) to keep runtime sane.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F


def _rand_texts(seed, n):
    rng = random.Random(seed)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = []
    for i in range(n):
        k = rng.randint(0, 40)
        pad_l = rng.choice(["", " ", "\t", "\n ", "  \t"])
        pad_r = rng.choice(["", " ", "\t\n"])
        sep = rng.choice([" ", "  ", " \t ", "\n"])
        rows.append((f"d{i}", pad_l + sep.join(
            rng.choice(words) for _ in range(k)) + pad_r if k else pad_l))
    return rows


def test_chunk_reconstruction_property(spark):
    """For ANY doc and (chunk, overlap): dropping each chunk's first
    `overlap` tokens (except chunk 0) and concatenating reconstructs the
    token stream exactly — i.e. chunks cover every token once with the
    declared overlap and in order."""
    from osm2lanes_spark.operators.packing import chunk_documents
    from osm2lanes_spark.operators.text import tokens

    rows = _rand_texts(7, 120)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    expected = {r["doc_id"]: r["t"] for r in
                df.select("doc_id", tokens(F.col("text")).alias("t"))
                .collect()}
    for chunk, ov in ((1, 0), (3, 1), (5, 4), (8, 0), (64, 8)):
        out = chunk_documents(df, chunk_tokens=chunk, overlap_tokens=ov) \
            .collect()
        got: dict[str, list[tuple[int, str, int]]] = {}
        for r in out:
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]))
        for doc_id, toks in expected.items():
            chunks = sorted(got.get(doc_id, []))
            if not toks:
                assert chunks == [], (doc_id, chunk, ov, chunks)
                continue
            # contiguous chunk ids from 0
            assert [c[0] for c in chunks] == list(range(len(chunks)))
            rebuilt: list[str] = []
            for idx, text, n_toks in chunks:
                parts = text.split(" ")
                assert len(parts) == n_toks, (doc_id, chunk, ov, text)
                assert len(parts) <= chunk
                rebuilt.extend(parts if idx == 0 else parts[ov:])
            assert rebuilt == toks, (doc_id, chunk, ov)


def test_grouped_quantiles_matches_numpy_selection(spark):
    """The histogram rank rule equals direct selection on the sorted
    values (index floor((n-1)q), 0-based) for random multisets."""
    from osm2lanes_spark.operators.profiling import grouped_quantiles

    rng = random.Random(11)
    rows = []
    vals: dict[str, list[int]] = {}
    for g in range(12):
        grp = f"g{g}"
        n = rng.randint(1, 50)
        vs = [rng.randint(-5, 5) for _ in range(n)]
        vals[grp] = sorted(vs)
        rows += [(grp, v) for v in vs]
    df = spark.createDataFrame(rows, "grp string, v int")
    qs = (0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 1.0)
    out = {(r["grp"], r["q"]): r["value"] for r in
           grouped_quantiles(df, "v", qs, by="grp").collect()}
    for grp, vs in vals.items():
        for q in qs:
            want = vs[math.floor((len(vs) - 1) * q)]
            assert out[(grp, q)] == want, (grp, q, vs)


def test_ngram_counts_match_python_reference(spark):
    from osm2lanes_spark.operators.profiling import ngram_counts
    from collections import Counter

    rows = _rand_texts(23, 80)
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for n in (1, 2, 3):
        got = {r["ngram"]: r["count"]
               for r in ngram_counts(df, n=n).collect()}
        ref: Counter = Counter()
        for _, text in rows:
            toks = text.lower().split()
            for i in range(len(toks) - n + 1):
                ref[" ".join(toks[i:i + n])] += 1
        assert got == dict(ref), n
