"""Unit tests for operators/graph.py (scaled-integer PageRank)."""

from __future__ import annotations

import pytest

from osm2lanes_spark.operators.graph import pagerank

SCALE = 10 ** 12
NUM, DEN = 17, 20


def _py_pagerank(edges, iterations, scale=SCALE, num=NUM, den=DEN):
    """Reference replica of the integer recurrence (plain dicts)."""
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: scale // n for v in nodes}
    base = ((scale * (den - num)) // den) // n
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += rank[s] // outdeg[s]
        share = sum(rank[v] for v in nodes if v not in outdeg) // n
        rank = {v: base + (num * (inc[v] + share)) // den for v in nodes}
    return rank


EDGES = [(1, 2), (1, 3), (2, 3), (4, 3), (4, 2), (3, 1)]
DANGLING_EDGES = [(1, 2), (1, 3), (2, 3), (4, 3)]  # 3 is dangling


@pytest.mark.parametrize("edges,iters", [
    (EDGES, 1), (EDGES, 4), (DANGLING_EDGES, 3),
])
def test_pagerank_matches_integer_reference(spark, edges, iters):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=iters).collect()}
    assert got == _py_pagerank(edges, iters)


def test_pagerank_mass_approximately_conserved(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    total = sum(r["rank"] for r in pagerank(df, iterations=5).collect())
    # floor losses only: at most a few units per node per iteration
    assert SCALE - 200 <= total <= SCALE


def test_pagerank_dangling_mass_redistributed(spark):
    """With a dangling node the total mass must not collapse toward the
    (1-d) floor — the share term feeds it back each iteration."""
    df = spark.createDataFrame(DANGLING_EDGES, "src long, dst long")
    total = sum(r["rank"] for r in pagerank(df, iterations=5).collect())
    assert total > 0.999 * SCALE


def test_pagerank_truncate_lineage_same_result(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    plain = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    trunc = {r["node"]: r["rank"]
             for r in pagerank(df, iterations=3,
                               truncate_lineage=True).collect()}
    assert plain == trunc


def test_pagerank_rejects_zero_iterations(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)


def test_bfs_distances_directed_undirected_and_bounds(spark):
    from osm2lanes_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 1), (6, 7)],
        "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    d = {r.node: r.dist for r in bfs_distances(
        edges, seeds, max_hops=2).collect()}
    # directed: 1→2→3; 4 is 3 hops (cut), 5 only reaches 1 (not FROM 1)
    assert d == {1: 0, 2: 1, 3: 2}
    u = {r.node: r.dist for r in bfs_distances(
        edges, seeds, max_hops=2, directed=False).collect()}
    # undirected: 5 is one hop away; 6/7 stay unreachable
    assert u == {1: 0, 2: 1, 5: 1, 3: 2}
    z = {r.node: r.dist for r in bfs_distances(
        edges, seeds, max_hops=0).collect()}
    assert z == {1: 0}
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(edges, seeds, max_hops=-1)


def test_weighted_sssp_matches_bellman_ford(spark):
    import itertools
    import numpy as np

    from osm2lanes_spark.operators.graph import weighted_sssp

    rng = np.random.default_rng(11)
    n = 40
    rows = []
    for a, b in itertools.combinations(range(n), 2):
        if rng.random() < 0.12:
            rows.append((a, b, int(rng.integers(1, 100))))
            rows.append((b, a, int(rng.integers(1, 100))))
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    seeds = spark.createDataFrame([(0,)], "node long")
    for hops in (0, 1, 3):
        got = {r.node: r.dist for r in weighted_sssp(
            edges, seeds, max_hops=hops).collect()}
        # reference: iterated relaxation over ≤hops edges
        dist = {0: 0}
        for _ in range(hops):
            nxt = dict(dist)
            for a, b, w in rows:
                if a in dist and dist[a] + w < nxt.get(b, 1 << 60):
                    nxt[b] = dist[a] + w
            dist = nxt
        assert got == dist, hops


def test_weighted_sssp_parallel_edges_take_min(spark):
    from osm2lanes_spark.operators.graph import weighted_sssp

    edges = spark.createDataFrame(
        [(1, 2, 10), (1, 2, 3), (2, 3, 5)], "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in weighted_sssp(
        edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 3, 3: 8}


def test_triangle_counts_small_and_direction_insensitive(spark):
    from osm2lanes_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles) + a pendant edge + a reversed dup
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges += [(4, 5), (2, 1)]  # pendant + reverse duplicate
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.a: r.n_triangles for r in triangle_counts(df).collect()}
    # K4 triangles by lowest vertex: {1,2,3} {1,2,4} {1,3,4} → a=1 ×3,
    # {2,3,4} → a=2 ×1
    assert got == {1: 3, 2: 1}


def test_triangle_counts_brute_force_random(spark):
    import itertools
    import numpy as np

    from osm2lanes_spark.operators.graph import triangle_counts

    rng = np.random.default_rng(23)
    n = 30
    es = {(a, b) for a, b in itertools.combinations(range(n), 2)
          if rng.random() < 0.25}
    df = spark.createDataFrame(sorted(es), "src long, dst long")
    got = {r.a: r.n_triangles for r in triangle_counts(df).collect()}
    exp = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            exp[a] = exp.get(a, 0) + 1
    assert got == exp
