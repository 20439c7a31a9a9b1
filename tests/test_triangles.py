"""Triangle counting: brute differential on random graphs + pinned
small cases (the orientation must count each triangle exactly once)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from geo_spark.operators.linkgraph import triangle_counts


def _brute(edge_set, nodes):
    adj = {n: set() for n in nodes}
    for u, v in edge_set:
        adj[u].add(v)
        adj[v].add(u)
    out = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                out[n] = out.get(n, 0) + 1
    return out


def test_k4_counts(spark):
    edges = [(u, v) for u, v in itertools.combinations(range(4), 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4: C(3,2)=3 per node


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graph_matches_brute(spark, seed):
    rng = np.random.default_rng(seed)
    n = 40
    edges = set()
    for _ in range(160):
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    # feed duplicated + reversed + self-loop noise: must be collapsed
    rows = [(int(u), int(v)) for u, v in edges]
    rows += [(int(v), int(u)) for u, v in list(edges)[:50]]
    rows += [(5, 5), (7, 7)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert got == _brute(edges, range(n))
