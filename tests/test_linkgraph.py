"""pagerank differential: the DataFrame power iteration must equal a
dense numpy replay of the same spec (teleport + damping + distributed
dangling mass) on graphs with dangling sinks and isolated nodes."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.operators.linkgraph import pagerank


def _numpy_pagerank(n, edge_list, iters, d=0.85):
    edges = sorted(set((s, t) for s, t in edge_list if s != t))
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        dangling = r[outdeg == 0].sum()
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return r


def _spark_pagerank(spark, n, edge_list, iters, **kw):
    edges = spark.createDataFrame(
        [(int(s), int(t)) for s, t in edge_list], "src long, dst long"
    )
    nodes = spark.createDataFrame([(int(i),) for i in range(n)], "id long")
    got = pagerank(edges, nodes, iterations=iters, **kw).collect()
    out = np.zeros(n)
    for r in got:
        out[r["id"]] = r["rank"]
    return out


def test_matches_numpy_with_dangling_and_isolated(spark):
    rng = np.random.default_rng(13)
    n = 60
    # nodes 50..54 dangle (no outlinks); 55..59 are fully isolated
    edge_list = [
        (int(s), int(t))
        for s in range(50)
        for t in rng.integers(0, 55, 3)
    ]
    want = _numpy_pagerank(n, edge_list, 4)
    got = _spark_pagerank(spark, n, edge_list, 4)
    assert np.allclose(got, want, rtol=0, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_self_loops_and_duplicates_ignored(spark):
    n = 4
    edge_list = [(0, 1), (0, 1), (1, 1), (1, 2), (2, 3), (3, 0)]
    want = _numpy_pagerank(n, edge_list, 3)
    got = _spark_pagerank(spark, n, edge_list, 3)
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_tol_early_stop_still_correct(spark):
    # a symmetric cycle converges immediately (uniform is stationary);
    # tol-based stop must return the same uniform vector
    n = 6
    edge_list = [(i, (i + 1) % n) for i in range(n)]
    got = _spark_pagerank(spark, n, edge_list, 10, tol=1e-9)
    assert np.allclose(got, np.full(n, 1.0 / n), atol=1e-12)
