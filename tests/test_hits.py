"""HITS hubs/authorities: structural sanity on graphs with known
hub/authority separation."""

import pytest

from geo_spark.operators.linkgraph import hits


def _run(spark, edges, nodes, iters=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(i,) for i in nodes], "id long")
    return {r["id"]: (r["hub"], r["auth"]) for r in hits(e, n, iters).collect()}


def test_star_graph_separates_hubs_from_authorities(spark):
    # spokes 1..4 all link to center 0: center is the sole authority,
    # spokes are equal hubs, and roles do NOT bleed (center's hub = 0).
    got = _run(spark, [(i, 0) for i in range(1, 5)], range(6))
    assert got[0][1] == pytest.approx(1.0)  # all authority mass
    assert got[0][0] == 0.0
    for i in range(1, 5):
        assert got[i][0] == pytest.approx(0.25)
        assert got[i][1] == 0.0
    assert got[5] == (0.0, 0.0)  # isolated node


def test_hits_matches_numpy_power_iteration(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n = 40
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, (150, 2))
        if a != b
    ]
    got = _run(spark, edges, range(n), iters=4)

    E = np.zeros((n, n))
    for a, b in set(edges):
        E[a, b] = 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(4):
        a = E.T @ h
        a = a / (a.sum() or 1.0)
        h = E @ a
        h = h / (h.sum() or 1.0)
    for i in range(n):
        assert abs(got[i][0] - h[i]) < 1e-12, i
        assert abs(got[i][1] - a[i]) < 1e-12, i


def test_l1_normalized_and_self_loops_dropped(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 2), (2, 2)]  # dup self-loops
    got = _run(spark, edges, range(3))
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0)
    # the 3-cycle is symmetric: every node equal on both scores
    for i in range(3):
        assert got[i][0] == pytest.approx(1 / 3)
        assert got[i][1] == pytest.approx(1 / 3)
