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


def test_l1_normalized_and_self_loops_dropped(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 2), (2, 2)]  # dup self-loops
    got = _run(spark, edges, range(3))
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0)
    # the 3-cycle is symmetric: every node equal on both scores
    for i in range(3):
        assert got[i][0] == pytest.approx(1 / 3)
        assert got[i][1] == pytest.approx(1 / 3)
