"""Greedy k-center coreset selection: python-spec differential +
structural pins (determinism, tie rule, k > N)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401


def _brute_kcenter(vecs: dict[int, list[float]], k, shift=1.0, scale=1e6):
    q = {
        i: [math.floor((x + shift) * scale) for x in v]
        for i, v in vecs.items()
    }
    first = min(q)
    picks = [(0, first, 0)]
    chosen = {first}
    best = {
        i: sum((a - b) * (a - b) for a, b in zip(q[i], q[first]))
        for i in q
        if i != first
    }
    for s in range(1, k):
        if not best:
            break
        pid = max(best, key=lambda i: (best[i], -i))
        picks.append((s, pid, best[pid]))
        chosen.add(pid)
        del best[pid]
        for i in best:
            d = sum((a - b) * (a - b) for a, b in zip(q[i], q[pid]))
            best[i] = min(best[i], d)
    return picks


def test_kcenter_random_differential(spark):
    from geo_spark.operators.coreset import kcenter_select

    rng = np.random.default_rng(5)
    vecs = {i: [float(x) for x in rng.uniform(-1, 1, 6)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, v array<double>"
    )
    got = [
        (r["pick_order"], r["id"], r["r2"])
        for r in kcenter_select(df, "id", "v", k=7)
        .orderBy("pick_order")
        .collect()
    ]
    assert got == _brute_kcenter(vecs, 7)
    # r2 sequence is non-increasing after pick 0 (greedy invariant)
    r2s = [r2 for _, _, r2 in got[1:]]
    assert r2s == sorted(r2s, reverse=True)


def test_kcenter_tie_and_exhaustion(spark):
    from geo_spark.operators.coreset import kcenter_select

    # two corners equidistant from the start: smallest id wins the tie;
    # k > N stops at N picks
    vecs = {
        0: [0.0, 0.0],
        1: [1.0, 0.0],
        2: [0.0, 1.0],
        3: [0.1, 0.1],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, v array<double>"
    )
    got = [
        (r["pick_order"], r["id"], r["r2"])
        for r in kcenter_select(df, "id", "v", k=10)
        .orderBy("pick_order")
        .collect()
    ]
    assert got == _brute_kcenter(vecs, 10)
    assert len(got) == 4
    assert got[0] == (0, 0, 0)
    assert got[1][1] == 1  # tie between ids 1 and 2 -> smallest id


def test_kcenter_duplicates(spark):
    from geo_spark.operators.coreset import kcenter_select

    # exact duplicates never beat a distinct far point, and a
    # duplicate of a chosen center has r2=0 if forced late
    vecs = {0: [0.0], 1: [0.0], 2: [5.0], 3: [5.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "id long, v array<double>"
    )
    got = [
        (r["pick_order"], r["id"], r["r2"])
        for r in kcenter_select(df, "id", "v", k=4)
        .orderBy("pick_order")
        .collect()
    ]
    assert got == _brute_kcenter(vecs, 4)
    assert [g[1] for g in got] == [0, 2, 1, 3]
    assert got[2][2] == 0 and got[3][2] == 0
