"""Skyline operator: brute-force dominance differential + plan shape.

The brute oracle is first principles: p survives iff no q has
q.x <= p.x and q.y <= p.y with a strict inequality.  Runs over seeded
random data (with planted duplicates), the anti-correlated worst case
(everything on the frontier), and grouped mode.
"""

import numpy as np
import pytest

from geo_spark.operators.skyline import skyline2d


def brute_frontier(xs, ys):
    keep = []
    for i in range(len(xs)):
        dominated = False
        for j in range(len(xs)):
            if i == j:
                continue
            if (
                xs[j] <= xs[i]
                and ys[j] <= ys[i]
                and (xs[j] < xs[i] or ys[j] < ys[i])
            ):
                dominated = True
                break
        keep.append(not dominated)
    return np.array(keep)


def _check(spark, xs, ys, groups=None, buckets=16):
    rows = [
        (int(i), (groups[i] if groups is not None else "g"), float(xs[i]), float(ys[i]))
        for i in range(len(xs))
    ]
    df = spark.createDataFrame(rows, "id long, grp string, x double, y double")
    by = ["grp"] if groups is not None else None
    got = {
        r["id"]
        for r in skyline2d(df, "x", "y", by=by, buckets=buckets).collect()
    }
    want = set()
    for g in set(groups) if groups is not None else {"g"}:
        idx = (
            [i for i in range(len(xs)) if groups[i] == g]
            if groups is not None
            else list(range(len(xs)))
        )
        keep = brute_frontier([xs[i] for i in idx], [ys[i] for i in idx])
        want |= {idx[k] for k in range(len(idx)) if keep[k]}
    assert got == want


def test_random_with_duplicates(spark):
    rng = np.random.default_rng(7)
    xs = np.round(rng.uniform(0, 100, 300), 1)
    ys = np.round(rng.uniform(0, 100, 300), 1)
    # plant exact duplicates, incl. of a likely-frontier point
    imin = int(np.argmin(xs + ys))
    xs = np.concatenate([xs, [xs[imin]] * 3])
    ys = np.concatenate([ys, [ys[imin]] * 3])
    _check(spark, xs, ys)


def test_anticorrelated_worst_case(spark):
    # y = 100 - x: every distinct point is on the frontier
    xs = np.arange(50, dtype=float)
    ys = 100.0 - xs
    _check(spark, xs, ys, buckets=4)


def test_correlated_tiny_frontier(spark):
    # y = x: the single minimum dominates everything else
    xs = np.arange(1, 60, dtype=float)
    ys = xs.copy()
    _check(spark, xs, ys)


def test_same_x_column(spark):
    # vertical stacks: only the lowest y at the smallest x survives;
    # equal (x, y) pairs both survive
    xs = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 3.0])
    ys = np.array([5.0, 2.0, 2.0, 1.0, 9.0, 0.5])
    _check(spark, xs, ys)


def test_grouped(spark):
    rng = np.random.default_rng(11)
    n = 200
    xs = np.round(rng.uniform(0, 10, n), 2)
    ys = np.round(rng.uniform(0, 10, n), 2)
    groups = [f"t{int(v)}" for v in rng.integers(0, 4, n)]
    _check(spark, xs, ys, groups=groups, buckets=8)


def test_plan_no_cartesian_no_python(spark):
    df = spark.range(1000).selectExpr(
        "id", "cast(id % 97 as double) as x", "cast(id % 89 as double) as y"
    )
    plan = skyline2d(df, "x", "y")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # both the bin-prefix table and the frontier come back broadcast
    assert "BroadcastHashJoin" in plan
