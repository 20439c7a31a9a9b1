"""CompareDistances cascade (s2/predicates.go:470-723 semantics): triage
vs exact differential, genuine-tie detection, and the kNN exact-tie
re-ranking."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest

from geo_spark.kernel import predicates as pred


def _exact_sign(x, a, b):
    da = sum((Fraction(float(x[i])) - Fraction(float(a[i]))) ** 2 for i in range(3))
    db = sum((Fraction(float(x[i])) - Fraction(float(b[i]))) ** 2 for i in range(3))
    return (da > db) - (da < db)


def test_cascade_matches_exact_oracle_near_ties():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4000, 3))
    x /= np.linalg.norm(x, axis=1)[:, None]
    a = rng.normal(size=(4000, 3))
    a /= np.linalg.norm(a, axis=1)[:, None]
    b = a + rng.normal(scale=1e-16, size=(4000, 3))
    b /= np.linalg.norm(b, axis=1)[:, None]
    got = pred.compare_distances_batch(x, a, b)
    exp = np.array([_exact_sign(x[i], a[i], b[i]) for i in range(len(x))])
    assert np.array_equal(got, exp)


def test_cascade_far_cases_triage_only():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(500, 3))
    x /= np.linalg.norm(x, axis=1)[:, None]
    a = rng.normal(size=(500, 3))
    a /= np.linalg.norm(a, axis=1)[:, None]
    b = rng.normal(size=(500, 3))
    b /= np.linalg.norm(b, axis=1)[:, None]
    got = pred.compare_distances_batch(x, a, b)
    exp = np.array([_exact_sign(x[i], a[i], b[i]) for i in range(len(x))])
    assert np.array_equal(got, exp)


def test_exact_equidistant_is_zero():
    x = np.array([1.0, 0.0, 0.0])
    a = np.array([0.0, 1.0, 0.0])
    b = np.array([0.0, -1.0, 0.0])
    assert pred.compare_distances(x, a, b) == 0
    assert pred.compare_distances(x, a, np.array([0.6, 0.8, 0.0])) == 1


def _find_double_tie_exact_diff(seed=11, n=200000):
    """A (x, a, b) triple whose chord2 doubles are equal but whose exact
    squared chords differ — the case only the exact tier can order."""
    rng = np.random.default_rng(seed)
    x = np.array([1.0, 0.0, 0.0])
    pts = rng.normal(size=(n, 3)) * 1e-14 + np.array([0.0, 1.0, 0.0])
    pts /= np.linalg.norm(pts, axis=1)[:, None]
    d = pts - x
    c2 = (d * d).sum(axis=1)
    order = np.argsort(c2, kind="stable")
    c2s = c2[order]
    dup = np.nonzero(c2s[1:] == c2s[:-1])[0]
    for i in dup:
        a, b = pts[order[i]], pts[order[i + 1]]
        if _exact_sign(x, a, b) != 0:
            return x, a, b
    raise AssertionError("no double-tie pair found; loosen the search")


def test_tie_run_resolution_orders_by_true_distance():
    from geo_spark.operators.knn import _resolve_tie_runs

    x, a, b = _find_double_tie_exact_diff()
    s = _exact_sign(x, a, b)  # nonzero by construction
    nearer, farther = (b, a) if s > 0 else (a, b)
    # tids chosen so default (chord2, tid) order would put the FARTHER
    # target first; exact resolution must flip them.
    tmat = np.stack([farther, nearer])
    tids = np.array([1, 2], dtype=np.int64)
    pts = x[None, :]
    d = pts[:, None, :] - tmat[None, :, :]
    chord2 = np.minimum((d * d).sum(axis=2), 4.0)
    assert chord2[0, 0] == chord2[0, 1]
    order = np.lexsort((np.broadcast_to(tids, chord2.shape), chord2), axis=1)
    topk = order[:, :2]
    assert list(topk[0]) == [0, 1]  # double order: farther (tid 1) first
    fixed = _resolve_tie_runs(pts, chord2, order, topk, 2, tmat, tids)
    assert list(fixed[0]) == [1, 0]  # exact order: nearer first


def test_knn_brute_exact_ties_flag(spark):
    # exact ties (mirror symmetry) still break by target id, with and
    # without the exact pass — the flag must not disturb settled order.
    from geo_spark.operators.knn import _knn_brute

    pts = spark.createDataFrame([(0, 0.0, 0.0)], "pid long, lat double, lng double")
    tg = spark.createDataFrame(
        [(1, 10.0, 30.0), (2, 10.0, -30.0), (3, -10.0, 30.0)],
        "tid long, lat double, lng double",
    )
    for flag in (False, True):
        got = [
            (r["tid"], r["rank"])
            for r in _knn_brute(
                pts, tg, 3, "pid", "tid", ("lat", "lng"), ("lat", "lng"),
                exact_ties=flag,
            ).orderBy("rank").collect()
        ]
        assert got == [(1, 1), (2, 2), (3, 3)]
