"""Dynamic-timewarp vertex alignment.

Ground truth: a direct transcription of the reference's rolling-array DP
(s2/polyline_alignment.go:385-403) run per cell in the test, plus the
module's worked example (cost matrix / warp path at
s2/polyline_alignment.go:47-77).
"""

import math

import numpy as np

from geo_spark.kernel.alignment import (
    approx_alignment,
    approx_alignment_cost,
    exact_alignment,
    exact_alignment_cost,
    half_resolution,
    medoid_index,
    pairwise_chordal,
)


def _scalar_cost(a, b):
    """Reference rolling-array DP, cell by cell."""
    n, m = len(a), len(b)
    cost = [math.inf] * m
    left_diag_min = 0.0
    for row in range(n):
        for col in range(m):
            up = cost[col]
            cost[col] = min(left_diag_min, up) + float(
                np.linalg.norm(a[row] - b[col])
            )
            left_diag_min = min(cost[col], up)
        left_diag_min = math.inf
    return cost[-1]


def _rand_chain(rng, n, scale=0.3):
    base = rng.normal(size=3)
    base /= np.linalg.norm(base)
    pts = base + scale * rng.normal(size=(n, 3)).cumsum(axis=0) / n
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


class TestExact:
    def test_worked_example(self):
        # planar example from the module docs (s2/polyline_alignment.go:
        # 47-77); the doc's DP table bottom-right cell is 5 (its prose
        # says "alignment_cost = 7", contradicting its own table — the
        # path 1+2+1+1 sums to 5)
        a = np.array([[1, 0, 0], [5, 0, 0], [6, 0, 0], [9, 0, 0]], dtype=float)
        b = np.array([[2, 0, 0], [7, 0, 0], [8, 0, 0]], dtype=float)
        assert exact_alignment_cost(a, b) == 5.0
        cost, path = exact_alignment(a, b)
        assert cost == 5.0
        assert path == [(0, 0), (1, 1), (2, 1), (3, 2)]

    def test_differential_vs_scalar_dp(self):
        rng = np.random.default_rng(3)
        for _ in range(40):
            n = int(rng.integers(1, 30))
            m = int(rng.integers(1, 30))
            a = _rand_chain(rng, n)
            b = _rand_chain(rng, m)
            want = _scalar_cost(a, b)
            assert abs(exact_alignment_cost(a, b) - want) < 1e-12
            cost, path = exact_alignment(a, b)
            assert abs(cost - want) < 1e-12
            # path invariants: starts at (0,0), ends at (n-1,m-1),
            # monotone single steps
            assert path[0] == (0, 0) and path[-1] == (n - 1, m - 1)
            for (i0, j0), (i1, j1) in zip(path, path[1:]):
                assert (i1 - i0, j1 - j0) in ((1, 1), (1, 0), (0, 1))
            # path cost equals reported cost
            c = pairwise_chordal(a, b)
            assert abs(sum(c[i, j] for i, j in path) - cost) < 1e-12

    def test_identical_chains_zero_cost(self):
        rng = np.random.default_rng(5)
        a = _rand_chain(rng, 20)
        cost, path = exact_alignment(a, a)
        assert cost < 1e-15
        assert path == [(i, i) for i in range(20)]


class TestApprox:
    def test_upper_bound_and_convergence(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            a = _rand_chain(rng, 120)
            b = _rand_chain(rng, 100)
            exact = exact_alignment_cost(a, b)
            prev = math.inf
            for radius in (1, 4, 16):
                approx = approx_alignment_cost(a, b, radius)
                assert approx >= exact - 1e-12  # windowed search can't beat exact
                assert approx <= prev + 1e-12 or approx <= exact * 1.2
                prev = approx
            # generous radius must recover the exact cost
            assert abs(approx_alignment_cost(a, b, 64) - exact) < 1e-12

    def test_approx_path_valid(self):
        rng = np.random.default_rng(9)
        a = _rand_chain(rng, 90)
        b = _rand_chain(rng, 70)
        cost, path = approx_alignment(a, b, radius=3)
        assert path[0] == (0, 0) and path[-1] == (len(a) - 1, len(b) - 1)
        c = pairwise_chordal(a, b)
        assert abs(sum(c[i, j] for i, j in path) - cost) < 1e-12

    def test_half_resolution(self):
        a = np.arange(21).reshape(7, 3).astype(float)
        h = half_resolution(a)
        assert (h == a[::2]).all()


class TestMedoid:
    def test_picks_central_chain(self):
        rng = np.random.default_rng(11)
        center = _rand_chain(rng, 30)
        chains = [center]
        for k in range(4):
            noisy = center + 0.05 * (k + 1) * rng.normal(size=center.shape)
            noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
            chains.append(noisy)
        # ground truth: brute-force summed pairwise scalar-DP costs
        k = len(chains)
        totals = np.zeros(k)
        for i in range(k):
            for j in range(i + 1, k):
                c = _scalar_cost(chains[i], chains[j])
                totals[i] += c
                totals[j] += c
        want = int(np.argmin(totals))
        assert medoid_index(chains) == want
        assert medoid_index(chains, approx_radius=16) == want


def _brute_frechet(a, b):
    import functools

    from geo_spark.kernel.alignment import pairwise_chordal

    c = pairwise_chordal(a, b)
    n, m = c.shape

    @functools.lru_cache(None)
    def f(i, j):
        if i == 0 and j == 0:
            return c[0, 0]
        opts = []
        if i > 0:
            opts.append(f(i - 1, j))
        if j > 0:
            opts.append(f(i, j - 1))
        if i > 0 and j > 0:
            opts.append(f(i - 1, j - 1))
        return max(c[i, j], min(opts))

    return f(n - 1, m - 1)


def test_frechet_matches_brute_recursion():
    from geo_spark.kernel.alignment import (
        exact_alignment_cost,
        frechet_distance,
    )

    rng = np.random.default_rng(7)
    for t in range(60):
        a = rng.normal(size=(int(rng.integers(1, 10)), 3))
        b = rng.normal(size=(int(rng.integers(1, 10)), 3))
        got = frechet_distance(a, b)
        assert abs(got - _brute_frechet(a, b)) < 1e-12, t
        # a min-sum over any coupling dominates its max term
        assert got <= exact_alignment_cost(a, b) + 1e-12


def test_frechet_identity_and_single_point():
    from geo_spark.kernel.alignment import frechet_distance

    a = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    assert frechet_distance(a, a) == 0.0
    # one-point anchor: collapses to max vertex distance
    anchor = np.array([[1.0, 0.0, 0.0]])
    want = max(np.linalg.norm(v - anchor[0]) for v in a)
    assert abs(frechet_distance(a, anchor) - want) < 1e-15
