"""SignDotProd and CircleEdgeIntersectionOrdering cascades.

Differential strategy per the reference predicate tests
(s2/predicates_test.go): random inputs agree with plain float math away
from the error bound; constructed near-degenerate inputs fall through to
the rational tier, which is compared against fractions-based ground
truth.
"""

import math
from fractions import Fraction

import numpy as np

from geo_spark.kernel.predicates import (
    circle_edge_intersection_ordering,
    sign_dot_prod,
    triage_intersection_ordering,
    triage_sign_dot_prod,
)


def _rand_unit(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _exact_dot_sign(a, b):
    s = sum(Fraction(float(x)) * Fraction(float(y)) for x, y in zip(a, b))
    return (s > 0) - (s < 0)


class TestSignDotProd:
    def test_random_agrees_with_exact(self):
        rng = np.random.default_rng(3)
        a = _rand_unit(rng, 500)
        b = _rand_unit(rng, 500)
        got = sign_dot_prod(a, b)
        for i in range(500):
            assert got[i] == _exact_dot_sign(a[i], b[i])

    def test_orthogonal_exact_zero(self):
        # exactly orthogonal in float: dot is exactly zero
        a = np.array([[1.0, 0.0, 0.0]])
        b = np.array([[0.0, 1.0, 0.0]])
        assert triage_sign_dot_prod(a, b)[0] == 0  # triage can't decide
        assert sign_dot_prod(a, b)[0] == 0  # exact says truly zero

    def test_near_orthogonal_resolved_exactly(self):
        # a . b is tiny but nonzero; triage is indeterminate, the exact
        # tier must recover the true sign
        eps = 2.0**-60
        a = np.array([[1.0, 0.0, 0.0]])
        b = np.array([[eps, 1.0, 0.0]])
        b /= np.linalg.norm(b)
        assert triage_sign_dot_prod(a, b)[0] == 0
        assert sign_dot_prod(a, b)[0] == 1
        assert sign_dot_prod(a, -b)[0] == -1

    def test_antipodal_and_equal(self):
        a = _rand_unit(np.random.default_rng(5), 10)
        assert (sign_dot_prod(a, a) == 1).all()
        assert (sign_dot_prod(a, -a) == -1).all()


class TestCircleEdgeIntersectionOrdering:
    """Edges crossing the great circle z=0 (normal M=+z), ordered
    relative to the circle y=0 (normal N=+y): the crossing longitude
    orders the edges."""

    M = np.array([[0.0, 0.0, 1.0]])
    N = np.array([[0.0, 1.0, 0.0]])

    @staticmethod
    def _edge_crossing_at(lng, tilt=0.3):
        """Edge from above to below the equator crossing it at ``lng``."""
        a = np.array(
            [
                math.cos(tilt) * math.cos(lng),
                math.cos(tilt) * math.sin(lng),
                math.sin(tilt),
            ]
        )
        b = np.array(
            [
                math.cos(tilt) * math.cos(lng),
                math.cos(tilt) * math.sin(lng),
                -math.sin(tilt),
            ]
        )
        return a, b

    def test_orders_by_crossing_longitude(self):
        rng = np.random.default_rng(7)
        for _ in range(200):
            # keep crossings in (0, pi/2): quadrant-one requirement
            l1, l2 = rng.uniform(0.05, math.pi / 2 - 0.05, 2)
            a, b = self._edge_crossing_at(l1)
            c, d = self._edge_crossing_at(l2)
            got = int(
                circle_edge_intersection_ordering(
                    a[None], b[None], c[None], d[None], self.M, self.N
                )[0]
            )
            # equal-magnitude edges: larger longitude = further from N
            want = int(l1 > l2) - int(l1 < l2)
            assert got == want, (l1, l2, got)

    def test_duplicate_edges_zero(self):
        # identical edges: triage diff is exactly zero, the duplicate
        # short-circuit answers 0 without the exact tier
        a, b = self._edge_crossing_at(0.7)
        r = circle_edge_intersection_ordering(
            a[None], b[None], a[None], b[None], self.M, self.N
        )
        assert r[0] == 0

    @staticmethod
    def _exact_ordering(a, b, c, d, m, n):
        """Ground truth: exact rational quadruple-product comparison."""

        def fdp(x, y):
            return sum(Fraction(float(u)) * Fraction(float(v)) for u, v in zip(x, y))

        p_ab = fdp(m, a) * fdp(n, b) - fdp(m, b) * fdp(n, a)
        p_cd = fdp(m, c) * fdp(n, d) - fdp(m, d) * fdp(n, c)
        return int(p_ab > p_cd) - int(p_ab < p_cd)

    def test_differential_vs_rational_ground_truth(self):
        rng = np.random.default_rng(13)
        m = self.M[0]
        n = self.N[0]
        for _ in range(300):
            l1 = rng.uniform(0.05, math.pi / 2 - 0.05)
            # half the cases: near-tie below the triage bound
            if rng.uniform() < 0.5:
                l2 = l1 + rng.choice([-1, 1]) * 2.0 ** rng.integers(-55, -45)
            else:
                l2 = rng.uniform(0.05, math.pi / 2 - 0.05)
            t1 = rng.uniform(0.1, 1.0)
            t2 = rng.uniform(0.1, 1.0)
            a, b = self._edge_crossing_at(l1, tilt=t1)
            c, d = self._edge_crossing_at(float(l2), tilt=t2)
            got = int(
                circle_edge_intersection_ordering(
                    a[None], b[None], c[None], d[None], self.M, self.N
                )[0]
            )
            assert got == self._exact_ordering(a, b, c, d, m, n), (l1, l2, t1, t2)

    def test_nearly_equal_crossings_resolved_exactly(self):
        # crossings separated by ~2^-52 radians: below the 32-eps triage
        # bound, so the rational tier must order; antisymmetry must hold
        l1 = 0.5
        l2 = 0.5 + 2.0**-52
        a, b = self._edge_crossing_at(l1)
        c, d = self._edge_crossing_at(l2)
        assert (
            triage_intersection_ordering(
                a[None], b[None], c[None], d[None], self.M, self.N
            )[0]
            == 0
        )
        fwd = int(
            circle_edge_intersection_ordering(
                a[None], b[None], c[None], d[None], self.M, self.N
            )[0]
        )
        rev = int(
            circle_edge_intersection_ordering(
                c[None], d[None], a[None], b[None], self.M, self.N
            )[0]
        )
        assert fwd == self._exact_ordering(a, b, c, d, self.M[0], self.N[0])
        assert fwd == -rev != 0

    def test_batch_with_broadcast_normals(self):
        lngs = np.linspace(0.1, 1.4, 20)
        edges = [self._edge_crossing_at(l) for l in lngs]
        a = np.stack([e[0] for e in edges])
        b = np.stack([e[1] for e in edges])
        ref_a, ref_b = self._edge_crossing_at(0.7)
        c = np.broadcast_to(ref_a, a.shape)
        d = np.broadcast_to(ref_b, b.shape)
        got = circle_edge_intersection_ordering(a, b, c, d, self.M, self.N)
        want = np.sign(lngs - 0.7).astype(int)
        assert (got == want).all()
