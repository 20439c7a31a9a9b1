"""Degenerate boolean-operation cases: identical loops, exact shared
edges (seams), nested loops sharing boundary edges.

These are the configurations the reference's AI-ported BooleanOperation
explicitly ignores (s2/boolean_operation.go:122-124 "does not handle
degenerate crossings at shared vertices"); we follow the C++
S2BooleanOperation *results* instead: coincident geometry collapses to a
single representative and seam edges are kept exactly when they separate
interior from exterior of the result region.  Scope: whole-edge exact
coincidence (snapped / cell-derived geometry); partial collinear overlap
remains out of scope.
"""

import math

import numpy as np
import pytest

from geo_spark.kernel.booleans import loop_boolean
from geo_spark.kernel.measures import loop_area
from geo_spark.kernel.pip import (
    latlng_text_to_xyz,
    loop_contains_points,
    loop_origin_inside,
)

SQ = latlng_text_to_xyz("0:0, 0:10, 10:10, 10:0")
SQ_EAST = latlng_text_to_xyz("0:10, 0:20, 10:20, 10:10")  # shares lng=10 edge
TRI = latlng_text_to_xyz("0:0, 0:10, 10:10")  # inside SQ, shares 2 edges

A_SQ = loop_area(SQ)
A_TRI = loop_area(TRI)


def _area(rings):
    return sum(loop_area(np.asarray(r)) for r in rings)


CASES = [
    # (a, b, op, want_area)
    (SQ, SQ, "union", A_SQ),
    (SQ, SQ, "intersection", A_SQ),
    (SQ, SQ, "difference", 0.0),
    (SQ, SQ_EAST, "union", 2 * A_SQ),
    (SQ, SQ_EAST, "intersection", 0.0),
    (SQ, SQ_EAST, "difference", A_SQ),
    (SQ_EAST, SQ, "union", 2 * A_SQ),
    (SQ_EAST, SQ, "difference", A_SQ),
    (SQ, TRI, "union", A_SQ),
    (SQ, TRI, "intersection", A_TRI),
    (SQ, TRI, "difference", A_SQ - A_TRI),
    (TRI, SQ, "union", A_SQ),
    (TRI, SQ, "intersection", A_TRI),
    (TRI, SQ, "difference", 0.0),
]


@pytest.mark.parametrize("a,b,op,want", CASES)
def test_degenerate_areas(a, b, op, want):
    got = _area(loop_boolean(a, b, op))
    assert got == pytest.approx(want, abs=5e-6)


def test_point_membership_sampling():
    # region membership of the result must equal the set-operation of
    # the inputs' memberships, sampled away from boundaries
    rng = np.random.default_rng(3)
    lat = rng.uniform(-5, 15, 400)
    lng = rng.uniform(-5, 25, 400)
    # keep samples off the shared boundary lng=10 and off all edges
    keep = (np.abs(lng - 10) > 0.3) & (np.abs(lng - 0) > 0.3) & (
        np.abs(lng - 20) > 0.3
    ) & (np.abs(lat - 0) > 0.3) & (np.abs(lat - 10) > 0.3)
    lat, lng = lat[keep], lng[keep]
    x = np.cos(np.radians(lat)) * np.cos(np.radians(lng))
    y = np.cos(np.radians(lat)) * np.sin(np.radians(lng))
    z = np.sin(np.radians(lat))
    pts = np.stack([x, y, z], axis=1)

    def member(rings, p):
        inside = np.zeros(len(p), dtype=bool)
        for r in rings:
            r = np.asarray(r)
            oi = loop_origin_inside(r)
            inside ^= loop_contains_points(r, oi, p)  # XOR-parity convention
        return inside

    in_a = member([SQ], pts)
    in_b = member([SQ_EAST], pts)
    got_u = member(loop_boolean(SQ, SQ_EAST, "union"), pts)
    got_d = member(loop_boolean(SQ, SQ_EAST, "difference"), pts)
    assert (got_u == (in_a | in_b)).all()
    assert (got_d == (in_a & ~in_b)).all()

    in_t = member([TRI], pts)
    got_i = member(loop_boolean(SQ, TRI, "intersection"), pts)
    got_d2 = member(loop_boolean(SQ, TRI, "difference"), pts)
    assert (got_i == (in_a & in_t)).all()
    assert (got_d2 == (in_a & ~in_t)).all()


def test_identical_loops_rotated_start():
    # same cycle written from a different starting vertex still collapses
    rot = np.roll(SQ, 2, axis=0)
    assert _area(loop_boolean(SQ, rot, "union")) == pytest.approx(A_SQ, abs=1e-12)
    assert loop_boolean(SQ, rot, "difference") == []


PARTIAL_A = latlng_text_to_xyz("0:0, 0:10, 10:10, 10:0")
PARTIAL_B = latlng_text_to_xyz("0:5, 0:15, 10:15, 10:5")  # equator overlap 5..10


class TestPartialCollinearOverlap:
    """Edges sharing a sub-segment of one great circle without matching
    vertices: the pre-pass inserts the other chain's interior endpoints
    (exact copies) so the overlap becomes a whole-edge seam."""

    @staticmethod
    def _member(rings, pts):
        inside = np.zeros(len(pts), dtype=bool)
        for r in rings:
            r = np.asarray(r)
            inside ^= loop_contains_points(r, loop_origin_inside(r), pts)
        return inside

    def _sample(self):
        rng = np.random.default_rng(5)
        lat = rng.uniform(-3, 13, 2000)
        lng = rng.uniform(-3, 18, 2000)
        keep = np.ones(len(lat), dtype=bool)
        for e in (0, 10):
            keep &= np.abs(lat - e) > 0.25
        for e in (0, 5, 10, 15):
            keep &= np.abs(lng - e) > 0.25
        lat, lng = lat[keep], lng[keep]
        x = np.cos(np.radians(lat)) * np.cos(np.radians(lng))
        y = np.cos(np.radians(lat)) * np.sin(np.radians(lng))
        z = np.sin(np.radians(lat))
        return np.stack([x, y, z], axis=1)

    def test_membership_all_ops(self):
        pts = self._sample()
        in_a = self._member([PARTIAL_A], pts)
        in_b = self._member([PARTIAL_B], pts)
        for op, want in (
            ("union", in_a | in_b),
            ("intersection", in_a & in_b),
            ("difference", in_a & ~in_b),
        ):
            got = self._member(loop_boolean(PARTIAL_A, PARTIAL_B, op), pts)
            assert (got == want).all(), op

    def test_inclusion_exclusion_area(self):
        a_u = _area(loop_boolean(PARTIAL_A, PARTIAL_B, "union"))
        a_i = _area(loop_boolean(PARTIAL_A, PARTIAL_B, "intersection"))
        assert a_u + a_i == pytest.approx(
            loop_area(PARTIAL_A) + loop_area(PARTIAL_B), abs=1e-9
        )

    def test_collinear_disjoint_untouched(self):
        # same great circle (equator edges), spans do not overlap:
        # nothing to insert, plain containment path answers
        far = latlng_text_to_xyz("0:20, 0:30, 10:30, 10:20")
        assert loop_boolean(PARTIAL_A, far, "intersection") == []
        assert _area(loop_boolean(PARTIAL_A, far, "union")) == pytest.approx(
            loop_area(PARTIAL_A) + loop_area(far), abs=1e-9
        )
