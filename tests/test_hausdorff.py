"""Rect Hausdorff distances vs brute-force sampling.

Mirrors the reference's verification strategy
(s2/rect_test.go:956-1013 verifyDirectedHausdorffDistance): sample points
of A on a ~0.1 rad grid, take the max of the exact point-to-rect
distance, and require
    sampled_max - 1e-10 <= h(A,B) <= sampled_max + resolution.
"""

import math

import numpy as np
import pytest

from geo_spark.kernel.interval import (
    R1Interval,
    Rect,
    S1Interval,
    r1_directed_hausdorff,
    rect_directed_hausdorff,
    rect_distance_to_latlng,
    rect_hausdorff,
    s1_directed_hausdorff,
)

RESOLUTION = 0.1


def _verify_directed(a: Rect, b: Rect):
    n_lat = int(a.lat.length() / RESOLUTION) + 2
    n_lng = int(a.lng.length() / RESOLUTION) + 2
    lats = np.linspace(a.lat.lo, a.lat.hi, n_lat)
    dlng = a.lng.length()
    lngs = a.lng.lo + np.linspace(0.0, dlng, n_lng)
    lngs = np.mod(lngs + math.pi, 2 * math.pi) - math.pi
    sampled = 0.0
    for lat in lats:
        for lng in lngs:
            sampled = max(sampled, rect_distance_to_latlng(b, float(lat), float(lng)))
    got = rect_directed_hausdorff(a, b)
    assert got >= sampled - 1e-10, (a, b, got, sampled)
    assert got <= sampled + RESOLUTION, (a, b, got, sampled)


def _rect_from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> Rect:
    return Rect(
        R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
        S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
    )


class TestIntervalHausdorff:
    def test_r1_basic(self):
        a = R1Interval(0.0, 1.0)
        assert r1_directed_hausdorff(a, a) == 0.0
        assert r1_directed_hausdorff(R1Interval(0, 1), R1Interval(2, 3)) == 2.0
        assert r1_directed_hausdorff(R1Interval(2, 3), R1Interval(0, 1)) == 2.0
        # contained: zero
        assert r1_directed_hausdorff(R1Interval(0.2, 0.8), R1Interval(0, 1)) == 0.0
        assert r1_directed_hausdorff(R1Interval.empty(), a) == 0.0

    def test_s1_basic(self):
        a = S1Interval(-0.5, 0.5)
        assert s1_directed_hausdorff(a, a) == 0.0
        assert s1_directed_hausdorff(S1Interval(-0.2, 0.2), a) == 0.0
        # disjoint on the circle
        got = s1_directed_hausdorff(S1Interval(1.0, 1.2), S1Interval(2.0, 2.2))
        assert got == pytest.approx(1.0, abs=1e-12)
        # wrapping interval vs plain interval
        got = s1_directed_hausdorff(S1Interval(3.0, -3.0), S1Interval(0.0, 0.1))
        assert got > 0

    def test_s1_brute_differential(self):
        rng = np.random.default_rng(5)
        for _ in range(300):
            lo1, lo2 = rng.uniform(-math.pi, math.pi, 2)
            a = S1Interval(lo1, float(np.mod(lo1 + rng.uniform(0, 3) + math.pi, 2 * math.pi) - math.pi))
            b = S1Interval(lo2, float(np.mod(lo2 + rng.uniform(0, 3) + math.pi, 2 * math.pi) - math.pi))
            got = s1_directed_hausdorff(a, b)
            # brute force over samples of a
            thetas = np.mod(a.lo + np.linspace(0, a.length(), 500) + math.pi, 2 * math.pi) - math.pi
            brute = 0.0
            for t in thetas:
                if b.contains(float(t)):
                    continue
                d_lo = abs(float(np.mod(t - b.lo + math.pi, 2 * math.pi) - math.pi))
                d_hi = abs(float(np.mod(t - b.hi + math.pi, 2 * math.pi) - math.pi))
                brute = max(brute, min(d_lo, d_hi))
            assert got >= brute - 1e-9
            assert got <= brute + a.length() / 499 + 1e-9


class TestRectHausdorff:
    def test_empty_semantics(self):
        a = _rect_from_degrees(0, 0, 10, 10)
        assert rect_directed_hausdorff(Rect.empty(), a) == 0.0
        assert rect_directed_hausdorff(a, Rect.empty()) == math.pi

    def test_contained_is_zero(self):
        # reference TestDirectedHausdorffDistanceContained
        a = _rect_from_degrees(-10, -10, 10, 10)
        for b in [
            _rect_from_degrees(-10, -10, 10, 10),
            _rect_from_degrees(-15, -10, 10, 10),
            _rect_from_degrees(-10, -15, 10, 10),
            _rect_from_degrees(-15, -15, 15, 15),
        ]:
            assert rect_directed_hausdorff(a, b) == 0.0

    def test_point_to_rect(self):
        # distance from a degenerate (point) rect equals point-rect distance
        p = _rect_from_degrees(5, 8, 5, 8)
        b = _rect_from_degrees(-20, -50, -10, -40)
        got = rect_directed_hausdorff(p, b)
        want = rect_distance_to_latlng(b, math.radians(5), math.radians(8))
        assert got == pytest.approx(want, abs=1e-12)

    def test_symmetric_max(self):
        a = _rect_from_degrees(-10, -10, 10, 10)
        b = _rect_from_degrees(0, 0, 40, 40)
        h = rect_hausdorff(a, b)
        assert h == max(
            rect_directed_hausdorff(a, b), rect_directed_hausdorff(b, a)
        )
        assert rect_hausdorff(a, b) == rect_hausdorff(b, a)

    def test_directed_random_pairs_sampled(self):
        # reference TestRectDirectedHausdorffDistanceRandomPairs
        rng = np.random.default_rng(11)
        for k in range(60):
            lat = np.sort(rng.uniform(-80, 80, 4))
            lng = rng.uniform(-180, 180, 4)
            a = _rect_from_degrees(lat[0], lng[0], lat[1], lng[1])
            b = _rect_from_degrees(lat[2], lng[2], lat[3], lng[3])
            _verify_directed(a, b)
            _verify_directed(b, a)

    def test_directed_antimeridian_and_poleward(self):
        cases = [
            (_rect_from_degrees(10, 170, 30, -170), _rect_from_degrees(-20, 50, 0, 70)),
            (_rect_from_degrees(70, -30, 80, 30), _rect_from_degrees(-80, 150, -70, -150)),
            (_rect_from_degrees(-5, -10, 5, 10), _rect_from_degrees(-5, 170, 5, -170)),
        ]
        for a, b in cases:
            _verify_directed(a, b)
            _verify_directed(b, a)

    def test_opposite_lng_case(self):
        # lngDiff > pi/2 exercises the bisector/interior-max branches
        a = _rect_from_degrees(-30, 0, 30, 10)
        b = _rect_from_degrees(-20, 140, 20, 150)
        _verify_directed(a, b)
        _verify_directed(b, a)
