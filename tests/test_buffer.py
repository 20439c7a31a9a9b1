"""Buffer operation: buffered circle == bigger circle; distance property
(points within r of the loop are inside the buffer)."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import edges as E
from geo_spark.kernel.buffer import buffer_loop
from geo_spark.kernel.pip import (
    latlng_text_to_xyz,
    loop_contains_points,
    loop_origin_inside,
)
from geo_spark.kernel.regions import Cap, chord2_from_angle
from geo_spark.sources.layers import regular_loop_vertices

RNG = np.random.default_rng(31)


def test_buffered_circle_is_bigger_circle():
    r0, r = 0.05, 0.03
    loop = regular_loop_vertices(20.0, 30.0, r0, 64)
    buf = buffer_loop(loop, r, error_fraction=0.005)
    oi = loop_origin_inside(buf)
    cap_in = Cap.from_center_angle(20.0, 30.0, r0 + r - 0.004)
    cap_out = Cap.from_center_angle(20.0, 30.0, r0 + r + 0.004)
    # sample around the ring
    lat = 20.0 + np.degrees(RNG.uniform(-(r0 + r) * 1.5, (r0 + r) * 1.5, 3000))
    lng = 30.0 + np.degrees(RNG.uniform(-(r0 + r) * 1.5, (r0 + r) * 1.5, 3000))
    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    inside = loop_contains_points(buf, oi, pts)
    in_small = cap_in.contains_points(pts)
    in_big = cap_out.contains_points(pts)
    # strictly-inside cap points must be in the buffer; points outside
    # the outer cap must not be.
    assert np.all(inside[in_small])
    assert not np.any(inside[~in_big])


def test_buffer_distance_property_square():
    r = 0.02
    loop = latlng_text_to_xyz("10:10, 10:20, 20:20, 20:10")
    buf = buffer_loop(loop, r, error_fraction=0.002)
    oi_b = loop_origin_inside(buf)
    oi_l = loop_origin_inside(loop)
    lat = RNG.uniform(7, 23, 4000)
    lng = RNG.uniform(7, 23, 4000)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    in_loop = loop_contains_points(loop, oi_l, pts)
    chain = np.vstack([loop, loop[:1]])
    d2 = E.point_to_edges_chord2(pts, chain)
    within = in_loop | (d2 <= chord2_from_angle(r * 0.995))
    beyond = ~in_loop & (d2 >= chord2_from_angle(r * 1.005))
    in_buf = loop_contains_points(buf, oi_b, pts)
    assert np.all(in_buf[within])
    assert not np.any(in_buf[beyond])


class TestConcaveCleanup:
    """buffer_loop_rings: self-intersection cleanup for concave inputs
    (the offset-curve assembly the reference routes through its stubbed
    Builder).  Ground truth: membership sampling against the definition
    dist(p, loop) <= r or p inside loop."""

    @staticmethod
    def _member(rings, pts):
        from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside

        inside = np.zeros(len(pts), dtype=bool)
        for ring in rings:
            ring = np.asarray(ring)
            inside ^= loop_contains_points(ring, loop_origin_inside(ring), pts)
        return inside

    def _check(self, loop, r, rng, box, want_rings=None):
        import math

        from geo_spark.kernel.buffer import _min_dist_to_chain, buffer_loop_rings
        from geo_spark.kernel.booleans import robust_crossing
        from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside

        rings = buffer_loop_rings(loop, r, error_fraction=0.005)
        if want_rings is not None:
            assert len(rings) == want_rings
        # no residual self-intersections
        for ring in rings:
            n = len(ring)
            for i in range(n):
                for j in range(i + 2, n):
                    if i == 0 and j == n - 1:
                        continue
                    assert not robust_crossing(
                        ring[i], ring[(i + 1) % n], ring[j], ring[(j + 1) % n]
                    )
        lat = rng.uniform(box[0], box[1], 1500)
        lng = rng.uniform(box[2], box[3], 1500)
        x = np.cos(np.radians(lat)) * np.cos(np.radians(lng))
        y = np.cos(np.radians(lat)) * np.sin(np.radians(lng))
        z = np.sin(np.radians(lat))
        pts = np.stack([x, y, z], axis=1)
        in_loop = loop_contains_points(loop, loop_origin_inside(loop), pts)
        d = np.array([_min_dist_to_chain(p, loop) for p in pts])
        want = in_loop | (d <= r)
        got = self._member(rings, pts)
        clear = np.abs(d - r) > r * 0.04  # off the tessellated boundary band
        assert ((got == want) | ~clear).all()

    def test_u_shape(self):
        import math

        from geo_spark.kernel.pip import latlng_text_to_xyz

        u = latlng_text_to_xyz("0:0, 0:20, 20:20, 20:15, 5:15, 5:5, 20:5, 20:0")
        self._check(u, math.radians(1.5), np.random.default_rng(3), (-5, 25, -5, 25))

    def test_c_shape_preserves_cavity_hole(self):
        import math

        from geo_spark.kernel.pip import latlng_text_to_xyz

        c = latlng_text_to_xyz(
            "0:0, 0:20, 20:20, 20:10.5, 15:10.5, 15:15, 5:15, 5:5, 15:5, 15:9.5,"
            " 20:9.5, 20:0"
        )
        self._check(
            c, math.radians(0.8), np.random.default_rng(5), (-3, 23, -3, 23),
            want_rings=2,
        )

    def test_convex_unchanged(self):
        import math

        from geo_spark.kernel.buffer import buffer_loop, buffer_loop_rings
        from geo_spark.kernel.pip import latlng_text_to_xyz

        sq = latlng_text_to_xyz("0:0, 0:10, 10:10, 10:0")
        rings = buffer_loop_rings(sq, math.radians(2), error_fraction=0.005)
        assert len(rings) == 1
        assert np.array_equal(rings[0], buffer_loop(sq, math.radians(2), 0.005))


def test_buffered_pip_loops_within_contract_margin():
    """The q_buffer_pip margin claim, checked directly: every point of
    the buffered boundary (vertices AND edge midpoints) lies within
    [R - margin, R + margin] of the original loop boundary."""
    import numpy as np

    from __spark_entry__ import (
        _BUFFER_EF,
        _BUFFER_MARGIN,
        _BUFFER_R,
        _BUFFER_STEP,
        _PIP_LOOPS,
        _densify_loop,
    )
    from geo_spark.kernel.buffer import buffer_loop
    from geo_spark.kernel.edges import point_to_edges_chord2
    from geo_spark.kernel.pip import latlng_text_to_xyz
    from geo_spark.kernel.regions import chord2_from_angle

    lo = chord2_from_angle(_BUFFER_R - _BUFFER_MARGIN)
    hi = chord2_from_angle(_BUFFER_R + _BUFFER_MARGIN)
    for _g, t in _PIP_LOOPS:
        v = latlng_text_to_xyz(t)
        chain = np.vstack([v, v[:1]])
        bv = buffer_loop(_densify_loop(v, _BUFFER_STEP), _BUFFER_R, _BUFFER_EF)
        mids = bv + np.roll(bv, -1, axis=0)
        mids /= np.linalg.norm(mids, axis=1, keepdims=True)
        probes = np.vstack([bv, mids])
        c2 = point_to_edges_chord2(probes, chain)
        assert c2.min() >= lo, (c2.min(), lo)
        assert c2.max() <= hi, (c2.max(), hi)
