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
