"""Edge kernels vs closed-form geometry."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel import edges as E
from geo_spark.kernel.pip import latlng_text_to_xyz


def _chord2(angle):
    return (2 * math.sin(angle / 2)) ** 2


def test_point_segment_interior():
    # Equator segment 0..90E; point at lat 10, lng 45 -> distance 10 deg.
    seg = latlng_text_to_xyz("0:0, 0:90")
    x = latlng_text_to_xyz("10:45")
    d = E.point_segment_chord2(x, seg[0][None, :], seg[1][None, :])[0]
    assert d == pytest.approx(_chord2(math.radians(10)), rel=1e-12)


def test_point_segment_endpoint():
    seg = latlng_text_to_xyz("0:0, 0:90")
    x = latlng_text_to_xyz("0:-20")  # behind a -> endpoint a, 20 deg
    d = E.point_segment_chord2(x, seg[0][None, :], seg[1][None, :])[0]
    assert d == pytest.approx(_chord2(math.radians(20)), rel=1e-12)


def test_point_on_segment_zero():
    seg = latlng_text_to_xyz("0:0, 0:90")
    x = latlng_text_to_xyz("0:30")
    d = E.point_segment_chord2(x, seg[0][None, :], seg[1][None, :])[0]
    assert d == pytest.approx(0.0, abs=1e-28)


def test_point_to_edges_chain():
    chain = latlng_text_to_xyz("0:0, 0:45, 45:45")
    x = latlng_text_to_xyz("10:20, 20:50")
    d = E.point_to_edges_chord2(x, chain)
    # first point: nearest to equator edge = 10 deg
    assert d[0] == pytest.approx(_chord2(math.radians(10)), rel=1e-10)
    assert d[1] < _chord2(math.radians(10))


def test_interpolate_and_project():
    a = latlng_text_to_xyz("0:0")[0]
    b = latlng_text_to_xyz("0:90")[0]
    mid = E.interpolate(a, b, 0.5)
    exp = latlng_text_to_xyz("0:45")[0]
    assert float(mid @ exp) == pytest.approx(1.0, abs=1e-14)
    x = latlng_text_to_xyz("20:30")[0]
    p = E.project(x, a, b)
    expp = latlng_text_to_xyz("0:30")[0]
    assert float(p @ expp) == pytest.approx(1.0, abs=1e-12)
    # beyond the arc -> endpoint
    x2 = latlng_text_to_xyz("5:120")[0]
    p2 = E.project(x2, a, b)
    assert np.allclose(p2, b)


def test_simplify_polyline_guarantee():
    # Zigzag along the equator with small noise; large tolerance ->
    # endpoints only; tiny tolerance -> all vertices kept.
    # Asymmetric zigzag: no three consecutive vertices exactly collinear.
    lats = [0, 0.013, -0.011, 0.021, 0.003, -0.017, 0.009, 0]
    txt = ", ".join(f"{la}:{i*2}" for i, la in enumerate(lats))
    verts = latlng_text_to_xyz(txt)
    idx_all = E.simplify_polyline(verts, 0.0)
    assert len(idx_all) == len(verts)
    idx_big = E.simplify_polyline(verts, math.radians(1.0))
    assert list(idx_big) == [0, len(verts) - 1]
    # Tolerance guarantee for an intermediate tolerance.
    tol = math.radians(0.015)
    idx = E.simplify_polyline(verts, tol)
    kept = verts[idx]
    for i in range(len(verts)):
        d = E.point_to_edges_chord2(verts[i][None, :], kept)[0]
        assert d <= (2 * math.sin(tol / 2)) ** 2 + 1e-15
