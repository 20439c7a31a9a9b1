"""Measure kernels vs closed-form golden values (hemisphere = 2*pi, face
additivity, planar limits) — the invariants the reference pins in
s2/point_measures_test.go / s2/loop_test.go."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import measures as M
from geo_spark.kernel.cell import Cell
from geo_spark.kernel.pip import latlng_text_to_xyz


def test_triangle_octant():
    # Octant triangle (three orthogonal axes) = 4*pi/8.
    a = np.array([1.0, 0, 0])
    b = np.array([0, 1.0, 0])
    c = np.array([0, 0, 1.0])
    assert M.point_area(a, b, c) == pytest.approx(math.pi / 2, rel=1e-14)
    assert M.girard_area(a, b, c) == pytest.approx(math.pi / 2, rel=1e-12)
    assert M.signed_area(a, b, c) == pytest.approx(math.pi / 2, rel=1e-14)
    assert M.signed_area(a, c, b) == pytest.approx(-math.pi / 2, rel=1e-14)


def test_tiny_triangle_planar_limit():
    eps = 1e-6
    a = np.array([1.0, 0, 0])
    b = np.array([1.0, eps, 0])
    c = np.array([1.0, 0, eps])
    b /= np.linalg.norm(b)
    c /= np.linalg.norm(c)
    assert M.point_area(a, b, c) == pytest.approx(0.5 * eps * eps, rel=1e-4)


def test_hemisphere_loop_area():
    north = latlng_text_to_xyz("0:-180, 0:-90, 0:0, 0:90")
    assert M.loop_area(north) == pytest.approx(2 * math.pi, rel=1e-12)
    # Reversed orientation measures the complement -> still 2*pi here.
    assert M.loop_area(north[::-1]) == pytest.approx(2 * math.pi, rel=1e-12)


def test_small_loop_area_and_centroid_direction():
    loop = latlng_text_to_xyz("40:-74, 40:-73, 41:-73, 41:-74")
    a = M.loop_area(loop)
    planar = math.radians(1) * math.radians(1) * math.cos(math.radians(40.5))
    assert a == pytest.approx(planar, rel=2e-2)
    cen = M.loop_centroid(loop)
    # |centroid| = area * mean(cos(spread)) -- slightly below the area.
    assert np.linalg.norm(cen) == pytest.approx(a, rel=1e-3)
    assert np.linalg.norm(cen) <= a
    cdir = cen / np.linalg.norm(cen)
    expect = latlng_text_to_xyz("40.5:-73.5")[0]
    assert float(cdir @ expect) > 0.999999


def test_polyline_length_quarter_equator():
    pl = latlng_text_to_xyz("0:0, 0:45, 0:90")
    assert M.polyline_length(pl) == pytest.approx(math.pi / 2, rel=1e-14)
    cen = M.polyline_centroid(pl)
    cdir = cen / np.linalg.norm(cen)
    expect = latlng_text_to_xyz("0:45")[0]
    assert float(cdir @ expect) == pytest.approx(1.0, abs=1e-12)


def test_cell_area_additivity_and_sphere_total():
    total = 0.0
    for f in range(6):
        total += M.cell_exact_area((f << 61) | (1 << 60))
    assert total == pytest.approx(4 * math.pi, rel=1e-12)
    # children sum to parent
    parent = Cell.from_id((0 << 61) | (1 << 60))
    kids = parent.children()
    ksum = sum(M.cell_exact_area(k.id) for k in kids)
    assert ksum == pytest.approx(M.cell_exact_area(parent.id), rel=1e-12)
    # average-area metric is exact in aggregate: 6*4^level cells
    assert 6 * M.cell_average_area(0) == pytest.approx(4 * math.pi, rel=1e-15)


def test_empty_full_loops():
    assert M.loop_area(np.array([[0.0, 0.0, 1.0]])) == 0.0
    assert M.loop_area(np.array([[0.0, 0.0, -1.0]])) == pytest.approx(4 * math.pi)
