"""Raster<->vector round trip: membership in the vectorized rings ==
membership in the cell mask."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu
from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside
from geo_spark.kernel.raster import rasterize, vectorize_cells
from geo_spark.kernel.regions import Cap

RNG = np.random.default_rng(55)


def _ring_member(rings, pts):
    out = np.zeros(len(pts), dtype=bool)
    for ring in rings:
        oi = loop_origin_inside(ring)
        out ^= loop_contains_points(ring, oi, pts)
    return out


@pytest.mark.parametrize("lat,lng,r,level", [
    (40.7, -74.0, 0.05, 7),
    (-33.9, 151.2, 0.03, 8),
    (0.1, 0.1, 0.08, 6),  # face-0 center
])
def test_raster_vector_roundtrip(lat, lng, r, level):
    cap = Cap.from_center_angle(lat, lng, r)
    mask = rasterize(cap, level, max_cells=512)
    cells = [c for c, _ in mask]
    assert cells
    # interior flags are exact
    from geo_spark.kernel.cell import Cell

    for c, is_int in mask:
        assert is_int == cap.contains_cell(Cell.from_id(c))

    rings = vectorize_cells(cells)
    assert rings
    # sample points near the cap; ring membership == mask membership
    lat_s = lat + np.degrees(r) * RNG.uniform(-1.6, 1.6, 2500)
    lng_s = lng + np.degrees(r) * RNG.uniform(-1.6, 1.6, 2500)
    x, y, z = ck.latlng_to_xyz(lat_s, lng_s)
    pts = np.stack([x, y, z], axis=1)
    leaf = ck.cellid_from_latlng(lat_s, lng_s)
    cell_at = ck.parent(leaf, level)
    mask_set = set(cells)
    in_mask = np.array([int(c) in mask_set for c in cell_at])
    in_rings = _ring_member(rings, pts)
    mismatch = (in_mask != in_rings).mean()
    # boundary-grid points are measure-zero; allow a hair for exact-corner hits
    assert mismatch < 0.005, f"roundtrip mismatch {mismatch}"


def test_vectorize_single_cell_is_quad():
    leaf = int(ck.cellid_from_latlng(np.array([10.0]), np.array([20.0]))[0])
    cell = int(ck.parent(np.array([leaf], dtype=np.uint64), 5)[0])
    rings = vectorize_cells([cell])
    assert len(rings) == 1
    assert len(rings[0]) == 4


def test_vectorize_donut_has_hole_ring():
    # 3x3 block minus the center cell -> outer ring + hole ring.
    leaf = int(ck.cellid_from_latlng(np.array([20.0]), np.array([30.0]))[0])
    center = int(ck.parent(np.array([leaf], dtype=np.uint64), 8)[0])
    block = {center}
    for nb in ck.all_neighbors(center, 8):
        block.add(int(nb))
    assert len(block) == 9
    donut = sorted(block - {center})
    rings = vectorize_cells(donut)
    assert len(rings) == 2
    sizes = sorted(len(r) for r in rings)
    assert sizes == [4, 4]  # simplified outer square + inner square


def test_vectorize_diagonal_corner_touch():
    # Two cells sharing only a corner must come out as two separate
    # 4-vertex rings (regression: shared-corner half-edges used to
    # collide in a dict keyed by start corner alone).
    leaf = int(ck.cellid_from_latlng(np.array([40.0]), np.array([-100.0]))[0])
    base = int(ck.parent(np.array([leaf], dtype=np.uint64), 5)[0])
    f, i, j, _ = ck.face_ij_orientation(np.array([base], dtype=np.uint64))
    size = 1 << (30 - 5)
    diag = int(
        ck.cellid_from_face_ij(
            np.array([f[0]]), np.array([i[0] + size]), np.array([j[0] + size])
        )[0]
    )
    diag = int(ck.parent(np.array([diag], dtype=np.uint64), 5)[0])
    rings = vectorize_cells([base, diag])
    assert len(rings) == 2
    assert sorted(len(r) for r in rings) == [4, 4]
