"""Hex-tiling invariants: sphere partition, ~7x refinement, center
round-trips, parent consistency, neighbor geometry."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import hexgrid as H

RNG = np.random.default_rng(11)


def _random_latlng(n):
    lat = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    lng = RNG.uniform(-180, 180, n)
    return lat, lng


def test_partition_and_determinism():
    lat, lng = _random_latlng(5000)
    a = H.latlng_to_hex(lat, lng, 5)
    b = H.latlng_to_hex(lat, lng, 5)
    assert np.array_equal(a, b)
    face, res, q, r = H.unpack(a)
    assert np.all((face >= 0) & (face < 20))
    assert np.all(res == 5)


def test_refinement_factor():
    lat, lng = _random_latlng(60000)
    c2 = len(np.unique(H.latlng_to_hex(lat, lng, 2)))
    c3 = len(np.unique(H.latlng_to_hex(lat, lng, 3)))
    ratio = c3 / c2
    assert 5.0 < ratio < 9.0, f"aperture-7 refinement ratio {ratio}"


def test_center_roundtrip():
    lat, lng = _random_latlng(2000)
    # Residual center-instability is confined to face-edge cells, whose
    # population shrinks ~1/sqrt(7)^res.
    for res, min_rate in ((1, 0.97), (4, 0.995), (7, 0.9995)):
        h = H.latlng_to_hex(lat, lng, res)
        clat, clng = H.hex_center(h)
        h2 = H.latlng_to_hex(clat, clng, res)
        # center of a cell maps back to the cell
        assert (h2 == h).mean() > min_rate
        # the point is within ~1 hex circumradius of its cell center
        from geo_spark.kernel.cellid import latlng_to_xyz

        px, py, pz = latlng_to_xyz(lat, lng)
        cx, cy, cz = latlng_to_xyz(clat, clng)
        chord = np.sqrt((px - cx) ** 2 + (py - cy) ** 2 + (pz - cz) ** 2)
        max_r = 2.5 * H.SCALE_BASE / np.sqrt(7.0) ** res
        assert np.quantile(chord, 0.99) < max_r


def test_parent_consistency():
    lat, lng = _random_latlng(3000)
    child = H.latlng_to_hex(lat, lng, 6)
    parent_direct = H.latlng_to_hex(lat, lng, 5)
    parent_via = H.hex_parent(child, 5)
    # Aperture-7 isn't exactly nested; H3's own containment rate for a
    # point's (child-parent) agreement is ~ area ratio — expect high.
    agree = (parent_direct == parent_via).mean()
    assert agree > 0.85, f"parent agreement {agree}"


def test_ring1_geometry():
    h = int(H.latlng_to_hex(np.array([40.7]), np.array([-74.0]), 6)[0])
    ring = H.hex_ring1(h)
    assert 4 <= len(ring) <= 6
    assert h not in ring
    clat, clng = H.hex_center(np.array([h]))
    rlat, rlng = H.hex_center(ring)
    from geo_spark.kernel.cellid import latlng_to_xyz

    cx, cy, cz = latlng_to_xyz(clat, clng)
    rx, ry, rz = latlng_to_xyz(rlat, rlng)
    d = np.sqrt((rx - cx) ** 2 + (ry - cy) ** 2 + (rz - cz) ** 2)
    spacing = np.sqrt(3.0) * H.SCALE_BASE / np.sqrt(7.0) ** 6
    # neighbor centers ~ one lattice spacing away (gnomonic distortion < 25%)
    assert np.all(d > 0.5 * spacing) and np.all(d < 1.6 * spacing)


def test_pack_unpack_roundtrip():
    face = np.array([0, 7, 19])
    q = np.array([-1000, 0, 12345])
    r = np.array([54321, -9876, 3])
    h = H.pack(face, 9, q, r)
    f2, res2, q2, r2 = H.unpack(h)
    assert np.array_equal(f2, face)
    assert np.all(res2 == 9)
    assert np.array_equal(q2, q)
    assert np.array_equal(r2, r)
