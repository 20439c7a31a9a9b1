"""IntLatLng (E5/E6/E7) snapping: reference-vector, displacement-bound
and ring-assembly tests (s2/builder_snapper.go:355-505 semantics)."""

import math

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.builder import (
    exponent_for_max_snap_radius,
    min_edge_vertex_separation_e,
    min_snap_radius_for_exponent,
    min_vertex_separation_e,
    snap_latlng_e,
    snap_rings_e,
    unsnap_latlng_e,
)


def test_reference_e6_example():
    # the documented example, s2/builder_snapper.go:362-365
    ila, iln = snap_latlng_e(
        np.array([23.12345651]), np.array([-45.65432149]), 6
    )
    assert ila[0] == 23123457 and iln[0] == -45654321


def test_half_away_from_zero():
    ila, iln = snap_latlng_e(
        np.array([2.5, -2.5, 0.0, -0.49999]),
        np.array([0.5, -0.5, -0.0, 0.49999]),
        0,
    )
    assert list(ila) == [3, -3, 0, 0]
    assert list(iln) == [1, -1, 0, 0]


def test_idempotent():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 2000)
    lng = rng.uniform(-180, 180, 2000)
    for e in (0, 3, 6, 7):
        ila, iln = snap_latlng_e(lat, lng, e)
        sla, sln = unsnap_latlng_e(ila, iln, e)
        ila2, iln2 = snap_latlng_e(sla, sln, e)
        assert (ila == ila2).all() and (iln == iln2).all()


def test_displacement_within_min_snap_radius():
    rng = np.random.default_rng(11)
    # uniform on the sphere (displacement bound must hold everywhere)
    z = rng.uniform(-1, 1, 5000)
    lng = rng.uniform(-180, 180, 5000)
    lat = np.degrees(np.arcsin(z))
    x0, y0, z0 = ck.latlng_to_xyz(lat, lng)
    for e in (0, 4, 7):
        sla, sln = unsnap_latlng_e(*snap_latlng_e(lat, lng, e), e)
        x1, y1, z1 = ck.latlng_to_xyz(sla, sln)
        chord = np.sqrt(
            (x0 - x1) ** 2 + (y0 - y1) ** 2 + (z0 - z1) ** 2
        )
        ang = 2.0 * np.arcsin(np.clip(chord / 2.0, 0.0, 1.0))
        assert ang.max() <= min_snap_radius_for_exponent(e) + 1e-15


def test_exponent_radius_inverse():
    for e in range(0, 11):
        r = min_snap_radius_for_exponent(e)
        assert exponent_for_max_snap_radius(r) == e
    # clamping
    assert exponent_for_max_snap_radius(10.0) == 0
    assert exponent_for_max_snap_radius(1e-30) == 10


def test_separation_bounds_ordering():
    for e in (0, 5, 7, 10):
        r = min_snap_radius_for_exponent(e)
        vs = min_vertex_separation_e(e)
        es = min_edge_vertex_separation_e(e)
        assert 0 < es <= r and 0 < vs <= r
        assert vs >= 0.471 * r - 1e-18
        assert es >= 0.222 * r - 1e-18


def _ring(pts):
    lat = np.array([p[0] for p in pts], dtype=np.float64)
    lng = np.array([p[1] for p in pts], dtype=np.float64)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def test_snap_rings_e_dedup_and_spike():
    # E0 lattice: 0.3/0.4 both snap to 0/0 etc.; spike c-d-c peels
    ring = _ring(
        [
            (10.1, 20.2),
            (10.3, 20.4),  # same E0 site as previous -> dedup
            (30.0, 20.0),
            (50.0, 50.0),  # spike tip (next returns to 30,20 site)
            (30.2, 20.1),
            (30.0, 60.0),
        ]
    )
    out = snap_rings_e([ring], 0)
    assert len(out) == 1
    lat, lng = ck.xyz_to_latlng(out[0][:, 0], out[0][:, 1], out[0][:, 2])
    sites = sorted(zip(np.round(lat).astype(int), np.round(lng).astype(int)))
    assert sites == [(10, 20), (30, 20), (30, 60)]


def test_snap_rings_e_drops_degenerate():
    ring = _ring([(0.1, 0.1), (0.2, 0.2), (0.3, 0.1), (0.05, 0.15)])
    assert snap_rings_e([ring], 0) == []


def test_snap_rings_e_resnap_identity():
    rng = np.random.default_rng(3)
    k = 12
    pts = [
        (20 + 5 * math.cos(2 * math.pi * i / k) + rng.uniform(-0.2, 0.2),
         40 + 5 * math.sin(2 * math.pi * i / k) + rng.uniform(-0.2, 0.2))
        for i in range(k)
    ]
    once = snap_rings_e([_ring(pts)], 2)
    twice = snap_rings_e(once, 2)
    assert len(once) == len(twice) == 1
    np.testing.assert_array_equal(once[0], twice[0])
