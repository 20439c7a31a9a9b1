"""Builder snap assembly: site dedup, spike peeling, idempotence, and
chained boolean ops on the snap lattice."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel.booleans import loop_origin_inside, polygon_boolean
from geo_spark.kernel.builder import (
    polygon_boolean_snapped,
    snap_ids,
    snap_rings,
)
from geo_spark.kernel.cellid import latlng_to_xyz
from geo_spark.kernel.pip import loop_contains_points


def _ring(lat0, lng0, r, n=12):
    ts = np.linspace(0, 2 * math.pi, n, endpoint=False)
    lats = lat0 + r * np.sin(ts)
    lngs = lng0 + r * np.cos(ts)
    return np.stack(latlng_to_xyz(np.radians(lats), np.radians(lngs)), axis=-1)


def _member(rings, pts):
    inside = np.zeros(len(pts), dtype=bool)
    for r in rings:
        r = np.asarray(r)
        inside ^= loop_contains_points(r, loop_origin_inside(r), pts)
    return inside


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(13)
    lats = rng.uniform(-9, 9, 4000)
    lngs = rng.uniform(-11, 11, 4000)
    return np.stack(latlng_to_xyz(np.radians(lats), np.radians(lngs)), axis=-1)


def test_snap_idempotent():
    ring = _ring(10.0, 20.0, 2.0, 24)
    snapped = snap_rings([ring], level=30)
    assert len(snapped) == 1
    again = snap_rings(snapped, level=30)
    assert np.array_equal(snapped[0], again[0])
    # snapped vertices sit exactly on their snap sites
    assert np.array_equal(snap_ids(snapped[0], 30), snap_ids(again[0], 30))


def test_duplicate_and_spike_removal():
    ring = _ring(0.0, 0.0, 3.0, 12)
    # duplicate a vertex and insert an a-b-a spike
    spiked = np.concatenate(
        [ring[:4], ring[3:4], ring[4:7], _ring(0.0, 8.0, 0.5, 3)[:1], ring[6:7], ring[7:]]
    )
    clean = snap_rings([spiked], level=30)
    assert len(clean) == 1
    assert len(clean[0]) == len(ring)
    assert np.array_equal(snap_ids(clean[0], 30), snap_ids(ring, 30))


def test_degenerate_ring_dropped():
    a = _ring(0.0, 0.0, 1.0, 8)
    tiny = np.repeat(a[:1], 5, axis=0)  # all-one-site ring
    out = snap_rings([a, tiny], level=30)
    assert len(out) == 1


def test_membership_preserved_at_level30(pts):
    a = [_ring(0, 0, 6.0), _ring(0, 0, 2.5)]
    before = _member(a, pts)
    after = _member(snap_rings(a, level=30), pts)
    assert (before == after).all()


@pytest.mark.parametrize("op2", ["intersection", "difference"])
def test_chained_snapped_boolean(op2, pts):
    """((A ∪ B) op2 C) via the snap lattice matches the direct chain."""
    a = [_ring(0, 0, 6.0), _ring(0, 0, 2.5)]  # annulus
    b = [_ring(0, 3.5, 2.0)]
    c = [_ring(1.5, 1.0, 3.0)]
    direct = polygon_boolean(polygon_boolean(a, b, "union"), c, op2)
    snapped = polygon_boolean_snapped(
        polygon_boolean_snapped(a, b, "union"), c, op2
    )
    assert (_member(direct, pts) == _member(snapped, pts)).all()


def test_chained_result_reuses_exact_sites(pts):
    """Feeding a snapped result against a snapped copy of itself hits
    the identical-geometry seam path exactly (site-for-site)."""
    a = [_ring(0, 0, 4.0)]
    b = [_ring(0, 2.0, 3.0)]
    u = polygon_boolean_snapped(a, b, "union")
    # u ∖ u = ∅ requires exact seam matching of every edge
    assert polygon_boolean_snapped(u, u, "difference") == []
    inter = polygon_boolean_snapped(u, u, "intersection")
    assert (_member(inter, pts) == _member(u, pts)).all()
