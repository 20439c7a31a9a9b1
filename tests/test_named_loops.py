"""PIP / relation / boolean behavior on the reference's named fixtures
(s2/loop_test.go semantics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel import measures as M
from geo_spark.kernel.booleans import loop_boolean
from geo_spark.kernel.pip import (
    latlng_text_to_xyz,
    loop_contains_points,
    loop_origin_inside,
)
from geo_spark.kernel.relations import loop_relation
from geo_spark.sources.named_loops import loop_vertices

NORTH = np.array([0.0, 0.0, 1.0])
SOUTH = np.array([0.0, 0.0, -1.0])


def _contains(name: str, p: np.ndarray) -> bool:
    v = loop_vertices(name)
    return bool(loop_contains_points(v, loop_origin_inside(v), p[None, :])[0])


def test_hemisphere_pole_containment():
    assert _contains("northHemi", NORTH)
    assert not _contains("northHemi", SOUTH)
    assert _contains("southHemi", SOUTH)
    assert not _contains("southHemi", NORTH)
    assert _contains("arctic80", NORTH)
    assert not _contains("arctic80", SOUTH)
    assert _contains("antarctic80", SOUTH)
    assert not _contains("antarctic80", NORTH)


def test_hemisphere_areas():
    for name in ("northHemi", "southHemi", "westHemi", "eastHemi"):
        assert M.loop_area(loop_vertices(name)) == pytest.approx(
            2 * math.pi, rel=1e-12
        )


def test_candy_cane_reference_vectors():
    # The reference's own containment vectors (s2/loop_test.go:440-443).
    assert _contains("candyCane", latlng_text_to_xyz("5:71")[0])
    assert not _contains("candyCane", latlng_text_to_xyz("-8:71")[0])
    assert not _contains("candyCane", NORTH)


def test_origin_inside_reference_flags():
    # s2/loop_test.go:357-380 originInside expectations, verbatim.
    expectations = {
        "northHemi": True,
        "northHemi3": True,
        "southHemi": False,
        "westHemi": False,
        "eastHemi": True,
        "nearHemi": False,
        "farHemi": True,
        "candyCane": False,
        "smallNECW": True,
        "arctic80": True,
        "antarctic80": False,
    }
    for name, want in expectations.items():
        assert loop_origin_inside(loop_vertices(name)) == want, name


def test_small_necw_is_clockwise():
    # smallNECW is CW: it contains "most of the sphere" (its origin side),
    # e.g. the south pole, but not its own enclosed pocket's complement.
    assert _contains("smallNECW", SOUTH)
    pocket = latlng_text_to_xyz("40:22")[0]
    assert not _contains("smallNECW", pocket)


def test_loop_ab_boolean_expectations():
    """loopA/loopB with their published union/intersection/difference
    regions (s2/loop_test.go:71-95) — compared by dense membership, the
    region-equality form of the fixture expectations."""
    a = loop_vertices("loopA")
    b = loop_vertices("loopB")
    rng = np.random.default_rng(9)
    lat = rng.uniform(-2.0, 2.0, 4000)
    lng = np.where(rng.uniform(0, 1, 4000) < 0.5, 1, -1) * rng.uniform(177.0, 180.0, 4000)
    from geo_spark.kernel import cellid as ck

    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)

    def member_named(name):
        v = loop_vertices(name)
        return loop_contains_points(v, loop_origin_inside(v), pts)

    in_a = member_named("loopA")
    in_b = member_named("loopB")
    for fixture, want in [
        ("aIntersectB", in_a & in_b),
        ("aUnionB", in_a | in_b),
        ("aMinusB", in_a & ~in_b),
        ("bMinusA", in_b & ~in_a),
    ]:
        got = member_named(fixture)
        assert (got != want).mean() < 2e-3, fixture

    # And our boolean kernel reproduces the same regions.
    for op, want in [
        ("intersection", in_a & in_b),
        ("union", in_a | in_b),
        ("difference", in_a & ~in_b),
    ]:
        rings = loop_boolean(a, b, op)
        got = np.zeros(len(pts), dtype=bool)
        for ring in rings:
            got ^= loop_contains_points(ring, loop_origin_inside(ring), pts)
        assert (got != want).mean() < 2e-3, op


def test_degenerate_line_triangle():
    v = loop_vertices("lineTriangle")
    # Degenerate-but-CCW: area ~ 0, and it shouldn't claim the poles.
    assert M.loop_area(v) < 1e-10
    assert not _contains("lineTriangle", NORTH)
