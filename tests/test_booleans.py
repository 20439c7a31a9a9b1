"""Boolean-op differentials: membership in result loops == boolean of
memberships in the inputs, on dense point samples."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.booleans import loop_boolean
from geo_spark.kernel.pip import (
    latlng_text_to_xyz,
    loop_contains_points,
    loop_origin_inside,
)

RNG = np.random.default_rng(21)


def _member(loops, pts):
    """XOR membership over result rings (holes are reversed rings)."""
    out = np.zeros(len(pts), dtype=bool)
    for ring in loops:
        oi = loop_origin_inside(ring)
        out ^= loop_contains_points(ring, oi, pts)
    return out


def _sample_box(lat0, lat1, lng0, lng1, n=4000):
    lat = RNG.uniform(lat0, lat1, n)
    lng = RNG.uniform(lng0, lng1, n)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


A = latlng_text_to_xyz("10:10, 10:30, 30:30, 30:10")
B = latlng_text_to_xyz("20:20, 20:40, 40:40, 40:20")  # overlaps A
C = latlng_text_to_xyz("15:15, 15:25, 25:25, 25:15")  # inside A
D = latlng_text_to_xyz("-40:-40, -40:-20, -20:-20, -20:-40")  # disjoint from A

A_OI = loop_origin_inside(A)
B_OI = loop_origin_inside(B)


@pytest.mark.parametrize("op,rule", [
    ("union", lambda a, b: a | b),
    ("intersection", lambda a, b: a & b),
    ("difference", lambda a, b: a & ~b),
])
def test_boolean_overlapping(op, rule):
    res = loop_boolean(A, B, op)
    assert res, f"{op} of overlapping loops must be non-empty"
    pts = _sample_box(5, 45, 5, 45)
    in_a = loop_contains_points(A, A_OI, pts)
    in_b = loop_contains_points(B, B_OI, pts)
    got = _member(res, pts)
    want = rule(in_a, in_b)
    # allow a vanishing boundary band (crossing points are rounded keys)
    mismatch = (got != want).mean()
    assert mismatch < 0.002, f"{op}: mismatch rate {mismatch}"


def test_boolean_nested_and_disjoint():
    pts = _sample_box(-45, 45, -45, 45, 6000)
    in_a = loop_contains_points(A, A_OI, pts)
    c_oi = loop_origin_inside(C)
    in_c = loop_contains_points(C, c_oi, pts)
    d_oi = loop_origin_inside(D)
    in_d = loop_contains_points(D, d_oi, pts)

    assert _member(loop_boolean(A, C, "union"), pts).tolist() == in_a.tolist()
    assert _member(loop_boolean(A, C, "intersection"), pts).tolist() == in_c.tolist()
    diff = _member(loop_boolean(A, C, "difference"), pts)
    assert diff.tolist() == (in_a & ~in_c).tolist()

    assert (
        _member(loop_boolean(A, D, "union"), pts).tolist()
        == (in_a | in_d).tolist()
    )
    assert loop_boolean(A, D, "intersection") == []
    assert _member(loop_boolean(A, D, "difference"), pts).tolist() == in_a.tolist()


def test_boolean_random_circles():
    from geo_spark.sources.layers import regular_loop_vertices

    for _ in range(6):
        la = float(RNG.uniform(-40, 40))
        ln = float(RNG.uniform(-150, 150))
        r1 = float(RNG.uniform(0.05, 0.15))
        r2 = float(RNG.uniform(0.05, 0.15))
        off = float(RNG.uniform(0.3, 1.2)) * (r1 + r2)
        la2 = la + np.degrees(off)
        va = regular_loop_vertices(la, ln, r1, 24)
        vb = regular_loop_vertices(la2, ln, r2, 24)
        pts = _sample_box(la - 15, la2 + 15, ln - 15, ln + 15, 3000)
        ia = loop_contains_points(va, loop_origin_inside(va), pts)
        ib = loop_contains_points(vb, loop_origin_inside(vb), pts)
        for op, rule in [
            ("union", ia | ib),
            ("intersection", ia & ib),
            ("difference", ia & ~ib),
        ]:
            got = _member(loop_boolean(va, vb, op), pts)
            assert (got != rule).mean() < 0.003, op


def test_dissolve_operator(spark):
    """Distributed dissolve: chained overlapping discs merge to one
    ring, the detached disc stays an island; XOR membership of the
    result equals OR membership of the inputs on a probe grid."""
    import numpy as np

    from geo_spark.kernel.cellid import latlng_to_xyz
    from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside
    from geo_spark.operators.constructive import dissolve
    from geo_spark.sources.layers import regular_loop_vertices

    discs = [
        regular_loop_vertices(10.0, 20.0, 0.02, 16),
        regular_loop_vertices(10.9, 20.5, 0.022, 18),
        regular_loop_vertices(7.0, 17.0, 0.012, 12),  # island
    ]
    rows = [
        (1, [[[float(c) for c in p] for p in d]]) for d in discs
    ] + [(2, [[[float(c) for c in p] for p in discs[0]]])]
    geoms = spark.createDataFrame(
        rows, "grp int, rings array<array<array<double>>>"
    )
    got = {r["grp"]: r for r in dissolve(geoms).collect()}
    assert got[1]["n_rings"] == 2  # merged chain + island
    assert got[2]["n_rings"] == 1

    rng = np.random.default_rng(5)
    lats = rng.uniform(5, 14, 3000)
    lngs = rng.uniform(15, 24, 3000)
    pts = np.stack(latlng_to_xyz(np.radians(lats), np.radians(lngs)), axis=-1)
    want = np.zeros(len(pts), dtype=bool)
    for d in discs:
        want |= loop_contains_points(d, loop_origin_inside(d), pts)
    have = np.zeros(len(pts), dtype=bool)
    for rg in got[1]["rings"]:
        rg = np.array(rg)
        have ^= loop_contains_points(rg, loop_origin_inside(rg), pts)
    assert (have == want).all()
