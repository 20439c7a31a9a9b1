"""Interval sweep vs CellUnion intersection; convex hull invariants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu
from geo_spark.operators.hull import convex_hull_points, group_convex_hulls
from geo_spark.operators.sweep import nway_cell_intersection, overlap_profile


def test_overlap_profile_basic(spark):
    rows = [(0, 10), (5, 15), (12, 20)]
    df = spark.createDataFrame(rows, "lo long, hi long")
    prof = {r["pos"]: r["active"] for r in overlap_profile(df, "lo", "hi").collect()}
    assert prof[0] == 1
    assert prof[5] == 2
    assert prof[11] == 1  # first ends after 10
    assert prof[12] == 2
    assert prof[16] == 1
    assert prof[21] == 0


def test_nway_matches_cellunion_intersection(spark):
    # Two coverings around overlapping caps: the sweep's >=2 spans must
    # equal the leaf-range set of the pairwise CellUnion intersection.
    from geo_spark.kernel.coverer import RegionCoverer
    from geo_spark.kernel.regions import Cap

    a = RegionCoverer(max_cells=16).covering(Cap.from_center_angle(40.0, -74.0, 0.05))
    b = RegionCoverer(max_cells=16).covering(Cap.from_center_angle(40.3, -73.8, 0.05))
    inter = cu.intersection(a, b)
    assert inter, "fixture caps must overlap"

    rows = [
        (1, int(ck.to_signed(np.uint64(c)))) for c in a
    ] + [(2, int(ck.to_signed(np.uint64(c)))) for c in b]
    df = spark.createDataFrame(rows, "geom_id long, cell long")
    spans = nway_cell_intersection(df, 2).collect()

    got = {(r["span_start"], r["span_end"]) for r in spans}
    expected = set()
    # Merge adjacent cell ranges of the normalized intersection.
    ranges = sorted(
        (int(ck.to_signed(np.uint64(cu._range_min(c)))), int(ck.to_signed(np.uint64(cu._range_max(c)))))
        for c in inter
    )
    merged = []
    for lo, hi in ranges:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    assert got == set(merged)


def test_hull_contains_all_points():
    rng = np.random.default_rng(3)
    lat = 40 + rng.uniform(-2, 2, 200)
    lng = -74 + rng.uniform(-2, 2, 200)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    hull = convex_hull_points(pts)
    assert 3 <= len(hull) <= 20
    # Every point inside (or on) the hull loop.
    from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside

    oi = loop_origin_inside(hull)
    inside = loop_contains_points(hull, oi, pts)
    # Hull vertices themselves sit on the boundary — exclude exact verts.
    hull_set = {tuple(v) for v in hull}
    miss = [
        i for i in range(len(pts)) if not inside[i] and tuple(pts[i]) not in hull_set
    ]
    assert not miss


def test_group_convex_hulls(spark):
    rng = np.random.default_rng(4)
    rows = []
    for g, (clat, clng) in enumerate([(40.7, -74.0), (48.8, 2.35)]):
        for _ in range(100):
            rows.append(
                (g, float(clat + rng.uniform(-1, 1)), float(clng + rng.uniform(-1, 1)))
            )
    df = spark.createDataFrame(rows, "gid int, lat double, lng double")
    out = {r["gid"]: r for r in group_convex_hulls(df, "gid").collect()}
    assert set(out) == {0, 1}
    for g in (0, 1):
        assert 3 <= out[g]["n_hull"] <= 30
        assert len(out[g]["hull"]) == out[g]["n_hull"]


def test_hull_matches_pair_criterion_brute():
    """A point is a hull vertex iff some ordered pair (a,b) leaves every
    other point strictly left of circle a x b — exhaustive ground truth
    that caught the rotating-Graham prefix bug."""
    import numpy as np

    from geo_spark.operators.hull import convex_hull_points

    rng = np.random.default_rng(23)
    for trial in range(25):
        n = int(rng.integers(4, 40))
        # cluster well within a hemisphere (the operator's documented
        # precondition; ~15 degree spread)
        c = rng.normal(size=3)
        c /= np.linalg.norm(c)
        pts = c + 0.15 * rng.normal(size=(n, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        hull = convex_hull_points(pts)
        want = set()
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                s = pts @ np.cross(pts[a], pts[b])
                mask = np.ones(n, bool)
                mask[[a, b]] = False
                if (s[mask] > 0).all():
                    want.add(a)
                    break
        got = {
            tuple(np.round(p, 14)) for p in hull
        }
        wantpts = {tuple(np.round(pts[a], 14)) for a in want}
        assert got == wantpts, trial
        # CCW ring: every consecutive turn is a strict left turn
        h = np.asarray(hull)
        m = len(h)
        for i in range(m):
            s = float(np.cross(h[i], h[(i + 1) % m]) @ h[(i + 2) % m])
            assert s > 0
