"""Covering invariants per s2/regioncoverer_test.go:25-117 (property-based,
seeded): level bounds & mod, tightness (every covering cell may intersect
the region), completeness (sampled region points are covered), interior
containment, and covering-of-a-cell == the cell itself."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu
from geo_spark.kernel.cell import Cell
from geo_spark.kernel.coverer import RegionCoverer
from geo_spark.kernel.pip import latlng_text_to_xyz
from geo_spark.kernel.regions import (
    Cap,
    CellUnionRegion,
    LoopRegion,
    RectRegion,
    chord2_between,
)

RNG = np.random.default_rng(42)


def random_point():
    v = RNG.normal(size=3)
    return v / math.sqrt(v @ v)


def random_cap(max_radius=0.5):
    return Cap(random_point(), float(RNG.uniform(1e-6, max_radius)))


def sample_in_cap(cap: Cap, n=64):
    """Rejection-sample points inside the cap."""
    pts = []
    # tangent-plane gaussian scatter scaled to the radius
    r = cap.radius()
    while len(pts) < n:
        d = RNG.normal(size=3) * max(r, 1e-4)
        p = cap.center + d
        p = p / math.sqrt(p @ p)
        if cap.contains_point(p):
            pts.append(p)
    return np.stack(pts)


def check_covering(coverer: RegionCoverer, region, covering, interior: bool):
    # Level bounds and mod discipline.
    for c in covering:
        lvl = cu._level(c)
        assert coverer.min_level <= lvl <= coverer.max_level
        assert (lvl - coverer.min_level) % coverer.level_mod == 0
    if len(covering) > coverer.max_cells:
        # Only allowed when min_level forces it: then no two cells may have
        # a common ancestor at min_level.
        parents = {cu._parent(c, coverer.min_level) for c in covering}
        assert len(parents) == len(covering)
    if interior:
        for c in covering:
            assert region.contains_cell(Cell.from_id(c))
    else:
        # Tightness: every covering cell may intersect the region.
        for c in covering:
            assert region.may_intersect_cell(Cell.from_id(c))


@pytest.mark.parametrize("max_cells", [1, 4, 8])
def test_covering_of_cell_is_itself(max_cells):
    # s2/regioncoverer_test.go:25-41 (random cells at random levels).
    for _ in range(50):
        p = random_point()
        lvl = int(RNG.integers(0, 31))
        leaf = ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0]
        cid = int(ck.parent(np.array([leaf]), lvl)[0])
        region = CellUnionRegion((cid,))
        cov = RegionCoverer(max_cells=max_cells).covering(region)
        assert cov == [cid]


@pytest.mark.parametrize("max_cells", [1, 8])
@pytest.mark.parametrize("level_mod", [1, 2, 3])
def test_cap_covering_invariants(max_cells, level_mod):
    for _ in range(12):
        cap = random_cap()
        cov_params = RegionCoverer(
            min_level=0, max_level=30, level_mod=level_mod, max_cells=max_cells
        )
        cov = cov_params.covering(cap)
        assert cov, "cap covering must be non-empty"
        check_covering(cov_params, cap, cov, interior=False)
        # Completeness: all sampled cap points fall in the covering.
        for p in sample_in_cap(cap, 32):
            leaf = int(ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0])
            assert cu.contains_cellid(sorted(cov), leaf)


def test_cap_interior_covering_contained():
    for _ in range(10):
        cap = random_cap(0.3)
        coverer = RegionCoverer(max_cells=8)
        interior = coverer.interior_covering(cap)
        check_covering(coverer, cap, interior, interior=True)


def test_min_level_forces_subdivision():
    cap = Cap.from_center_angle(40.7, -74.0, 1e-5)
    coverer = RegionCoverer(min_level=12, max_level=20, max_cells=8)
    cov = coverer.covering(cap)
    for c in cov:
        assert 12 <= cu._level(c) <= 20


def test_rect_region_covering():
    region = RectRegion.from_degrees(40.0, -75.0, 41.5, -73.0)
    coverer = RegionCoverer(max_cells=8)
    cov = coverer.covering(region)
    assert 0 < len(cov) <= 8
    check_covering(coverer, region, cov, interior=False)
    # All sampled points of the rect are covered.
    for _ in range(100):
        lat = float(RNG.uniform(40.0, 41.5))
        lng = float(RNG.uniform(-75.0, -73.0))
        leaf = int(ck.cellid_from_latlng(np.array([lat]), np.array([lng]))[0])
        assert cu.contains_cellid(sorted(cov), leaf)


def test_loop_region_covering():
    # candyCane from s2/loop_test.go fixtures: a narrow spiral-ish band.
    verts = latlng_text_to_xyz(
        "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70"
    )
    region = LoopRegion.from_vertices(verts)
    coverer = RegionCoverer(max_cells=16)
    cov = coverer.covering(region)
    assert 0 < len(cov) <= 16
    check_covering(coverer, region, cov, interior=False)
    # Interior covering cells must be contained.
    interior = coverer.interior_covering(region)
    for c in interior:
        assert region.contains_cell(Cell.from_id(c))
    # Points known inside the loop are covered.
    inside = latlng_text_to_xyz("-5:0")  # equator-ish point inside the band?
    if region.contains_point(inside[0]):
        leaf = int(
            ck.cellid_from_xyz(inside[0][0:1], inside[0][1:2], inside[0][2:3])[0]
        )
        assert cu.contains_cellid(sorted(cov), leaf)


def test_small_loop_covering_complete():
    # Small diamond loop around NYC; sampled interior points must be covered.
    verts = latlng_text_to_xyz("40.5:-74.0, 40.7:-73.7, 40.9:-74.0, 40.7:-74.3")
    region = LoopRegion.from_vertices(verts)
    coverer = RegionCoverer(max_cells=8)
    cov = coverer.covering(region)
    check_covering(coverer, region, cov, interior=False)
    hits = 0
    for _ in range(200):
        lat = float(RNG.uniform(40.5, 40.9))
        lng = float(RNG.uniform(-74.3, -73.7))
        x, y, z = ck.latlng_to_xyz(np.array([lat]), np.array([lng]))
        p = np.array([float(x[0]), float(y[0]), float(z[0])])
        if region.contains_point(p):
            hits += 1
            leaf = int(ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0])
            assert cu.contains_cellid(sorted(cov), leaf)
    assert hits > 20  # the sample box actually overlaps the loop


def test_cellunion_normalize_merges_siblings():
    # 4 siblings collapse to the parent.
    p = random_point()
    leaf = int(ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0])
    parent = int(ck.parent(np.array([leaf], dtype=np.uint64), 10)[0])
    kids = [int(c.id) for c in Cell.from_id(parent).children()]
    assert cu.normalize(kids) == [parent]
    # Contained cells dropped.
    assert cu.normalize([parent, kids[2]]) == [parent]


def test_cellunion_set_ops():
    p = random_point()
    leaf = int(ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0])
    a_cell = int(ck.parent(np.array([leaf], dtype=np.uint64), 8)[0])
    kids = [c.id for c in Cell.from_id(a_cell).children()]
    assert cu.union([kids[0]], [kids[1], kids[2], kids[3]]) == [a_cell]
    assert cu.intersection([a_cell], [kids[1]]) == [kids[1]]
    diff = cu.difference([a_cell], [kids[1]])
    assert kids[1] not in diff
    assert cu.union(diff, [kids[1]]) == [a_cell]
    assert cu.leaf_cells_covered([a_cell]) == 1 << (2 * (30 - 8))


def test_expand_at_level_superset():
    cap = Cap.from_center_angle(48.85, 2.35, 0.001)
    cov = RegionCoverer(max_cells=8).covering(cap)
    expanded = cu.expand_at_level(cov, max(cu._level(c) for c in cov))
    for c in cov:
        assert cu.contains_cellid(expanded, c) or c in expanded


def test_expand_at_level_promotes_finer_cells():
    # Regression: cells finer than the expansion level must be promoted
    # to their level-`level` parent before ringing (s2/cellunion.go
    # ExpandAtLevel), else the buffer silently vanishes.
    p = random_point()
    leaf = int(ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0])
    fine = int(ck.parent(np.array([leaf], dtype=np.uint64), 12)[0])
    out = cu.expand_at_level([fine], 5)
    parent5 = int(ck.parent(np.array([leaf], dtype=np.uint64), 5)[0])
    assert cu.contains_cellid(out, fine)
    # the ring exists: strictly more leaves than the level-5 parent alone
    assert cu.leaf_cells_covered(out) > cu.leaf_cells_covered([parent5])
    nbrs = {int(n) for n in ck.all_neighbors(parent5, 5)}
    for nb in nbrs:
        assert cu.contains_cellid(out, nb)


def test_expand_by_radius_buffers():
    from geo_spark.kernel import metric as M

    cap = Cap.from_center_angle(10.0, 10.0, 0.001)
    cov = RegionCoverer(max_cells=8).covering(cap)
    buffered = cu.expand_by_radius(cov, 0.02)
    # every point within 0.02 rad of the cap center is covered
    for _ in range(200):
        d = RNG.normal(size=3) * 0.012
        q = cap.center + d
        q = q / np.linalg.norm(q)
        if float(np.arccos(np.clip(q @ cap.center, -1, 1))) <= 0.02 + 0.001:
            leaf = int(ck.cellid_from_xyz(q[0:1], q[1:2], q[2:3])[0])
            assert cu.contains_cellid(buffered, leaf)


def test_relate_cells_batch_matches_scalar():
    # The vectorized LoopRegion.relate_cells must agree with the scalar
    # contains_cell / may_intersect_cell pair on every cell: near the
    # loop, far away, and across levels (containing, boundary-crossing,
    # disjoint cells all occur).
    import numpy as np

    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.cell import Cell
    from geo_spark.sources.layers import city_loop_regions

    rng = np.random.default_rng(5)
    for gid, region in list(city_loop_regions(6)):
        import math

        ctr = region.verts.mean(axis=0)
        ctr /= np.linalg.norm(ctr)
        lat = math.degrees(math.asin(ctr[2]))
        lng = math.degrees(math.atan2(ctr[1], ctr[0]))
        lats = np.concatenate([lat + rng.uniform(-3, 3, 40), rng.uniform(-80, 80, 10)])
        lngs = np.concatenate([lng + rng.uniform(-3, 3, 40), rng.uniform(-180, 180, 10)])
        ids = ck.cellid_from_latlng(lats, lngs)
        cells = []
        for lvl in (4, 8, 12, 16):
            cells.extend(
                Cell.from_id(int(c)) for c in np.unique(ck.parent(ids, lvl))
            )
        bc, bm = region.relate_cells(cells)
        for i, cell in enumerate(cells):
            assert region.contains_cell(cell) == bc[i], (gid, cell.id)
            assert region.may_intersect_cell(cell) == bm[i], (gid, cell.id)


def test_covering_identical_with_batch_disabled():
    # The coverer's batched child expansion must not change any covering
    # (the predicates are float-identical; the candidate walk must be too).
    from geo_spark.kernel.coverer import RegionCoverer
    from geo_spark.kernel.regions import LoopRegion, Region
    from geo_spark.sources.layers import city_loop_regions

    regions = list(city_loop_regions(12))
    cov = RegionCoverer(min_level=0, max_level=30, max_cells=8)
    with_batch = [
        (list(cov.covering(r)), list(cov.interior_covering(r))) for _, r in regions
    ]
    orig = LoopRegion.relate_cells
    LoopRegion.relate_cells = Region.relate_cells
    try:
        without = [
            (list(cov.covering(r)), list(cov.interior_covering(r)))
            for _, r in regions
        ]
    finally:
        LoopRegion.relate_cells = orig
    assert with_batch == without


def test_relate_cells_polyline_and_polygon_match_scalar():
    import math

    import numpy as np

    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.cell import Cell
    from geo_spark.kernel.regions import PolygonRegion, PolylineRegion

    rng = np.random.default_rng(9)

    def cells_near(lat, lng):
        lats = np.concatenate(
            [lat + rng.uniform(-3, 3, 40), rng.uniform(-80, 80, 8)]
        )
        lngs = np.concatenate(
            [lng + rng.uniform(-3, 3, 40), rng.uniform(-180, 180, 8)]
        )
        ids = ck.cellid_from_latlng(lats, lngs)
        out = []
        for lvl in (4, 8, 12, 16):
            out.extend(Cell.from_id(int(c)) for c in np.unique(ck.parent(ids, lvl)))
        return out

    for t in range(4):
        lat0, lng0 = rng.uniform(-60, 60), rng.uniform(-170, 170)
        lats = lat0 + np.cumsum(rng.uniform(-0.3, 0.3, 20))
        lngs = lng0 + np.cumsum(rng.uniform(-0.3, 0.3, 20))
        r = PolylineRegion.from_latlng(lats, lngs)
        cells = cells_near(lat0, lng0)
        bc, bm = r.relate_cells(cells)
        for i, c in enumerate(cells):
            assert r.contains_cell(c) == bc[i]
            assert r.may_intersect_cell(c) == bm[i]

    for t in range(4):
        lat0, lng0 = rng.uniform(-50, 50), rng.uniform(-160, 160)

        def ring(radius, n, rev=False):
            ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
            if rev:
                ang = ang[::-1]
            la = lat0 + radius * np.sin(ang)
            lo = lng0 + radius * np.cos(ang)
            x, y, z = ck.latlng_to_xyz(la, lo)
            return np.stack([x, y, z], axis=1)

        pg = PolygonRegion.from_loops([ring(2.0, 24), ring(0.8, 12, rev=True)])
        cells = cells_near(lat0, lng0)
        bc, bm = pg.relate_cells(cells)
        for i, c in enumerate(cells):
            assert pg.contains_cell(c) == bc[i], c.id
            assert pg.may_intersect_cell(c) == bm[i], c.id
