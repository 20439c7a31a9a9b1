"""HMM (Viterbi) map matching tests: the signature outlier-suppression
behavior vs per-point snapping, a brute path-enumeration cost
differential, gap re-indexing, and deterministic tie-breaks."""

import itertools

import numpy as np
from pyspark.sql import functions as F

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.regions import PolylineRegion, chord2_from_angle
from geo_spark.operators.distance_join import build_distance_layer
from geo_spark.operators.mapmatch import (
    hmm_map_match,
    map_match,
    refine_candidates,
)

RADIUS = 500_000.0 / 6_371_010.0
EM_SCALE = 1e10


def _trail(gid, latlngs):
    lat = np.array([p[0] for p in latlngs], np.float64)
    lng = np.array([p[1] for p in latlngs], np.float64)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    return (gid, PolylineRegion.from_vertices(np.stack([x, y, z], 1)))


def _points(spark, pts):
    """pts = [(traj, ord, pid, lat, lng)] -> DataFrame with cell_id."""
    rows = [
        (
            int(t),
            int(o),
            int(pid),
            float(la),
            float(ln),
            int(ck.to_signed(ck.cellid_from_latlng(la, ln))),
        )
        for t, o, pid, la, ln in pts
    ]
    return spark.createDataFrame(
        rows, "traj long, rk long, pid long, lat double, lng double, cell_id long"
    )


def _two_trails(spark):
    """Trail 0 along lat=0, trail 1 parallel at lat=0.8 (~89 km)."""
    trails = [
        _trail(0, [(0.0, 0.0), (0.0, 1.0), (0.0, 2.0), (0.0, 3.0)]),
        _trail(1, [(0.8, 0.0), (0.8, 1.0), (0.8, 2.0), (0.8, 3.0)]),
    ]
    return trails, build_distance_layer(spark, trails, RADIUS)


def test_hmm_outlier_sticks_to_trail(spark):
    """A mid-trace GPS blip closer to the parallel road flips the
    per-point snap but NOT the Viterbi path (switch_cost dominates one
    observation's emission advantage)."""
    trails, layer = _two_trails(spark)
    # trace hugs trail 0 (lat ~0.05) except observation 3 at lat 0.6
    # (0.2 deg from trail 1, 0.6 deg from trail 0).
    obs = [
        (1, 1, 10, 0.05, 0.2),
        (1, 2, 11, 0.05, 0.9),
        (1, 3, 12, 0.60, 1.5),
        (1, 4, 13, 0.05, 2.1),
        (1, 5, 14, 0.05, 2.8),
    ]
    pts = _points(spark, obs)
    snap = {
        r["pid"]: r["geom_id"]
        for r in map_match(pts, layer, RADIUS, point_key="pid").collect()
    }
    assert snap[12] == 1 and snap[10] == 0  # per-point snap flips
    got = hmm_map_match(
        pts,
        layer,
        RADIUS,
        traj_key="traj",
        order_col="rk",
        point_key="pid",
        em_scale=EM_SCALE,
    ).collect()
    assert len(got) == 5
    assert all(r["geom_id"] == 0 for r in got)  # Viterbi holds the road
    assert [r["t"] for r in sorted(got, key=lambda r: r["t"])] == [1, 2, 3, 4, 5]


def _brute_min_cost(cand_by_t, switch, jump):
    """Exhaustive min path cost over the candidate lattice."""
    best = None
    for path in itertools.product(*cand_by_t):
        c = sum(em for _, _, em in path)
        for (g0, s0, _), (g1, s1, _) in zip(path, path[1:]):
            c += jump * abs(s0 - s1) if g0 == g1 else switch
        best = c if best is None else min(best, c)
    return best


def test_hmm_brute_cost_differential(spark):
    """Viterbi total_cost == exhaustive enumeration over all candidate
    paths, and the emitted path itself achieves that cost."""
    trails, layer = _two_trails(spark)
    rng = np.random.default_rng(20260820)
    obs = [
        (7, o + 1, 100 + o, float(rng.uniform(-0.1, 0.9)), float(rng.uniform(0, 3)))
        for o in range(5)
    ]
    pts = _points(spark, obs)
    sw, jp = 1_500_000, 50_000
    out = hmm_map_match(
        pts,
        layer,
        RADIUS,
        traj_key="traj",
        order_col="rk",
        point_key="pid",
        em_scale=EM_SCALE,
        switch_cost=sw,
        jump_cost=jp,
    ).collect()
    # rebuild the candidate lattice exactly as the operator sees it
    cand = (
        refine_candidates(pts, layer, RADIUS, point_key="pid")
        .join(pts.select("pid", "rk"), "pid")
        .select(
            "rk",
            "geom_id",
            "seg_idx",
            F.floor(F.col("chord2") * F.lit(EM_SCALE)).cast("long").alias("em"),
        )
        .collect()
    )
    by_t: dict[int, list] = {}
    for r in cand:
        by_t.setdefault(r["rk"], []).append((r["geom_id"], r["seg_idx"], r["em"]))
    lattice = [sorted(by_t[k]) for k in sorted(by_t)]
    want = _brute_min_cost(lattice, sw, jp)
    total = out[0]["total_cost"]
    assert all(r["total_cost"] == total for r in out)
    assert total == want
    # the emitted path reaches total when re-costed by hand
    path = [
        (r["geom_id"], r["seg_idx"]) for r in sorted(out, key=lambda r: r["t"])
    ]
    em_of = {(k + 1, g, s): em for k, sts in enumerate(lattice) for g, s, em in sts}
    c = sum(em_of[(t + 1, g, s)] for t, (g, s) in enumerate(path))
    for (g0, s0), (g1, s1) in zip(path, path[1:]):
        c += jp * abs(s0 - s1) if g0 == g1 else sw
    assert c == total


def test_hmm_gap_reindexes_t(spark):
    """An observation with no candidate in radius is skipped and t is
    the dense rank over the survivors."""
    trails, layer = _two_trails(spark)
    obs = [
        (3, 1, 20, 0.05, 0.5),
        (3, 2, 21, 45.0, 120.0),  # nowhere near either trail
        (3, 3, 22, 0.05, 1.5),
    ]
    got = sorted(
        hmm_map_match(
            _points(spark, obs),
            layer,
            RADIUS,
            traj_key="traj",
            order_col="rk",
            point_key="pid",
        ).collect(),
        key=lambda r: r["t"],
    )
    assert [(r["t"], r["geom_id"]) for r in got] == [(1, 0), (2, 0)]


def test_hmm_single_observation_is_argmin_snap(spark):
    """One-point trajectories degrade to the per-point argmin with the
    (em, geom_id, seg_idx) tie-break."""
    trails, layer = _two_trails(spark)
    pts = _points(spark, [(9, 1, 30, 0.05, 1.5)])
    got = hmm_map_match(
        pts, layer, RADIUS, traj_key="traj", order_col="rk", point_key="pid"
    ).collect()
    snap = map_match(pts, layer, RADIUS, point_key="pid").collect()[0]
    assert len(got) == 1
    assert (got[0]["geom_id"], got[0]["seg_idx"]) == (
        snap["geom_id"],
        snap["seg_idx"],
    )
    assert got[0]["t"] == 1


def test_hmm_equidistant_tie_takes_lowest_geom(spark):
    """A trace exactly midway between the two parallel trails has
    identical emissions on both; the lexicographic rule must pick
    trail 0 everywhere (never a mix, which would pay switch_cost)."""
    trails, layer = _two_trails(spark)
    obs = [(5, o + 1, 40 + o, 0.4, 0.5 + o) for o in range(3)]
    got = hmm_map_match(
        _points(spark, obs),
        layer,
        RADIUS,
        traj_key="traj",
        order_col="rk",
        point_key="pid",
    ).collect()
    assert len(got) == 3
    assert all(r["geom_id"] == 0 for r in got)


def test_hmm_multiple_trajectories_independent(spark):
    """Groups do not leak: two trajectories produce the same result as
    each run alone."""
    trails, layer = _two_trails(spark)
    a = [(11, o + 1, 50 + o, 0.05, 0.3 + o) for o in range(3)]
    b = [(12, o + 1, 60 + o, 0.75, 0.3 + o) for o in range(3)]

    def run(obs):
        return {
            (r["traj"], r["t"]): (r["geom_id"], r["seg_idx"], r["total_cost"])
            for r in hmm_map_match(
                _points(spark, obs),
                layer,
                RADIUS,
                traj_key="traj",
                order_col="rk",
                point_key="pid",
            ).collect()
        }

    both = run(a + b)
    assert both == {**run(a), **run(b)}
    assert {t for t, _ in both} == {11, 12}
