"""Loop self-intersection validation: shape pins + brute differential."""

import math
import random

import numpy as np
import pytest

from geo_spark.operators.validate import loop_self_intersections, validate_loops


def _df(spark, loops):
    """loops: list of (gid, [(lat,lng), ...])"""
    rows = [
        (gid, [p[0] for p in pts], [p[1] for p in pts]) for gid, pts in loops
    ]
    return spark.createDataFrame(
        rows, "geom_id long, lats array<double>, lngs array<double>"
    )


def _brute_pairs(pts):
    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.relations import _interior_crossing_slow

    lat = np.array([p[0] for p in pts], dtype=np.float64)
    lng = np.array([p[1] for p in pts], dtype=np.float64)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    v = np.stack([x, y, z], axis=1)
    n = len(pts)
    out = []
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if _interior_crossing_slow(
                v[i], v[(i + 1) % n], v[j], v[(j + 1) % n]
            ):
                out.append((i, j))
    return sorted(out)


def test_bowtie_detected(spark):
    bowtie = [(0.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0)]
    got = sorted(
        (r["ei"], r["ej"])
        for r in loop_self_intersections(_df(spark, [(7, bowtie)])).collect()
    )
    assert got == [(0, 2)]


def test_convex_loop_valid(spark):
    k = 8
    ring = [
        (10.0 + 2.0 * math.cos(2 * math.pi * i / k),
         20.0 + 2.0 * math.sin(2 * math.pi * i / k))
        for i in range(k)
    ]
    out = validate_loops(_df(spark, [(1, ring)])).collect()
    assert len(out) == 1
    assert out[0]["is_valid"] and out[0]["n_cross_pairs"] == 0


def test_pentagram_five_crossings(spark):
    pts = [
        (5.0 + 3.0 * math.cos(math.radians(90 + 144 * i)),
         -40.0 + 3.0 * math.sin(math.radians(90 + 144 * i)))
        for i in range(5)
    ]
    out = validate_loops(_df(spark, [(2, pts)])).collect()
    assert out[0]["n_cross_pairs"] == 5 and not out[0]["is_valid"]


def test_mixed_batch_and_zero_rows(spark):
    bowtie = [(0.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0)]
    square = [(0.0, 10.0), (0.0, 11.0), (1.0, 11.0), (1.0, 10.0)]
    got = {
        r["geom_id"]: (r["n_cross_pairs"], r["is_valid"])
        for r in validate_loops(
            _df(spark, [(1, bowtie), (2, square)])
        ).collect()
    }
    assert got == {1: (1, False), 2: (0, True)}


@pytest.mark.parametrize("seed", [1, 2026])
def test_random_differential(spark, seed):
    rng = random.Random(seed)
    loops = []
    for g in range(12):
        anchor_lat = rng.uniform(-55, 55)
        anchor_lng = rng.uniform(-170, 170)
        n = rng.randrange(4, 10)
        pts = [
            (anchor_lat + rng.uniform(-8, 8), anchor_lng + rng.uniform(-8, 8))
            for _ in range(n)
        ]
        loops.append((g, pts))
    got = {}
    for r in loop_self_intersections(_df(spark, loops)).collect():
        got.setdefault(r["geom_id"], []).append((r["ei"], r["ej"]))
    want = {g: _brute_pairs(pts) for g, pts in loops}
    for g, pts in loops:
        assert sorted(got.get(g, [])) == want[g], g
    # the fixture is not all-valid (random orderings self-cross often)
    assert any(want[g] for g, _ in loops)


def test_antimeridian_loop(spark):
    # bowtie straddling lng=180
    pts = [(0.0, 179.5), (1.0, -179.5), (1.0, 179.5), (0.0, -179.5)]
    got = sorted(
        (r["ei"], r["ej"])
        for r in loop_self_intersections(_df(spark, [(3, pts)])).collect()
    )
    assert got == _brute_pairs(pts) == [(0, 2)]
