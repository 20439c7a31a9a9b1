"""Crossing-edge join: kernel counts vs a brute numpy oracle, covering
validity of PolylineRegion, and the distributed join vs all-pairs."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.coverer import RegionCoverer
from geo_spark.kernel.regions import LoopRegion, PolylineRegion
from geo_spark.kernel.relations import chain_crossings
from geo_spark.sources.layers import regular_loop_vertices


def _rand_chain(rng, n, lat0, lng0, step=3.0):
    lat = np.clip(lat0 + np.cumsum(rng.normal(0, step, n)), -80, 80)
    lng = lng0 + np.cumsum(rng.normal(0, step, n))
    lng = (lng + 180) % 360 - 180
    x, y, z = ck.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def _brute_crossings(averts, bverts, a_closed, b_closed):
    """Scalar sign-pattern oracle (independent of the vectorized triage)."""
    def det(a, b, c):
        return float(np.cross(a, b) @ c)

    ach = np.vstack([averts, averts[:1]]) if a_closed else averts
    bch = np.vstack([bverts, bverts[:1]]) if b_closed else bverts
    n = 0
    for i in range(len(ach) - 1):
        for j in range(len(bch) - 1):
            a, b, c, d = ach[i], ach[i + 1], bch[j], bch[j + 1]
            acb, bda = -det(a, b, c), det(a, b, d)
            cbd, dac = -det(c, d, b), det(c, d, a)
            if acb * bda > 0 and acb * cbd > 0 and acb * dac > 0:
                n += 1
    return n


def test_chain_crossings_matches_brute():
    rng = np.random.default_rng(17)
    loops = [regular_loop_vertices(20, 30, 0.2, 12), regular_loop_vertices(22, 33, 0.15, 7)]
    for t in range(20):
        chain = _rand_chain(rng, 15, 20 + rng.normal(0, 3), 30 + rng.normal(0, 3))
        for lv in loops:
            assert chain_crossings(chain, lv, False, True) == _brute_crossings(
                chain, lv, False, True
            )


def test_polyline_covering_covers_edge_samples():
    rng = np.random.default_rng(23)
    chain = _rand_chain(rng, 10, 10, 50, step=2.0)
    region = PolylineRegion.from_vertices(chain)
    cov = RegionCoverer(max_cells=8).covering(region)
    ranges = [(int(ck.range_min(np.array([c], dtype=np.uint64))[0]),
               int(ck.range_max(np.array([c], dtype=np.uint64))[0])) for c in cov]
    # sample points along each edge; every sample's leaf must be covered
    for i in range(len(chain) - 1):
        for t in np.linspace(0, 1, 50):
            p = (1 - t) * chain[i] + t * chain[i + 1]
            p = p / np.linalg.norm(p)
            lat = np.degrees(np.arctan2(p[2], np.hypot(p[0], p[1])))
            lng = np.degrees(np.arctan2(p[1], p[0]))
            leaf = int(ck.cellid_from_latlng(np.array([lat]), np.array([lng]))[0])
            assert any(lo <= leaf <= hi for lo, hi in ranges)


def test_crossing_edge_join_matches_all_pairs(spark):
    from geo_spark.operators.geom_join import crossing_edge_join
    from geo_spark.operators.spatial_join import build_layer

    rng = np.random.default_rng(31)
    trails = []
    for i in range(12):
        trails.append(
            (i, PolylineRegion.from_vertices(
                _rand_chain(rng, 8, rng.uniform(-40, 40), rng.uniform(-90, 90))
            ))
        )
    loops = []
    for j in range(6):
        loops.append(
            (100 + j, LoopRegion.from_vertices(
                regular_loop_vertices(
                    rng.uniform(-40, 40), rng.uniform(-90, 90), 0.15, 10
                )
            ))
        )
    a = build_layer(spark, trails, max_cells=8, interior=False)
    b = build_layer(spark, loops, max_cells=8)
    got = {
        (r["aid"], r["bid"], r["n_crossings"])
        for r in crossing_edge_join(a, b).collect()
    }
    exp = set()
    for aid, ra in trails:
        for bid, rb in loops:
            n = _brute_crossings(ra.verts, rb.verts, False, True)
            if n:
                exp.add((aid, bid, n))
    assert got == exp


def test_chain_pairs_crossings_batch_matches_scalar():
    """chain_pairs_crossings_indexed == chain_crossings pair for pair
    on random open/closed chains incl. shared-vertex touch configs."""
    import numpy as np

    from geo_spark.kernel.cellid import latlng_to_xyz
    from geo_spark.kernel.edges import pad_chain_table
    from geo_spark.kernel.relations import (
        chain_crossings,
        chain_pairs_crossings_indexed,
    )

    rng = np.random.default_rng(123)

    def chain(m, spread):
        la = rng.uniform(-spread, spread, m)
        ln = rng.uniform(-spread, spread, m)
        return np.stack(latlng_to_xyz(np.radians(la), np.radians(ln)), axis=-1)

    a_chains = [chain(int(rng.integers(2, 7)), 40) for _ in range(30)]
    b_chains = [chain(int(rng.integers(2, 8)), 40) for _ in range(25)]
    # shared-vertex touch: b chain starting exactly at a vertex of a[0]
    t = np.vstack([a_chains[0][1][None, :], chain(3, 30)])
    b_chains.append(t / np.linalg.norm(t, axis=1, keepdims=True))
    A, lenA = pad_chain_table(a_chains)
    B, lenB = pad_chain_table(b_chains)
    ai, bi = np.meshgrid(
        np.arange(len(a_chains)), np.arange(len(b_chains)), indexing="ij"
    )
    ai = ai.ravel(); bi = bi.ravel()
    got = chain_pairs_crossings_indexed(A, lenA, B, lenB, ai, bi)
    some = 0
    for k in range(len(ai)):
        want = chain_crossings(
            a_chains[ai[k]], b_chains[bi[k]], a_closed=False, b_closed=False
        )
        assert got[k] == want, (ai[k], bi[k], got[k], want)
        some += want
    assert some > 0
