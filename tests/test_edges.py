"""Edge kernels vs closed-form geometry."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel import edges as E
from geo_spark.kernel.pip import latlng_text_to_xyz


def _chord2(angle):
    return (2 * math.sin(angle / 2)) ** 2


def test_point_segment_interior():
    # Equator segment 0..90E; point at lat 10, lng 45 -> distance 10 deg.
    seg = latlng_text_to_xyz("0:0, 0:90")
    x = latlng_text_to_xyz("10:45")
    d = E.point_segment_chord2(x, seg[0][None, :], seg[1][None, :])[0]
    assert d == pytest.approx(_chord2(math.radians(10)), rel=1e-12)


def test_point_segment_endpoint():
    seg = latlng_text_to_xyz("0:0, 0:90")
    x = latlng_text_to_xyz("0:-20")  # behind a -> endpoint a, 20 deg
    d = E.point_segment_chord2(x, seg[0][None, :], seg[1][None, :])[0]
    assert d == pytest.approx(_chord2(math.radians(20)), rel=1e-12)


def test_point_on_segment_zero():
    seg = latlng_text_to_xyz("0:0, 0:90")
    x = latlng_text_to_xyz("0:30")
    d = E.point_segment_chord2(x, seg[0][None, :], seg[1][None, :])[0]
    assert d == pytest.approx(0.0, abs=1e-28)


def test_point_to_edges_chain():
    chain = latlng_text_to_xyz("0:0, 0:45, 45:45")
    x = latlng_text_to_xyz("10:20, 20:50")
    d = E.point_to_edges_chord2(x, chain)
    # first point: nearest to equator edge = 10 deg
    assert d[0] == pytest.approx(_chord2(math.radians(10)), rel=1e-10)
    assert d[1] < _chord2(math.radians(10))


def test_interpolate_and_project():
    a = latlng_text_to_xyz("0:0")[0]
    b = latlng_text_to_xyz("0:90")[0]
    mid = E.interpolate(a, b, 0.5)
    exp = latlng_text_to_xyz("0:45")[0]
    assert float(mid @ exp) == pytest.approx(1.0, abs=1e-14)
    x = latlng_text_to_xyz("20:30")[0]
    p = E.project(x, a, b)
    expp = latlng_text_to_xyz("0:30")[0]
    assert float(p @ expp) == pytest.approx(1.0, abs=1e-12)
    # beyond the arc -> endpoint
    x2 = latlng_text_to_xyz("5:120")[0]
    p2 = E.project(x2, a, b)
    assert np.allclose(p2, b)


def test_simplify_polyline_guarantee():
    # Zigzag along the equator with small noise; large tolerance ->
    # endpoints only; tiny tolerance -> all vertices kept.
    # Asymmetric zigzag: no three consecutive vertices exactly collinear.
    lats = [0, 0.013, -0.011, 0.021, 0.003, -0.017, 0.009, 0]
    txt = ", ".join(f"{la}:{i*2}" for i, la in enumerate(lats))
    verts = latlng_text_to_xyz(txt)
    idx_all = E.simplify_polyline(verts, 0.0)
    assert len(idx_all) == len(verts)
    idx_big = E.simplify_polyline(verts, math.radians(1.0))
    assert list(idx_big) == [0, len(verts) - 1]
    # Tolerance guarantee for an intermediate tolerance.
    tol = math.radians(0.015)
    idx = E.simplify_polyline(verts, tol)
    kept = verts[idx]
    for i in range(len(verts)):
        d = E.point_to_edges_chord2(verts[i][None, :], kept)[0]
        assert d <= (2 * math.sin(tol / 2)) ** 2 + 1e-15


def test_simplify_polyline_s2_guarantee_and_compression():
    import math

    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.edges import (
        point_to_edges_chord2,
        simplify_polyline,
        simplify_polyline_s2,
    )

    rng = np.random.default_rng(9)
    lat = 40 + np.cumsum(rng.normal(0, 0.4, 120))
    lng = -70 + np.cumsum(rng.normal(0, 0.4, 120))
    x, y, z = ck.latlng_to_xyz(lat, lng)
    verts = np.stack([x, y, z], axis=1)
    for tol_deg in (0.1, 0.5, 2.0):
        tol = math.radians(tol_deg)
        kept = simplify_polyline_s2(verts, tol)
        # endpoints preserved, monotone indices
        assert kept[0] == 0 and kept[-1] == len(verts) - 1
        assert (np.diff(kept) > 0).all()
        # hard tolerance guarantee (every vertex within tol of the chain)
        d2 = point_to_edges_chord2(verts, verts[kept])
        worst = 2 * math.asin(0.5 * math.sqrt(float(d2.max())))
        assert worst <= tol + 1e-12
        # at least as aggressive as the greedy contract at coarse tolerances
        assert len(kept) <= len(simplify_polyline(verts, tol)) + 1


def test_tessellator_projected_tolerance():
    import math

    from geo_spark.kernel.edges import (
        _from_latlng,
        tessellate_projected,
        tessellate_unprojected,
    )
    from geo_spark.kernel.pip import latlng_text_to_xyz

    a, b = latlng_text_to_xyz("10:10, 50:80")
    tol = math.radians(0.05)
    pts = tessellate_projected(a, b, tol)
    assert len(pts) > 2
    assert np.allclose(pts[0], a) and np.allclose(pts[-1], b)
    for k in range(len(pts) - 1):
        p, q = pts[k], pts[k + 1]
        gm = p + q
        gm /= np.linalg.norm(gm)
        pl, pg = math.atan2(p[2], math.hypot(p[0], p[1])), math.atan2(p[1], p[0])
        ql, qg = math.atan2(q[2], math.hypot(q[0], q[1])), math.atan2(q[1], q[0])
        dg = math.remainder(qg - pg, 2 * math.pi)
        pm = _from_latlng(0.5 * (pl + ql), pg + 0.5 * dg)
        err = 2 * math.asin(0.5 * float(np.linalg.norm(gm - pm)))
        assert err <= tol * 1.01
    un = tessellate_unprojected(a, b, tol)
    assert np.allclose(un[0], a) and np.allclose(un[-1], b)
    assert len(un) > 2


def test_chain_pairs_batch_matches_scalar():
    """chain_pairs_chord2_indexed == chain_pair_chord2 pair for pair:
    random chains, crossing pairs, shared-vertex touches, single-vertex
    chains, mixed lengths (padding), near-degenerate slivers."""
    import numpy as np

    from geo_spark.kernel.cellid import latlng_to_xyz
    from geo_spark.kernel.edges import (
        chain_pair_chord2,
        chain_pairs_chord2_indexed,
        pad_chain_table,
    )

    rng = np.random.default_rng(77)

    def ring(lat0, lng0, r, m):
        ts = np.linspace(0, 1.5 * np.pi, m)
        la = lat0 + r * np.sin(ts)
        ln = lng0 + r * np.cos(ts)
        return np.stack(latlng_to_xyz(np.radians(la), np.radians(ln)), axis=-1)

    chains_a, chains_b = [], []
    for _ in range(40):
        m = int(rng.integers(1, 7))
        chains_a.append(ring(rng.uniform(-40, 40), rng.uniform(-90, 90),
                             rng.uniform(0.5, 8.0), max(m, 1)))
    for _ in range(35):
        m = int(rng.integers(1, 9))
        chains_b.append(ring(rng.uniform(-40, 40), rng.uniform(-90, 90),
                             rng.uniform(0.5, 8.0), max(m, 1)))
    # adversarial: B chain sharing an exact vertex with A chain 0
    shared = np.vstack([chains_a[0][-1][None, :],
                        ring(10.0, 10.0, 2.0, 3)])
    shared = shared / np.linalg.norm(shared, axis=1, keepdims=True)
    chains_b.append(shared)
    # a long crossing diagonal
    chains_b.append(ring(0.0, 0.0, 60.0, 5))

    A, lenA = pad_chain_table(chains_a)
    B, lenB = pad_chain_table(chains_b)
    ai, bi = np.meshgrid(np.arange(len(chains_a)), np.arange(len(chains_b)),
                         indexing="ij")
    ai = ai.ravel(); bi = bi.ravel()
    got = chain_pairs_chord2_indexed(A, lenA, B, lenB, ai, bi)
    for k in range(len(ai)):
        want = chain_pair_chord2(chains_a[ai[k]], chains_b[bi[k]])
        assert got[k] == want, (ai[k], bi[k], got[k], want)
