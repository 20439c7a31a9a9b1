"""PIP independent differential: the crossing-parity kernel vs a
winding-angle oracle (sum of signed turn angles around the point — a
completely different algorithm), over random star-shaped loops."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside

RNG = np.random.default_rng(77)


def _random_star_loop(clat, clng, r_base, n):
    """Star-shaped (possibly concave) loop around a center."""
    from geo_spark.sources.layers import regular_loop_vertices

    ring = regular_loop_vertices(clat, clng, r_base, n)
    # perturb radii: pull vertices toward/away from the center
    x, y, z = ck.latlng_to_xyz(np.array([clat]), np.array([clng]))
    c = np.array([float(x[0]), float(y[0]), float(z[0])])
    out = []
    for v in ring:
        t = RNG.uniform(0.4, 1.6)
        p = c + t * (v - c)
        out.append(p / np.linalg.norm(p))
    return np.array(out)


def _winding_oracle(verts, pts):
    """Winding angle: sum of signed angles subtended at the point by each
    edge; ~2*pi inside, ~0 outside (gnomonic-projected planar winding)."""
    res = np.empty(len(pts), dtype=bool)
    for i, p in enumerate(pts):
        # project loop into the tangent plane at p (gnomonic)
        e1 = np.cross(p, [0.33, 0.61, 0.71])
        e1 = e1 / np.linalg.norm(e1)
        e2 = np.cross(p, e1)
        denom = verts @ p
        if np.any(denom <= 1e-9):
            res[i] = False  # point near antipode of a vertex: skip class
            continue
        proj = verts / denom[:, None]
        u = proj @ e1
        v = proj @ e2
        ang = np.arctan2(v, u)
        d = np.diff(np.concatenate([ang, ang[:1]]))
        d = (d + math.pi) % (2 * math.pi) - math.pi
        res[i] = abs(d.sum()) > math.pi
    return res


@pytest.mark.parametrize("seed", range(5))
def test_pip_matches_winding(seed):
    rng = np.random.default_rng(seed)
    clat = float(rng.uniform(-55, 55))
    clng = float(rng.uniform(-170, 170))
    r = float(rng.uniform(0.02, 0.1))
    verts = _random_star_loop(clat, clng, r, int(rng.integers(6, 40)))
    oi = loop_origin_inside(verts)

    lat = clat + np.degrees(r) * RNG.uniform(-2, 2, 2000)
    lng = clng + np.degrees(r) * RNG.uniform(-2, 2, 2000)
    x, y, z = ck.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)

    got = loop_contains_points(verts, oi, pts)
    want = _winding_oracle(verts, pts)
    mismatch = (got != want).mean()
    assert mismatch < 1e-3, f"mismatch rate {mismatch}"
    assert 0.05 < got.mean() < 0.95  # fixture actually straddles the loop
