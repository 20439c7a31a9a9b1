"""Offline stress-hunt for polygon_boolean membership bugs.

Sweeps the same configuration space as tests/test_polygon_boolean.py's
Hypothesis fuzz (concentric shell+hole per side, 6-16-gon, ±4° centers,
2-6° radii) plus adversarial same-circle / shared-vertex configs, and
prints any falsifying (a_rings, b_rings, op) triple.
"""
from __future__ import annotations

import itertools
import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from geo_spark.kernel.booleans import loop_origin_inside, polygon_boolean
from geo_spark.kernel.cellid import latlng_to_xyz
from geo_spark.kernel.pip import loop_contains_points

OPS = ("union", "intersection", "difference")


def _ring(lat0, lng0, r, n=12, phase=0.0):
    ts = np.linspace(0, 2 * math.pi, n, endpoint=False) + phase
    lats = lat0 + r * np.sin(ts)
    lngs = lng0 + r * np.cos(ts)
    return np.stack(latlng_to_xyz(np.radians(lats), np.radians(lngs)), axis=-1)


def _member(rings, pts):
    inside = np.zeros(len(pts), dtype=bool)
    for r in rings:
        r = np.asarray(r)
        inside ^= loop_contains_points(r, loop_origin_inside(r), pts)
    return inside


_rng = np.random.default_rng(29)
PTS = np.stack(
    latlng_to_xyz(
        np.radians(_rng.uniform(-12, 12, 1500)),
        np.radians(_rng.uniform(-12, 12, 1500)),
    ),
    axis=-1,
)


def check(a_rings, b_rings, op, tag):
    in_a = _member(a_rings, PTS)
    in_b = _member(b_rings, PTS)
    want = {
        "union": in_a | in_b,
        "intersection": in_a & in_b,
        "difference": in_a & ~in_b,
    }[op]
    try:
        got = _member(polygon_boolean(a_rings, b_rings, op), PTS)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL-EXC {tag} op={op}: {type(e).__name__}: {e}")
        return False
    bad = int((got != want).sum())
    if bad:
        print(f"FAIL {tag} op={op}: {bad}/{len(PTS)} mismatched points")
        return False
    return True


def main():
    fails = 0
    # 1) same-circle shell/hole vs shell, all n pairs 3..12, both nestings
    for na, nb in itertools.product(range(3, 13), range(3, 13)):
        for hole_r, shell_r in ((2.0, 6.0), (3.0, 6.0)):
            a = [_ring(0, 0, shell_r, na), _ring(0, 0, hole_r, na)]
            b = [_ring(0, 0, hole_r, nb)]
            for op in OPS:
                fails += not check(a, b, op, f"hole-circle na={na} nb={nb} r={hole_r}")
            # B shell on A's SHELL circle
            b2 = [_ring(0, 0, shell_r, nb)]
            for op in OPS:
                fails += not check(a, b2, op, f"shell-circle na={na} nb={nb} r={shell_r}")
            # B with its own hole, shell on A's hole circle
            b3 = [_ring(0, 0, hole_r, nb), _ring(0, 0, hole_r * 0.4, nb)]
            for op in OPS:
                fails += not check(a, b3, op, f"hole-circle+Bhole na={na} nb={nb}")
    # 2) phase-shifted same-circle (vertex-on-edge, no shared verts)
    for na, nb in ((6, 8), (6, 6), (8, 8), (5, 7), (6, 12), (4, 8)):
        for ph in (0.0, math.pi / max(na, nb), math.pi / (2 * nb), 1e-9, 1e-12):
            a = [_ring(0, 0, 6.0, na), _ring(0, 0, 2.0, na)]
            b = [_ring(0, 0, 2.0, nb, phase=ph)]
            for op in OPS:
                fails += not check(a, b, op, f"phase na={na} nb={nb} ph={ph:g}")
    # 2b) translated same-radius rings (the Hypothesis-found family:
    # near-parallel offset edges, vertex-on-edge to ~1e-20)
    for n in (5, 7, 9, 12):
        for dlat in (0.05, 0.2, 0.5, 0.7629394531249999, 1.0, 1.9):
            a = [_ring(0, 0, 2.0, n)]
            b = [_ring(dlat, 0, 2.0, n)]
            for op in OPS:
                fails += not check(a, b, op, f"translate n={n} dlat={dlat:g}")
            a2 = [_ring(0, 0, 2.0, n), _ring(0, 0, 0.8, n)]
            for op in OPS:
                fails += not check(a2, b, op, f"translate+hole n={n} dlat={dlat:g}")
    # 3) random sweep mirroring the Hypothesis strategy
    rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    for i in range(n_iter):
        def side():
            clat = float(rng.uniform(-4, 4))
            clng = float(rng.uniform(-4, 4))
            r = float(rng.uniform(2.0, 6.0))
            n = int(rng.integers(6, 17))
            rings = [_ring(clat, clng, r, n)]
            if rng.random() < 0.5:
                rings.append(_ring(clat, clng, float(rng.uniform(0.5, r * 0.45)), n))
            return rings

        a, b = side(), side()
        op = OPS[int(rng.integers(0, 3))]
        fails += not check(a, b, op, f"rand#{i}")
        # shrink-style variant: snap B's center/radius onto A's
        if rng.random() < 0.3:
            a2 = [_ring(0, 0, 4.0, int(rng.integers(3, 10)))]
            if rng.random() < 0.7:
                a2.append(_ring(0, 0, 2.0, int(rng.integers(3, 10))))
            b2 = [_ring(0, 0, rng.choice([2.0, 4.0]), int(rng.integers(3, 10)))]
            fails += not check(a2, b2, op, f"snap#{i}")
    print(f"done, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
