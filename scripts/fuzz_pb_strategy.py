"""Mass replay of the test_fuzz_membership strategy space with
cross-side parameter sharing (Hypothesis shrinking makes draws equal,
producing exact shared vertices).  Usage: fuzz_pb_strategy.py [seed] [n]."""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_spark.kernel.booleans import loop_origin_inside, polygon_boolean
from geo_spark.kernel.cellid import latlng_to_xyz
from geo_spark.kernel.pip import loop_contains_points

OPS = ("union", "intersection", "difference")


def _ring(lat0, lng0, r, n=12):
    ts = np.linspace(0, 2 * math.pi, n, endpoint=False)
    lats = lat0 + r * np.sin(ts)
    lngs = lng0 + r * np.cos(ts)
    return np.stack(latlng_to_xyz(np.radians(lats), np.radians(lngs)), axis=-1)


def _member(rings, pts):
    inside = np.zeros(len(pts), dtype=bool)
    for r in rings:
        r = np.asarray(r)
        inside ^= loop_contains_points(r, loop_origin_inside(r), pts)
    return inside


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rng = np.random.default_rng(seed)
    pts = np.stack(
        latlng_to_xyz(
            np.radians(rng.uniform(-12, 12, 1500)),
            np.radians(rng.uniform(-12, 12, 1500)),
        ),
        axis=-1,
    )
    fails = 0
    # shrink-target pool the way Hypothesis collapses draws
    snap_vals = [0.0, 0.5, 1.0, 2.0, 2.5, 3.0, 4.0, -4.0, 6.0]

    def draw_side(share_from=None):
        def f(lo, hi):
            if rng.random() < 0.4:
                cands = [v for v in snap_vals if lo <= v <= hi]
                if cands:
                    return float(rng.choice(cands))
            return float(rng.uniform(lo, hi))

        if share_from is not None and rng.random() < 0.6:
            clat, clng = share_from[0], share_from[1]
        else:
            clat, clng = f(-4, 4), f(-4, 4)
        r = f(2.0, 6.0)
        n = int(rng.integers(6, 17))
        rings = [_ring(clat, clng, r, n)]
        hole_r = None
        if rng.random() < 0.7:
            hole_r = f(0.5, r * 0.45)
            rings.append(_ring(clat, clng, hole_r, n))
        return (clat, clng, r, n, hole_r), rings

    for t in range(trials):
        pa, a_rings = draw_side()
        if rng.random() < 0.5:
            # B shell snapped onto A's hole (or shell) circle
            clat, clng = pa[0], pa[1]
            rr = pa[4] if (pa[4] is not None and pa[4] >= 2.0 and rng.random() < 0.7) else pa[2]
            if rr < 2.0:
                rr = pa[2]
            n = int(rng.integers(6, 17))
            b_rings = [_ring(clat, clng, rr, n)]
            if rng.random() < 0.4:
                b_rings.append(_ring(clat, clng, float(rng.uniform(0.5, rr * 0.45)), n))
            pb = (clat, clng, rr, n)
        else:
            pb, b_rings = draw_side(share_from=pa)
        op = OPS[int(rng.integers(0, 3))]
        in_a = _member(a_rings, pts)
        in_b = _member(b_rings, pts)
        want = {
            "union": in_a | in_b,
            "intersection": in_a & in_b,
            "difference": in_a & ~in_b,
        }[op]
        try:
            got = _member(polygon_boolean(a_rings, b_rings, op), pts)
        except Exception as e:  # noqa: BLE001
            print(f"EXC t={t} op={op} a={pa} b={pb}: {type(e).__name__}: {e}")
            fails += 1
            continue
        bad = int((got != want).sum())
        if bad:
            print(f"FAIL t={t} op={op} bad={bad} a={pa} b={pb}")
            fails += 1
    print(f"{fails} failures / {trials} trials (seed {seed})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
