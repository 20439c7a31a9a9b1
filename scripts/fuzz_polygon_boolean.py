"""Stress polygon_boolean on the shared-vertex / same-circle ring
configurations round-2's fuzz gate flagged: rings inscribed in the same
circle with different vertex counts share isolated exact vertices and
cross transversally between them.  Prints every failing configuration."""

from __future__ import annotations

import math
import sys

import numpy as np

from geo_spark.kernel.booleans import polygon_boolean
from geo_spark.kernel.cellid import latlng_to_xyz
from geo_spark.kernel.pip import loop_contains_points
from geo_spark.kernel.booleans import loop_origin_inside

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


def check(tag, a_rings, b_rings, pts):
    fails = []
    in_a = _member(a_rings, pts)
    in_b = _member(b_rings, pts)
    for op in OPS:
        want = {
            "union": in_a | in_b,
            "intersection": in_a & in_b,
            "difference": in_a & ~in_b,
        }[op]
        try:
            got = _member(polygon_boolean(a_rings, b_rings, op), pts)
        except Exception as e:  # noqa: BLE001
            fails.append((tag, op, f"EXC {type(e).__name__}: {e}"))
            continue
        bad = int((got != want).sum())
        if bad:
            fails.append((tag, op, f"{bad}/{len(pts)} pts wrong"))
    return fails


def main():
    rng = np.random.default_rng(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
    pts = np.stack(
        latlng_to_xyz(
            np.radians(rng.uniform(-12, 12, 2500)),
            np.radians(rng.uniform(-12, 12, 2500)),
        ),
        axis=-1,
    )
    all_fails = []

    # 1. hole hexagon vs same-circle B n-gon, various n / phases / radii
    for n_hole in (4, 6, 8):
        for n_b in (4, 5, 6, 8, 10, 12):
            for phase in (0.0, math.pi / 12, math.pi / n_b):
                for r in (0.5, 2.0, 3.0):
                    a = [_ring(0, 0, 6.0, 6), _ring(0, 0, r, n_hole)]
                    b = [_ring(0, 0, r, n_b, phase)]
                    tag = f"hole{n_hole}_b{n_b}_ph{phase:.3f}_r{r}"
                    all_fails += check(tag, a, b, pts)

    # 2. B also has a hole on the same circle as A's hole
    for n_b in (8, 12):
        a = [_ring(0, 0, 6.0, 6), _ring(0, 0, 2.0, 6)]
        b = [_ring(0, 0, 5.0, 8), _ring(0, 0, 2.0, n_b)]
        all_fails += check(f"double_hole_b{n_b}", a, b, pts)

    # 3. shells on same circle sharing vertices (no holes)
    for n_a in (6, 8):
        for n_b in (8, 10, 12):
            a = [_ring(0, 0, 3.0, n_a)]
            b = [_ring(0, 0, 3.0, n_b)]
            all_fails += check(f"shell{n_a}_shell{n_b}", a, b, pts)

    # 4. random same-circle pairs with random centers/sizes
    for t in range(60):
        clat = float(rng.uniform(-3, 3))
        clng = float(rng.uniform(-3, 3))
        rr = float(rng.uniform(0.5, 2.5))
        n1 = int(rng.integers(4, 10))
        n2 = int(rng.integers(4, 13))
        shell = float(rng.uniform(max(3.0, rr * 2.3), 6.0))
        a = [_ring(clat, clng, shell, 6), _ring(clat, clng, rr, n1)]
        b = [_ring(clat, clng, rr, n2)]
        all_fails += check(f"rand{t}_n{n1}v{n2}_r{rr:.2f}", a, b, pts)

    # 5. tiny radii (judge mentioned circumradius ~6e-4 rad ~ 0.035 deg)
    for r in (0.01, 0.035, 0.1):
        a = [_ring(0, 0, r * 3, 6), _ring(0, 0, r, 6)]
        b = [_ring(0, 0, r, 8)]
        tpts = np.stack(
            latlng_to_xyz(
                np.radians(rng.uniform(-4 * r, 4 * r, 2500)),
                np.radians(rng.uniform(-4 * r, 4 * r, 2500)),
            ),
            axis=-1,
        )
        all_fails += check(f"tiny_r{r}", a, b, tpts)

    for f in all_fails:
        print("FAIL", *f)
    print(f"{len(all_fails)} failing (tag, op) combos")
    return 1 if all_fails else 0


if __name__ == "__main__":
    sys.exit(main())
