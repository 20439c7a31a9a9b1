"""Deterministic polygon-layer fixtures (FIXTURES.md §2).

Regular loops (the RegularLoop analog, s2/loop.go:749-768: n points at a
fixed angular radius around a center, CCW) centered on the hot cities —
the join targets that give the pages join realistic hit rates and
hot-cell skew.
"""

from __future__ import annotations

import math

import numpy as np

from geo_spark.kernel.regions import LoopRegion, Region
from geo_spark.sources.pages import HOT_CITIES


def regular_loop_vertices(
    lat_deg: float, lng_deg: float, radius_rad: float, n_verts: int
) -> np.ndarray:
    """(n,3) CCW ring at angular radius around the center: rotate the
    center toward an orthonormal frame, matching regularPoints
    (s2/loop.go:749 / s2/s2_test.go frame helpers)."""
    phi = math.radians(lat_deg)
    theta = math.radians(lng_deg)
    c = np.array(
        [
            math.cos(theta) * math.cos(phi),
            math.sin(theta) * math.cos(phi),
            math.sin(phi),
        ]
    )
    # local east/north basis
    east = np.array([-math.sin(theta), math.cos(theta), 0.0])
    north = np.cross(c, east)
    angles = 2 * math.pi * np.arange(n_verts) / n_verts
    sin_r, cos_r = math.sin(radius_rad), math.cos(radius_rad)
    pts = (
        cos_r * c[None, :]
        + sin_r * np.cos(angles)[:, None] * east[None, :]
        + sin_r * np.sin(angles)[:, None] * north[None, :]
    )
    return pts / np.linalg.norm(pts, axis=1)[:, None]


def city_loop_regions(
    n_loops: int = 50, n_verts: int = 64, base_radius: float = 0.02
) -> list[tuple[int, Region]]:
    """Deterministic regular loops cycling through the hot cities with
    varied radii/offsets (seeded)."""
    rng = np.random.default_rng(1234)
    out: list[tuple[int, Region]] = []
    for i in range(n_loops):
        la, ln = HOT_CITIES[i % len(HOT_CITIES)]
        la = float(la + rng.normal(0, 0.3))
        ln = float(ln + rng.normal(0, 0.3))
        radius = float(base_radius * rng.uniform(0.3, 2.0))
        nv = int(rng.integers(8, n_verts + 1))
        out.append(
            (i + 1, LoopRegion.from_vertices(regular_loop_vertices(la, ln, radius, nv)))
        )
    return out
