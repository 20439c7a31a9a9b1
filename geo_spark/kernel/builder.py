"""Builder-style snap assembly for chained constructive ops.

The reference's Builder (s2/builder concepts; the Go port stubs the
full assembly) snaps output vertices to a discrete site set so that
chained boolean/buffer operations keep exact shared vertices instead of
accumulating near-coincident float vertices that break downstream
robustness.  This module implements the S2CellIdSnapFunction analog:

- every vertex snaps to the center of its level-``L`` S2 cell (exact,
  deterministic, identical across executors);
- consecutive duplicate sites merge (site dedup);
- degenerate spikes (``a b a``) are peeled until a fixpoint;
- rings left with fewer than 3 distinct sites are dropped.

Snap displacement is bounded by the level-``L`` cell circumradius, so
region membership changes only within that distance of a boundary —
at level 30 (~1 cm) this is exact for any analytic use.

Chained ops: because two snapped geometries share *exact* vertices
wherever their boundaries meet, :func:`geo_spark.kernel.booleans.
polygon_boolean`'s shared-vertex and seam handling applies verbatim to
op-of-op compositions (the degeneracy class SURVEY §8.1 queue #1 left
open).
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernel import cellid as ck


def snap_ids(verts: np.ndarray, level: int = 30) -> np.ndarray:
    """(n,3) xyz -> uint64 cell ids of the level-``level`` snap sites."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    ids = ck.cellid_from_xyz(verts[:, 0], verts[:, 1], verts[:, 2])
    if level < ck.MAX_LEVEL:
        ids = ck.parent(ids, level)
    return ids


def _dedup_consecutive(ids: np.ndarray) -> np.ndarray:
    """Drop ids equal to their cyclic predecessor."""
    if len(ids) == 0:
        return ids
    keep = ids != np.roll(ids, 1)
    if not keep.any():  # all identical -> single site
        return ids[:1]
    return ids[keep]


def _peel_spikes(ids: np.ndarray) -> np.ndarray:
    """Remove ``a b a`` spikes until a fixpoint (each removal deletes
    the tip, then consecutive dedup merges the flanking copies)."""
    ids = _dedup_consecutive(ids)
    while len(ids) >= 3:
        prev = np.roll(ids, 1)
        nxt = np.roll(ids, -1)
        spike = prev == nxt
        if not spike.any():
            return ids
        # peel one spike tip at a time: simultaneous removal of adjacent
        # spikes can eat a whole zig-zag in the wrong order
        tip = int(np.argmax(spike))
        ids = _dedup_consecutive(np.delete(ids, tip))
    return ids


def snap_rings(
    rings: list[np.ndarray], level: int = 30
) -> list[np.ndarray]:
    """Snap every ring's vertices to level-``level`` cell centers, merge
    duplicate sites, peel spikes, and drop degenerate rings.  Output
    vertices are exact cell centers: re-snapping is the identity."""
    out = []
    for verts in rings:
        ids = _peel_spikes(snap_ids(verts, level))
        if len(ids) < 3:
            continue
        x, y, z = ck.cellid_to_xyz(ids)
        out.append(np.stack([x, y, z], axis=1))
    return out


#
# IntLatLng snapping (E5/E6/E7... integer-degree lattices)
#
# Reference: s2/builder_snapper.go:355-505 (IntLatLngSnapper).  The
# documented contract (and the C++ original) snaps DEGREES scaled by
# 10**exponent and rounded half-away-from-zero to the nearest integer
# — E7 is the lattice OSM / Placemark data ships in, so this is the
# snapper that makes external integer-degree data join exactly.  (The
# Go port's SnapPoint at builder_snapper.go:498-505 multiplies the
# *radian* value by 10**e — a unit slip vs its own doc comment and vs
# C++ IntLatLngSnapFunction; we implement the documented semantics.)
# Rounding matches s2/util.go:21-27 roundAngle: half away from zero.

_DBL_EPS = 2.220446049250313e-16
MIN_INT_SNAPPING_EXPONENT = 0
MAX_INT_SNAPPING_EXPONENT = 10


def snap_latlng_e(
    lat_deg: np.ndarray, lng_deg: np.ndarray, exponent: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """Degrees -> integer E-coordinates (int64), rounding half away
    from zero (s2/util.go:21 roundAngle semantics)."""
    if not (
        MIN_INT_SNAPPING_EXPONENT <= exponent <= MAX_INT_SNAPPING_EXPONENT
    ):
        raise ValueError(f"exponent {exponent} out of [0, 10]")
    s = 10.0**exponent
    la = np.asarray(lat_deg, dtype=np.float64) * s
    ln = np.asarray(lng_deg, dtype=np.float64) * s
    ila = np.trunc(la + np.copysign(0.5, la)).astype(np.int64)
    iln = np.trunc(ln + np.copysign(0.5, ln)).astype(np.int64)
    return ila, iln


def unsnap_latlng_e(
    ilat: np.ndarray, ilng: np.ndarray, exponent: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """Integer E-coordinates -> degrees (the site positions)."""
    s = 10.0**exponent
    return (
        np.asarray(ilat, dtype=np.float64) / s,
        np.asarray(ilng, dtype=np.float64) / s,
    )


def min_snap_radius_for_exponent(exponent: int) -> float:
    """Radians; s2/builder_snapper.go:392-421 (≈ 10**-e / sqrt(2) deg
    plus the (9*sqrt(2)+1.5)*eps conversion-error term)."""
    import math

    power = 10.0**exponent
    return math.radians((1.0 / math.sqrt(2.0)) / power) + (
        9.0 * math.sqrt(2.0) + 1.5
    ) * _DBL_EPS


def exponent_for_max_snap_radius(snap_radius: float) -> int:
    """Minimum exponent whose snap displacement stays within
    ``snap_radius`` radians (s2/builder_snapper.go:428-441), clamped
    to the valid [0, 10] range."""
    import math

    r = max(snap_radius - (9.0 * math.sqrt(2.0) + 1.5) * _DBL_EPS, 1e-30)
    exponent = math.log10((1.0 / math.sqrt(2.0)) / math.degrees(r))
    return min(
        max(
            int(math.ceil(exponent - 2 * _DBL_EPS)),
            MIN_INT_SNAPPING_EXPONENT,
        ),
        MAX_INT_SNAPPING_EXPONENT,
    )


def min_vertex_separation_e(exponent: int) -> float:
    """Radians; max of the proportional and asymptotic bounds
    (s2/builder_snapper.go:444-465)."""
    import math

    r = min_snap_radius_for_exponent(exponent)
    return max(0.471 * r, r - math.radians(1.0 / math.sqrt(2.0)) / 10.0**exponent)


def min_edge_vertex_separation_e(exponent: int) -> float:
    """Radians; max of the constant / proportional / asymptotic bounds
    (s2/builder_snapper.go:468-495)."""
    import math

    r = min_snap_radius_for_exponent(exponent)
    vs = min_vertex_separation_e(exponent)
    return max(
        0.277 * math.radians(1.0) / 10.0**exponent,
        0.222 * r,
        0.5 * (vs / r) * vs,
    )


def snap_rings_e(
    rings: list[np.ndarray], exponent: int = 7
) -> list[np.ndarray]:
    """IntLatLng analog of :func:`snap_rings`: snap each ring's xyz
    vertices to the E-``exponent`` integer-degree lattice, merge
    duplicate sites, peel spikes, drop rings with <3 distinct sites.
    Output vertices are exact site positions: re-snapping is the
    identity (the chaining invariant)."""
    out = []
    for verts in rings:
        verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
        lat, lng = ck.xyz_to_latlng(verts[:, 0], verts[:, 1], verts[:, 2])
        ila, iln = snap_latlng_e(lat, lng, exponent)
        # exact pair key: |values| < 1.8e12 << 2^53, complex equality
        # compares both components exactly — and _peel_spikes (the
        # shared cell-id pipeline) is elementwise, so it runs verbatim
        # on complex keys; the components recover exactly afterwards
        keys = ila.astype(np.float64) + 1j * iln.astype(np.float64)
        kept = _peel_spikes(keys)
        if len(kept) < 3:
            continue
        sla, sln = unsnap_latlng_e(
            kept.real.astype(np.int64), kept.imag.astype(np.int64), exponent
        )
        x, y, z = ck.latlng_to_xyz(sla, sln)
        out.append(np.stack([x, y, z], axis=1))
    return out


def polygon_boolean_snapped(
    a_rings: list[np.ndarray],
    b_rings: list[np.ndarray],
    op: str,
    level: int = 30,
) -> list[np.ndarray]:
    """Boolean op with Builder snap on inputs and output — the chained
    form: feeding the result back as an input keeps all vertices on the
    same site lattice, so seams between chained results are exact."""
    from geo_spark.kernel.booleans import polygon_boolean

    return snap_rings(
        polygon_boolean(snap_rings(a_rings, level), snap_rings(b_rings, level), op),
        level,
    )
