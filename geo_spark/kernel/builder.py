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
