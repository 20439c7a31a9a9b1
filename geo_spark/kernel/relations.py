"""Loop <-> loop relations: contains / intersects between closed rings.

Re-derivation of the boundary-relation logic of s2/loop.go:274-371 (the
index-free equivalent): with no boundary crossings, containment and
intersection reduce to single point-in-loop tests; with any crossing the
loops intersect and neither contains the other.  Shared-vertex
degeneracies route through the robust crossing cascade exactly like the
PIP kernel (geo_spark/kernel/pip.py), so results are deterministic.

Used as the pairwise refine of the polygon<->polygon join
(operators/geom_join.py): covering-term candidates first, these tests
only on candidate pairs.
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernel import predicates as pred
from geo_spark.kernel.pip import (
    _crossing_slow,
    loop_contains_points,
)


def _any_edge_crossing(a_verts: np.ndarray, b_verts: np.ndarray) -> bool:
    """Whether any edge of loop A crosses any edge of loop B
    (EdgeOrVertexCrossing semantics over both chains)."""
    a_chain = np.vstack([a_verts, a_verts[:1]])
    b_chain = np.vstack([b_verts, b_verts[:1]])
    for i in range(len(a_verts)):
        a0, a1 = a_chain[i], a_chain[i + 1]
        m = len(b_verts)
        c = b_chain[:-1]
        d = b_chain[1:]
        acb = -pred.triage_sign(
            np.broadcast_to(a0, (m, 3)), np.broadcast_to(a1, (m, 3)), c
        )
        bda = pred.triage_sign(
            np.broadcast_to(a0, (m, 3)), np.broadcast_to(a1, (m, 3)), d
        )
        maybe = (acb == 0) | (bda == 0)
        live = (acb == bda) & (acb != 0)
        if live.any():
            cl, dl = c[live], d[live]
            cbd = -pred.triage_sign(cl, dl, np.broadcast_to(a1, cl.shape))
            dac = pred.triage_sign(cl, dl, np.broadcast_to(a0, cl.shape))
            acb_l = acb[live]
            if ((cbd == acb_l) & (dac == acb_l)).any():
                return True
            maybe[np.nonzero(live)[0][(cbd == 0) | (dac == 0)]] = True
        for k in np.nonzero(maybe)[0]:
            if _crossing_slow(
                a0, a1, b_chain[k], b_chain[k + 1], int(acb[k]), int(bda[k])
            ):
                return True
    return False


def loop_relation(
    a_verts: np.ndarray,
    a_origin_inside: bool,
    b_verts: np.ndarray,
    b_origin_inside: bool,
) -> tuple[bool, bool]:
    """(a_contains_b, a_intersects_b); s2/loop.go:274-371 semantics via
    the crossing-free reduction."""
    a_verts = np.atleast_2d(a_verts)
    b_verts = np.atleast_2d(b_verts)
    if _any_edge_crossing(a_verts, b_verts):
        return False, True
    # No boundary crossings: each loop is entirely inside or outside the
    # other.
    b0_in_a = bool(
        loop_contains_points(a_verts, a_origin_inside, b_verts[:1])[0]
    )
    a0_in_b = bool(
        loop_contains_points(b_verts, b_origin_inside, a_verts[:1])[0]
    )
    if b0_in_a:
        return True, True  # B inside A (or A covers sphere region incl. B)
    if a0_in_b:
        return False, True  # A inside B: intersect but not contains
    return False, False


def chain_crossings(
    a_verts: np.ndarray,
    b_verts: np.ndarray,
    a_closed: bool = False,
    b_closed: bool = True,
) -> int:
    """Count of INTERIOR edge crossings (CrossingSign == Cross,
    s2/edge_crossings.go:88-91) between two edge chains — the refine
    kernel of the crossing-edge join (s2/crossing_edge_query.go:31-390
    analog).  Shared-vertex touches count zero (they are MaybeCross, not
    Cross).  Vectorized triage over all edge pairs; the robust cascade
    resolves only the indeterminate residue."""
    a_verts = np.atleast_2d(np.asarray(a_verts, dtype=np.float64))
    b_verts = np.atleast_2d(np.asarray(b_verts, dtype=np.float64))
    a_chain = np.vstack([a_verts, a_verts[:1]]) if a_closed else a_verts
    b_chain = np.vstack([b_verts, b_verts[:1]]) if b_closed else b_verts
    c = b_chain[:-1]
    d = b_chain[1:]
    m = len(c)
    if m == 0 or len(a_chain) < 2:
        return 0

    count = 0
    for i in range(len(a_chain) - 1):
        a0, a1 = a_chain[i], a_chain[i + 1]
        acb = -pred.triage_sign(
            np.broadcast_to(a0, (m, 3)), np.broadcast_to(a1, (m, 3)), c
        )
        bda = pred.triage_sign(
            np.broadcast_to(a0, (m, 3)), np.broadcast_to(a1, (m, 3)), d
        )
        live = (acb == bda) & (acb != 0)
        maybe = (acb == 0) | (bda == 0)
        if live.any():
            cl, dl = c[live], d[live]
            cbd = -pred.triage_sign(cl, dl, np.broadcast_to(a1, cl.shape))
            dac = pred.triage_sign(cl, dl, np.broadcast_to(a0, cl.shape))
            acb_l = acb[live]
            crossed = (cbd == acb_l) & (dac == acb_l)
            count += int(crossed.sum())
            # zero inner signs -> resolve exactly
            maybe[np.nonzero(live)[0][(cbd == 0) | (dac == 0)]] = True
            # strict mismatches already counted/settled; drop from maybe
        for k in np.nonzero(maybe)[0]:
            count += int(
                _interior_crossing_slow(a0, a1, b_chain[k], b_chain[k + 1])
            )
    return count


def _interior_crossing_slow(a, b, c, d) -> bool:
    """Exact CrossingSign == Cross for one edge pair: all four robust
    signs agree and are nonzero (shared vertices/degenerate edges are
    MaybeCross/DoNotCross -> False); s2/edge_crossings.go:88-91."""
    from geo_spark.kernel.pip import _eq, _robust_sign_scalar

    if _eq(a, b) or _eq(c, d):
        return False
    if _eq(a, c) or _eq(a, d) or _eq(b, c) or _eq(b, d):
        return False
    acb = -_robust_sign_scalar(a, b, c)
    bda = _robust_sign_scalar(a, b, d)
    if acb != bda:
        return False
    cbd = -_robust_sign_scalar(c, d, b)
    if cbd != acb:
        return False
    dac = _robust_sign_scalar(c, d, a)
    return dac == acb
