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


# ---------------------------------------------------------------------------
# Wedge relations & nested containment — s2/wedge_relations.go:35-97,
# s2/loop.go:436-470, 963-1012.
# ---------------------------------------------------------------------------


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """Wedge A=(a0,ab1,a2) contains wedge B=(b0,ab1,b2) at the shared
    middle vertex; s2/wedge_relations.go:48-55."""
    return pred.ordered_ccw(a2, b2, b0, ab1) and pred.ordered_ccw(b0, a0, a2, ab1)


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """Whether the open wedges share any interior point;
    s2/wedge_relations.go:57-66."""
    return not (
        pred.ordered_ccw(a0, b2, b0, ab1) and pred.ordered_ccw(b0, a2, a0, ab1)
    )


def _find_vertex(verts: np.ndarray, p: np.ndarray) -> int | None:
    hits = np.nonzero((verts == p).all(axis=1))[0]
    return int(hits[0]) if len(hits) else None


def loop_contains_nested(
    a_verts: np.ndarray, a_origin_inside: bool, b_verts: np.ndarray
) -> bool:
    """Containment for loops whose boundaries may share vertices but do
    not cross: exact wedge comparison at a shared vertex, plain PIP
    otherwise; s2/loop.go:963-985."""
    a_verts = np.atleast_2d(a_verts)
    b_verts = np.atleast_2d(b_verts)
    if len(b_verts) < 2:
        return True
    m = _find_vertex(a_verts, b_verts[1 % len(b_verts)])
    if m is None:
        return bool(
            loop_contains_points(a_verts, a_origin_inside, b_verts[1:2])[0]
        )
    n = len(a_verts)
    return wedge_contains(
        a_verts[(m - 1) % n],
        a_verts[m],
        a_verts[(m + 1) % n],
        b_verts[0],
        b_verts[2 % len(b_verts)],
    )


def compare_boundary(
    a_verts: np.ndarray, a_origin_inside: bool, b_verts: np.ndarray
) -> int:
    """+1 if loop A's interior contains B's entire boundary, -1 if it
    excludes it, 0 if the boundaries cross; s2/loop.go:436-470 semantics
    (shared single vertices do not count as crossings)."""
    if _any_edge_crossing_strict(a_verts, b_verts):
        return 0
    # pick a B vertex not shared with A when possible
    b_verts = np.atleast_2d(b_verts)
    for k in range(len(b_verts)):
        if _find_vertex(np.atleast_2d(a_verts), b_verts[k]) is None:
            inside = bool(
                loop_contains_points(a_verts, a_origin_inside, b_verts[k : k + 1])[0]
            )
            return 1 if inside else -1
    # every B vertex lies on A: decide by wedge containment at vertex 1
    return 1 if loop_contains_nested(a_verts, a_origin_inside, b_verts) else -1


def _any_edge_crossing_strict(a_verts: np.ndarray, b_verts: np.ndarray) -> bool:
    """Interior (strict) crossing between the closed boundaries."""
    return (
        chain_crossings(
            np.atleast_2d(a_verts), np.atleast_2d(b_verts),
            a_closed=True, b_closed=True,
        )
        > 0
    )


def infer_loop_nesting(
    loops: list[tuple[int, np.ndarray, bool]]
) -> list[tuple[int, int | None, int]]:
    """(loop_id, parent_id | None, depth) for a set of non-crossing
    rings — the ShapeNestingQuery analog (s2/shape_nesting_query.go:54):
    shells at even depth, holes at odd depth, parent = the tightest
    containing ring.  Quadratic in ring count (layer validation runs per
    polygon group, not per corpus)."""
    n = len(loops)
    contains = [[False] * n for _ in range(n)]
    for i in range(n):
        _, vi, oi = loops[i]
        for j in range(n):
            if i == j:
                continue
            _, vj, _ = loops[j]
            if compare_boundary(vi, oi, vj) == 1:
                contains[i][j] = True
    out = []
    for j in range(n):
        ancestors = [i for i in range(n) if contains[i][j]]
        depth = len(ancestors)
        parent = None
        if ancestors:
            # tightest container: the ancestor contained by all others
            for i in ancestors:
                if all(contains[k][i] for k in ancestors if k != i):
                    parent = loops[i][0]
                    break
        out.append((loops[j][0], parent, depth))
    return out


def polygon_relation(
    a_loops: list[tuple[np.ndarray, bool]],
    b_loops: list[tuple[np.ndarray, bool]],
) -> tuple[bool, bool]:
    """(a_contains_b, a_intersects_b) for multi-loop XOR-parity polygons
    (holes) — s2/polygon.go:835-904 semantics via the crossing-free
    reduction, generic position (no shared boundaries):

    - any boundary crossing between any loop pair -> intersects, not
      contains;
    - with no crossings every loop lies wholly inside or outside the
      other polygon, so membership of one representative vertex per loop
      decides everything:
        contains  <=>  a rep of B's first loop is in A AND no loop of A
                       has its rep strictly inside B (such a loop would
                       flip A-membership within B's interior);
        intersects <=> some rep of A in B or some rep of B in A.

    Loops are (verts, origin_inside) pairs in the XOR convention of
    PolygonRegion: holes are passed as their CCW disc rings (membership
    = XOR of per-loop containment), matching s2/polygon.go:591-613.
    """

    def member(loops, pts):
        inside = np.zeros(len(np.atleast_2d(pts)), dtype=bool)
        for verts, oi in loops:
            inside ^= loop_contains_points(verts, oi, np.atleast_2d(pts))
        return inside

    for av, _ in a_loops:
        for bv, _ in b_loops:
            if chain_crossings(av, bv, a_closed=True, b_closed=True) > 0:
                return False, True

    a_reps = np.stack([v[0] for v, _ in a_loops])
    b_reps = np.stack([v[0] for v, _ in b_loops])
    b_in_a = member(a_loops, b_reps)
    a_in_b = member(b_loops, a_reps)
    intersects = bool(b_in_a.any() or a_in_b.any())
    contains = bool(b_in_a[0]) and not bool(a_in_b.any())
    return contains, intersects


def chain_pairs_crossings_indexed(
    A: np.ndarray,
    lenA: np.ndarray,
    B: np.ndarray,
    lenB: np.ndarray,
    ai: np.ndarray,
    bi: np.ndarray,
    chunk_elems: int = 20_000_000,
) -> np.ndarray:
    """Batched :func:`chain_crossings` (open chains) over pair index
    arrays into padded vertex tables (see edges.pad_chain_table; closed
    chains are pre-closed by appending their first vertex before
    padding).  Counts per pair equal the scalar kernel exactly: the
    vectorized triage decides the certain edge pairs; any pair with an
    indeterminate sign anywhere falls back to the scalar robust cascade
    (a count cannot shortcut uncertainty the way a zero distance can)."""
    ai = np.asarray(ai, dtype=np.int64)
    bi = np.asarray(bi, dtype=np.int64)
    n = len(ai)
    out = np.zeros(n, dtype=np.int64)
    ma, mb = A.shape[1], B.shape[1]
    sa, sb = max(ma - 1, 0), max(mb - 1, 0)
    if sa == 0 or sb == 0:
        return out
    per_pair = 24 * sa * sb
    chunk = max(1024, chunk_elems // per_pair)
    err = pred.MAX_DETERMINANT_ERROR

    def _sgn(det):
        return np.where(
            det > err, np.int8(1), np.where(det < -err, np.int8(-1), np.int8(0))
        )

    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        P = A[ai[lo:hi]]
        Q = B[bi[lo:hi]]
        la = lenA[ai[lo:hi]]
        lb = lenB[bi[lo:hi]]
        na = pred.cross(P[:, :-1, :], P[:, 1:, :])
        nb = pred.cross(Q[:, :-1, :], Q[:, 1:, :])
        acb = -_sgn(pred.dot(na[:, :, None, :], Q[:, None, :-1, :]))
        bda = _sgn(pred.dot(na[:, :, None, :], Q[:, None, 1:, :]))
        cbd = -_sgn(pred.dot(nb[:, None, :, :], P[:, 1:, None, :]))
        dac = _sgn(pred.dot(nb[:, None, :, :], P[:, :-1, None, :]))
        valid = (
            (np.arange(sa)[None, :, None] < (la - 1)[:, None, None])
            & (np.arange(sb)[None, None, :] < (lb - 1)[:, None, None])
        )
        certain = (acb != 0) & (bda != 0) & (cbd != 0) & (dac != 0)
        crossing = valid & certain & (acb == bda) & (cbd == acb) & (dac == acb)
        cnt = crossing.sum(axis=(1, 2)).astype(np.int64)
        uncertain = (valid & ~certain).any(axis=(1, 2))
        for j in np.nonzero(uncertain)[0]:
            cnt[j] = chain_crossings(
                A[ai[lo + j]][: lenA[ai[lo + j]]],
                B[bi[lo + j]][: lenB[bi[lo + j]]],
                a_closed=False,
                b_closed=False,
            )
        out[lo:hi] = cnt
    return out
