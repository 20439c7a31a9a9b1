"""Buffer (offset) operation: expand a loop outward by an angular radius
with round corner joins.

Re-derivation of the BufferOperation semantics (s2/buffer_operation.go:
41-338: offset curves with round caps, arc tessellation controlled by an
error fraction): every boundary point moves distance r away from the
interior —

- along an edge (a,b): p -> cos(r) p - sin(r) n_hat, where n_hat is the
  interior-pointing edge normal (exactly the great-circle offset);
- at a convex vertex: a tessellated arc of radius r around the vertex
  sweeping between the adjacent edges' offset directions.

Scope: convex and mildly concave loops (offset self-intersections are
not cleaned up — the reference routes those through its stubbed Builder;
cleanup lands with the boolean-op assembly in a later round).
"""

from __future__ import annotations

import math

import numpy as np


def _unit(v: np.ndarray) -> np.ndarray:
    return v / math.sqrt(v @ v)


def buffer_loop(
    verts: np.ndarray, radius_rad: float, error_fraction: float = 0.02
) -> np.ndarray:
    """CCW loop -> CCW buffered loop at angular distance radius_rad.

    error_fraction bounds the corner-arc chord error relative to the
    radius (s2/buffer_operation.go ErrorFraction): max arc step =
    2*acos(1 - error_fraction)."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    n = len(verts)
    if n < 3 or radius_rad <= 0:
        return verts.copy()
    cos_r = math.cos(radius_rad)
    sin_r = math.sin(radius_rad)
    max_step = 2 * math.acos(max(1e-9, 1 - error_fraction))

    out: list[np.ndarray] = []
    for i in range(n):
        a = verts[i]
        b = verts[(i + 1) % n]
        c = verts[(i + 2) % n]
        # Interior-pointing normal of edge (a,b): for CCW loops the
        # interior is to the left, and a x b points left of the directed
        # edge.
        n_ab = _unit(np.cross(a, b))
        n_bc = _unit(np.cross(b, c))
        # Offset edge endpoints for (a,b).
        out.append(cos_r * a - sin_r * n_ab)
        out.append(cos_r * b - sin_r * n_ab)
        # Round join at b: sweep the outward direction from -n_ab to
        # -n_bc around b (only for convex turns: positive sweep).
        d0 = -n_ab
        d1 = -n_bc
        # Angle between the directions in the tangent plane at b.
        cosang = float(np.clip(d0 @ d1, -1.0, 1.0))
        ang = math.acos(cosang)
        # Convex iff rotating d0 toward d1 goes counterclockwise seen
        # from outside at b: sign of (d0 x d1) . b
        if float(np.cross(d0, d1) @ b) > 0 and ang > 1e-12:
            steps = max(1, int(math.ceil(ang / max_step)))
            for k in range(1, steps):
                t = k / steps
                # slerp of the outward direction
                d = (math.sin((1 - t) * ang) * d0 + math.sin(t * ang) * d1) / math.sin(
                    ang
                )
                d = _unit(d - b * float(d @ b))  # keep tangent at b
                out.append(cos_r * b + sin_r * d)
    ring = np.array(out)
    # Drop consecutive duplicates.
    keep = [0]
    for i in range(1, len(ring)):
        if float((ring[i] - ring[keep[-1]]) @ (ring[i] - ring[keep[-1]])) > 1e-24:
            keep.append(i)
    return ring[keep]


def _min_dist_to_chain(p: np.ndarray, loop_verts: np.ndarray) -> float:
    """Min angular distance from a point to a closed chain's edges."""
    from geo_spark.kernel import edges as E

    a = loop_verts
    b = np.roll(loop_verts, -1, axis=0)
    c2 = float(
        E.point_segment_chord2(np.broadcast_to(p, a.shape), a, b).min()
    )
    return 2.0 * math.asin(0.5 * math.sqrt(min(4.0, c2)))


def buffer_loop_rings(
    verts: np.ndarray, radius_rad: float, error_fraction: float = 0.02
) -> list[np.ndarray]:
    """Buffer with self-intersection cleanup: works for arbitrarily
    concave loops, returning the full set of boundary rings (a deep
    concavity whose mouth closes at the given radius yields an inner
    ring as well; interpret rings with the XOR-parity convention).

    Method: build the raw offset curve (exact edge offsets + round
    convex joins), split it at its robust self-crossings
    (kernel/booleans machinery), and keep exactly the arcs whose points
    lie at the full radius from the input chain — a raw-curve point is
    swallowed iff it is strictly within the radius of some *other* edge,
    so the kept arcs stitch into the true buffer boundary.  This
    replaces the offset-curve cleanup the reference routes through its
    stubbed Builder (s2/buffer_operation.go:41-338; the fork's README
    marks that assembly "use at your own risk")."""
    from geo_spark.kernel.booleans import (
        _split_chain,
        _stitch,
        edge_intersection,
        robust_crossing,
    )

    ring = buffer_loop(verts, radius_rad, error_fraction)
    n = len(ring)
    crossings: dict[int, list[np.ndarray]] = {}
    found = False
    for i in range(n):
        a0, a1 = ring[i], ring[(i + 1) % n]
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # wrap-adjacent edges share a vertex
            b0, b1 = ring[j], ring[(j + 1) % n]
            if robust_crossing(a0, a1, b0, b1):
                x = edge_intersection(a0, a1, b0, b1)
                crossings.setdefault(i, []).append(x)
                crossings.setdefault(j, []).append(x)
                found = True
    if not found:
        return [ring]

    arcs = _split_chain(ring, crossings)
    # tessellation sagitta + join slop: kept arcs sit within this margin
    # of the exact radius; swallowed arcs are strictly closer to the
    # input chain
    thr = radius_rad * (1.0 - 3.0 * error_fraction) - 1e-12
    loop = np.atleast_2d(np.asarray(verts, dtype=np.float64))

    def arc_on_boundary(arc) -> bool:
        pts = arc[0]
        # probe the midpoint of the longest segment (strictly inside the
        # arc, never a crossing endpoint)
        best, best_d = None, -1.0
        for t in range(len(pts) - 1):
            d = float((pts[t] - pts[t + 1]) @ (pts[t] - pts[t + 1]))
            if d > best_d:
                best_d = d
                best = 0.5 * (pts[t] + pts[t + 1])
        best = best / math.sqrt(best @ best)
        return _min_dist_to_chain(best, loop) >= thr

    kept = [a for a in arcs if arc_on_boundary(a)]
    rings = _stitch(kept)
    if not rings:
        return [ring]
    # Normalize each ring to enclose the smaller side (Loop.IsNormalized
    # semantics) so the XOR-parity membership convention composes: the
    # stitcher preserves raw-curve traversal order, which leaves inner
    # (hole) rings oriented around the complement.
    from geo_spark.kernel.measures import loop_area

    out = []
    for rg in rings:
        if loop_area(np.asarray(rg)) > 2.0 * math.pi:
            rg = np.asarray(rg)[::-1]
        out.append(np.asarray(rg))
    return out
