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
