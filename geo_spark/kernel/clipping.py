"""Robust clipping of geodesic edges to cube faces and of 2-D edges to
rectangles.

Contract follows the reference's edge-clipping module
(s2/edge_clipping.go:35-687):

* ``clip_to_padded_face`` (s2/edge_clipping.go:92-139) — the portion of
  geodesic edge AB intersecting one cube face, in that face's (u,v)
  coordinates, clipped to ``[-R,R]^2`` with ``R = 1 + padding``.  The
  face-intersection *test* is exact (the ``|Nu|+|Nv| >= |Nw|`` corner
  argument, s2/edge_clipping.go:195-210); returned vertices are within
  ``FACE_CLIP_ERROR_UV_DIST`` of the exact edge.
* ``face_segments`` (s2/edge_clipping.go:525-585) — subdivide AB at every
  cube-face boundary it crosses, producing a continuous chain of per-face
  (u,v) segments from A to B, robust to the line missing the endpoint
  faces by tiny numerical margins (``move_origin_to_valid_face``,
  s2/edge_clipping.go:587-644) and to exact corner exits (``next_face``,
  s2/edge_clipping.go:651-687).
* 2-D helpers ``clip_edge`` / ``clip_edge_bound`` / ``edge_intersects_rect``
  (s2/edge_clipping.go:144-498) with the monotone interpolation guarantees
  of ``interpolate_float64`` (s2/edge_clipping.go:489-512).
* ``edge_cells_at_level`` — the engine's scale path for covering a long
  edge: face segments -> supercover walk of the level-``k`` ij grid.  This
  replaces CrossingEdgeQuery's quadtree descent (s2/crossing_edge_query.go:
  176-287) with a closed-form enumeration that needs no index structure.

Everything here is per-edge scalar math invoked from layer-prep /
``applyInPandas`` paths (one geometry per row); the hot per-page paths never
call it.
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid as ck

DBL_EPSILON = float(np.finfo(np.float64).eps)

# Error bounds, s2/edge_clipping.go:35-73.
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPSILON
EDGE_CLIP_ERROR_UV_DIST = 2.25 * DBL_EPSILON
FACE_CLIP_ERROR_RADIANS = 3.0 * DBL_EPSILON
FACE_CLIP_ERROR_UV_DIST = 9.0 * DBL_EPSILON
FACE_CLIP_ERROR_UV_COORD = 9.0 * (1.0 / math.sqrt(2.0)) * DBL_EPSILON
INTERSECTS_RECT_ERROR_UV_DIST = 3.0 * math.sqrt(2.0) * DBL_EPSILON

AXIS_U = 0
AXIS_V = 1

# (u,v,w) axes of each face as rows of a 3x3 matrix (s2/stuv.go:406-414);
# uvw coordinates of p on face f are then _UVW_AXES[f] @ p.
_UVW_AXES = np.array(
    [
        [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
        [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],
        [[-1, 0, 0], [0, -1, 0], [0, 0, 1]],
        [[0, 0, -1], [0, -1, 0], [-1, 0, 0]],
        [[0, 0, -1], [1, 0, 0], [0, -1, 0]],
        [[0, 1, 0], [1, 0, 0], [0, 0, -1]],
    ],
    dtype=np.float64,
)

# Neighboring face along each (axis, direction) (s2/stuv.go:416-424).
_UVW_FACES = (
    ((4, 1), (5, 2), (3, 0)),
    ((0, 3), (5, 2), (4, 1)),
    ((0, 3), (1, 4), (5, 2)),
    ((2, 5), (1, 4), (0, 3)),
    ((2, 5), (3, 0), (1, 4)),
    ((4, 1), (3, 0), (2, 5)),
)


def face_xyz_to_uvw(face: int, p: np.ndarray) -> np.ndarray:
    """Coordinates of ``p`` in the (u,v,w) frame of ``face``
    (s2/stuv.go:312-329)."""
    return _UVW_AXES[face] @ np.asarray(p, dtype=np.float64)


def uvw_face(face: int, axis: int, direction: int) -> int:
    """Face adjacent to ``face`` along ``axis`` in ``direction``
    (s2/stuv.go:431-435)."""
    return _UVW_FACES[face][axis][direction]


def _face_of(p: np.ndarray) -> int:
    return int(ck.face_from_xyz(np.array([p[0]]), np.array([p[1]]), np.array([p[2]]))[0])


def _valid_face_uv(face: int, p: np.ndarray) -> tuple[float, float]:
    """(u,v) of a point known to project onto ``face`` (w > 0)."""
    u, v, w = face_xyz_to_uvw(face, p)
    return u / w, v / w


def _face_uv_to_xyz(face: int, u: float, v: float) -> np.ndarray:
    x, y, z = ck.face_uv_to_xyz(
        np.array([face]), np.array([u], dtype=np.float64), np.array([v], dtype=np.float64)
    )
    return np.array([x[0], y[0], z[0]])


def _robust_cross(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a+b) x (b-a): nonzero even for antipodal inputs, = 2 a x b
    (s2/point.go:82 PointCross)."""
    return np.cross(a + b, b - a)


def sum_equal(u: float, v: float, w: float) -> bool:
    """Whether u + v == w exactly in real arithmetic
    (s2/edge_clipping.go:186-189)."""
    return (u + v == w) and (u == w - v) and (v == w - u)


def intersects_face(n: np.ndarray) -> bool:
    """Whether the directed line with face-frame normal ``n`` meets the
    [-1,1]^2 face square; exact (s2/edge_clipping.go:195-210)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def intersects_opposite_edges(n: np.ndarray) -> bool:
    """Whether the line crosses two *opposite* edges of the face square;
    exact (s2/edge_clipping.go:212-236)."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    return (u - w >= v) if u >= v else (v - w >= u)


def exit_axis(n: np.ndarray) -> int:
    """Axis (AXIS_U or AXIS_V) through whose +/-1 edge the directed line
    exits the face (s2/edge_clipping.go:247-276)."""
    if intersects_opposite_edges(n):
        return AXIS_V if abs(n[0]) >= abs(n[1]) else AXIS_U
    neg = int(math.copysign(1, n[0]) < 0) ^ int(math.copysign(1, n[1]) < 0) ^ int(
        math.copysign(1, n[2]) < 0
    )
    return AXIS_U if neg else AXIS_V


def exit_point(n: np.ndarray, axis: int) -> tuple[float, float]:
    """(u,v) where the directed line exits the face along ``axis``
    (s2/edge_clipping.go:278-294)."""
    if axis == AXIS_U:
        u = 1.0 if n[1] > 0 else -1.0
        return u, (-u * n[0] - n[2]) / n[1]
    v = 1.0 if n[0] < 0 else -1.0
    return (-v * n[1] - n[2]) / n[0], v


def _clip_destination(
    a: np.ndarray,
    b: np.ndarray,
    scaled_n: np.ndarray,
    a_tan: np.ndarray,
    b_tan: np.ndarray,
    scale_uv: float,
) -> tuple[tuple[float, float], int]:
    """Clip endpoint B of AB (all in face uvw coordinates) to the face,
    returning its (u,v) and a 0-3 score; scores of both endpoints summing
    to >= 3 means AB misses the face (s2/edge_clipping.go:304-366)."""
    max_safe = 1.0 - FACE_CLIP_ERROR_UV_COORD
    if b[2] > 0:
        uv = (b[0] / b[2], b[1] / b[2])
        if max(abs(uv[0]), abs(uv[1])) <= max_safe:
            return uv, 0

    eu, ev = exit_point(scaled_n, exit_axis(scaled_n))
    uv = (eu * scale_uv, ev * scale_uv)
    p = np.array([uv[0], uv[1], 1.0])

    score = 0
    if (p - a) @ a_tan < 0:
        score = 2  # exit point on the wrong side of A
    elif (p - b) @ b_tan < 0:
        score = 1  # exit point on the wrong side of B
    if score > 0:
        if b[2] <= 0:
            score = 3  # B does not project onto this face
        else:
            uv = (b[0] / b[2], b[1] / b[2])
    return uv, score


def clip_to_padded_face(
    a: np.ndarray, b: np.ndarray, face: int, padding: float = 0.0
) -> tuple[tuple[float, float], tuple[float, float]] | None:
    """(u,v) endpoints of AB clipped to ``face`` expanded by ``padding``,
    or None if AB definitively misses the face
    (s2/edge_clipping.go:92-139)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if _face_of(a) == face and _face_of(b) == face:
        return _valid_face_uv(face, a), _valid_face_uv(face, b)

    # The normal must come from the original xyz frame so antipodal
    # symbolic behavior is frame-independent (s2/edge_clipping.go:102-106).
    norm_uvw = face_xyz_to_uvw(face, _robust_cross(a, b))
    a_uvw = face_xyz_to_uvw(face, a)
    b_uvw = face_xyz_to_uvw(face, b)

    scale_uv = 1.0 + padding
    scaled_n = np.array([scale_uv * norm_uvw[0], scale_uv * norm_uvw[1], norm_uvw[2]])
    if not intersects_face(scaled_n):
        return None

    # Guard against denormal-underflow in the normalization
    # (s2/edge_clipping.go:125-130).
    if np.abs(norm_uvw).max() < math.ldexp(1, -511):
        norm_uvw = norm_uvw * math.ldexp(1, 563)
    norm_uvw = norm_uvw / np.linalg.norm(norm_uvw)

    a_tan = np.cross(norm_uvw, a_uvw)
    b_tan = np.cross(b_uvw, norm_uvw)
    a_uv, a_score = _clip_destination(b_uvw, a_uvw, -scaled_n, b_tan, a_tan, scale_uv)
    b_uv, b_score = _clip_destination(a_uvw, b_uvw, scaled_n, a_tan, b_tan, scale_uv)
    if a_score + b_score >= 3:
        return None
    return a_uv, b_uv


def clip_to_face(a: np.ndarray, b: np.ndarray, face: int):
    """Unpadded variant (s2/edge_clipping.go:75-89)."""
    return clip_to_padded_face(a, b, face, 0.0)


def _move_origin_to_valid_face(
    face: int, a: np.ndarray, ab: np.ndarray, a_uv: tuple[float, float]
) -> tuple[int, tuple[float, float]]:
    """Reproject endpoint A onto an adjacent face when the computed line
    AB misses A's face or exits it on the wrong side
    (s2/edge_clipping.go:587-644)."""
    max_safe = 1.0 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv[0]), abs(a_uv[1])) <= max_safe:
        return face, a_uv

    n = face_xyz_to_uvw(face, ab)
    if intersects_face(n):
        eu, ev = exit_point(n, exit_axis(n))
        exit_xyz = _face_uv_to_xyz(face, eu, ev)
        a_tangent = np.cross(ab / np.linalg.norm(ab), a)
        if (exit_xyz - a) @ a_tangent >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv

    if abs(a_uv[0]) >= abs(a_uv[1]):
        face = uvw_face(face, 0, int(a_uv[0] > 0))
    else:
        face = uvw_face(face, 1, int(a_uv[1] > 0))
    u, v = _valid_face_uv(face, a)
    return face, (max(-1.0, min(1.0, u)), max(-1.0, min(1.0, v)))


def _next_face(
    face: int, exit_uv: tuple[float, float], axis: int, n: np.ndarray, target_face: int
) -> int:
    """Next face the line AB enters after exiting ``face``; jumps straight
    to the target face on an exact corner exit (s2/edge_clipping.go:651-687)."""
    if axis == AXIS_V:
        exit_a, exit_other = exit_uv[1], exit_uv[0]
    else:
        exit_a, exit_other = exit_uv[0], exit_uv[1]
    if (
        abs(exit_other) == 1.0
        and uvw_face(face, 1 - axis, int(exit_other > 0)) == target_face
        and sum_equal(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])
    ):
        return target_face
    return uvw_face(face, axis, int(exit_a > 0))


def face_segments(a: np.ndarray, b: np.ndarray) -> list[tuple[int, tuple[float, float], tuple[float, float]]]:
    """Subdivide edge AB at cube-face boundaries: list of
    ``(face, a_uv, b_uv)`` forming a continuous path from A to B
    (s2/edge_clipping.go:525-585)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a_face = _face_of(a)
    b_face = _face_of(b)
    a_uv = _valid_face_uv(a_face, a)
    b_uv = _valid_face_uv(b_face, b)
    if a_face == b_face:
        return [(a_face, a_uv, b_uv)]

    ab = _robust_cross(a, b)
    a_face, a_uv = _move_origin_to_valid_face(a_face, a, ab, a_uv)
    b_face, b_uv = _move_origin_to_valid_face(b_face, b, -ab, b_uv)

    segments: list[tuple[int, tuple[float, float], tuple[float, float]]] = []
    face = a_face
    seg_a = a_uv
    # Bounded walk: a great-circle line meets at most a handful of faces,
    # but numerical pathologies must not loop forever.
    for _ in range(32):
        if face == b_face:
            break
        n = face_xyz_to_uvw(face, ab)
        axis = exit_axis(n)
        seg_b = exit_point(n, axis)
        segments.append((face, seg_a, seg_b))
        exit_xyz = _face_uv_to_xyz(face, seg_b[0], seg_b[1])
        face = _next_face(face, seg_b, axis, n, b_face)
        u, v, w = face_xyz_to_uvw(face, exit_xyz)
        seg_a = (u, v)
    segments.append((face, seg_a, b_uv))
    return segments


# ---------------------------------------------------------------------------
# 2-D clipping against rectangles (s2/edge_clipping.go:144-512).
# A rect is (x_lo, x_hi, y_lo, y_hi); empty iff x_lo > x_hi or y_lo > y_hi.


def interpolate_float64(x: float, a: float, b: float, a1: float, b1: float) -> float:
    """Map ``x`` from segment [a,b] to [a1,b1] with exact-endpoint and
    betweenness guarantees (s2/edge_clipping.go:489-512)."""
    if a == b:
        return a1
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * (x - a) / (b - a)
    return b1 + (a1 - b1) * (x - b) / (a - b)


def _update_endpoint(lo: float, hi: float, high_endpoint: bool, value: float):
    """Narrow one endpoint of [lo,hi] to ``value``; None when the interval
    would invert (s2/edge_clipping.go:368-389)."""
    if not high_endpoint:
        if hi < value:
            return None
        return (max(lo, value), hi)
    if lo > value:
        return None
    return (lo, min(hi, value))


def _clip_bound_axis(a0, b0, bound0, a1, b1, bound1, neg_slope, clip_lo, clip_hi):
    """Clip the axis-0 bound of segment (a0,a1)->(b0,b1) to [clip_lo,clip_hi],
    tightening the axis-1 bound via interpolation
    (s2/edge_clipping.go:391-422)."""
    lo0, hi0 = bound0
    lo1, hi1 = bound1
    if lo0 < clip_lo:
        if hi0 < clip_lo:
            return None
        lo0 = clip_lo
        upd = _update_endpoint(lo1, hi1, neg_slope, interpolate_float64(clip_lo, a0, b0, a1, b1))
        if upd is None:
            return None
        lo1, hi1 = upd
    if hi0 > clip_hi:
        if lo0 > clip_hi:
            return None
        hi0 = clip_hi
        upd = _update_endpoint(lo1, hi1, not neg_slope, interpolate_float64(clip_hi, a0, b0, a1, b1))
        if upd is None:
            return None
        lo1, hi1 = upd
    return (lo0, hi0), (lo1, hi1)


def clip_edge_bound(a, b, clip, bound):
    """Tight bound of (the part of) AB within ``bound`` further clipped to
    rect ``clip``; None when disjoint (s2/edge_clipping.go:464-487)."""
    ax, ay = a
    bx, by = b
    cx_lo, cx_hi, cy_lo, cy_hi = clip
    bx_lo, bx_hi, by_lo, by_hi = bound
    neg_slope = (ax > bx) != (ay > by)
    r = _clip_bound_axis(ax, bx, (bx_lo, bx_hi), ay, by, (by_lo, by_hi), neg_slope, cx_lo, cx_hi)
    if r is None:
        return None
    (bx_lo, bx_hi), (by_lo, by_hi) = r
    r = _clip_bound_axis(ay, by, (by_lo, by_hi), ax, bx, (bx_lo, bx_hi), neg_slope, cy_lo, cy_hi)
    if r is None:
        return None
    (by_lo, by_hi), (bx_lo, bx_hi) = r
    return (bx_lo, bx_hi, by_lo, by_hi)


def _rect_from_points(a, b):
    return (min(a[0], b[0]), max(a[0], b[0]), min(a[1], b[1]), max(a[1], b[1]))


def clip_edge(a, b, clip):
    """Endpoints of AB clipped to rect ``clip``, or None
    (s2/edge_clipping.go:144-162)."""
    bound = clip_edge_bound(a, b, clip, _rect_from_points(a, b))
    if bound is None:
        return None
    x_lo, x_hi, y_lo, y_hi = bound
    ax = x_hi if a[0] > b[0] else x_lo
    ay = y_hi if a[1] > b[1] else y_lo
    bx = x_lo if a[0] > b[0] else x_hi
    by = y_lo if a[1] > b[1] else y_hi
    return (ax, ay), (bx, by)


def edge_intersects_rect(a, b, rect) -> bool:
    """Whether segment AB meets the closed rect, to within
    INTERSECTS_RECT_ERROR_UV_DIST (s2/edge_clipping.go:424-451)."""
    x_lo, x_hi, y_lo, y_hi = rect
    bx_lo, bx_hi, by_lo, by_hi = _rect_from_points(a, b)
    if bx_lo > x_hi or bx_hi < x_lo or by_lo > y_hi or by_hi < y_lo:
        return False
    # All four rect corners on one side of line AB <=> no intersection.
    nx, ny = -(b[1] - a[1]), b[0] - a[0]
    ix = x_hi if nx >= 0 else x_lo
    iy = y_hi if ny >= 0 else y_lo
    jx = x_lo if nx >= 0 else x_hi
    jy = y_lo if ny >= 0 else y_hi
    hi = nx * (ix - a[0]) + ny * (iy - a[1])
    lo = nx * (jx - a[0]) + ny * (jy - a[1])
    return hi >= 0 and lo <= 0


# ---------------------------------------------------------------------------
# Edge -> cell enumeration (CrossingEdgeQuery scale path).


def _padded_cell_rect(gi: int, gj: int, size: int, pad: float):
    """uv rect of grid cell (gi,gj) at the given ij ``size``, padded."""
    s = np.array(
        [gi * size, (gi + 1) * size, gj * size, (gj + 1) * size], dtype=np.float64
    ) / float(1 << 30)
    u_lo, u_hi, v_lo, v_hi = ck.st_to_uv(s)
    return (u_lo - pad, u_hi + pad, v_lo - pad, v_hi + pad)


def edge_cells_at_level(a: np.ndarray, b: np.ndarray, lvl: int) -> np.ndarray:
    """All level-``lvl`` cell ids whose (padded) uv rectangle the edge AB
    passes through.

    Closed-form replacement for CrossingEdgeQuery's quadtree descent
    (s2/crossing_edge_query.go:176-287): the gnomonic (central) projection
    maps great circles to straight uv lines, so per face segment we walk
    the level-``lvl`` ij grid along the straight uv segment (supercover
    DDA), then admit each visited cell's 8-neighborhood that passes the
    padded ``edge_intersects_rect`` test so the face-clip error cannot
    drop a candidate.  Cost is O(cells along the line), not O(bbox).
    Output is sorted unique uint64; a strict superset of the cells the
    exact edge meets (downstream joins refine with CrossingSign).
    """
    lvl = int(lvl)
    size = 1 << (30 - lvl)  # ij extent of one level-lvl cell
    n_cells = 1 << lvl
    pad = FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST
    out: list[int] = []
    for fc, a_uv, b_uv in face_segments(np.asarray(a), np.asarray(b)):
        def grid(c_uv: float) -> int:
            # scalar uv_to_st (s2/stuv.go:196-201) then ij bucket
            if c_uv >= 0:
                c_st = 0.5 * math.sqrt(1.0 + 3.0 * c_uv)
            else:
                c_st = 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * c_uv)
            g = int(c_st * (1 << 30)) // size
            return min(max(g, 0), n_cells - 1)

        def boundary_uv(g: int) -> float:
            # uv position of the st grid line between cell g-1 and g
            # (scalar st_to_uv, s2/stuv.go:186-194)
            s = g * size / float(1 << 30)
            if s >= 0.5:
                return (1.0 / 3.0) * (4.0 * s * s - 1.0)
            return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

        # Supercover DDA straight-line walk in uv space (the gnomonic
        # projection maps the geodesic to a straight uv segment); grid
        # boundaries are st-uniform, so they are mapped through st_to_uv.
        gi, gj = grid(a_uv[0]), grid(a_uv[1])
        gi_end, gj_end = grid(b_uv[0]), grid(b_uv[1])
        core = {(gi, gj)}
        du = b_uv[0] - a_uv[0]
        dv = b_uv[1] - a_uv[1]
        step_i = 1 if du > 0 else -1
        step_j = 1 if dv > 0 else -1
        guard = 4 * (abs(gi_end - gi) + abs(gj_end - gj)) + 8
        for _ in range(guard):
            if gi == gi_end and gj == gj_end:
                break
            # parameter t at which the segment leaves the current cell
            # through the next i- or j- grid line
            if du != 0:
                ti = (boundary_uv(gi + (step_i > 0)) - a_uv[0]) / du
            else:
                ti = math.inf
            if dv != 0:
                tj = (boundary_uv(gj + (step_j > 0)) - a_uv[1]) / dv
            else:
                tj = math.inf
            if ti <= tj and gi != gi_end:
                gi += step_i
            elif gj != gj_end:
                gj += step_j
            else:
                gi += step_i
            core.add((gi, gj))

        seen: set[tuple[int, int]] = set()
        for ci, cj in core:
            for ni in range(ci - 1, ci + 2):
                for nj in range(cj - 1, cj + 2):
                    if ni < 0 or nj < 0 or ni >= n_cells or nj >= n_cells:
                        continue
                    if (ni, nj) in seen:
                        continue
                    seen.add((ni, nj))
                    if edge_intersects_rect(
                        a_uv, b_uv, _padded_cell_rect(ni, nj, size, pad)
                    ):
                        leaf = ck.cellid_from_face_ij(
                            np.array([fc]),
                            np.array([ni * size + size // 2], dtype=np.int64),
                            np.array([nj * size + size // 2], dtype=np.int64),
                        )[0]
                        out.append(int(ck.parent(np.array([leaf]), lvl)[0]))
    return np.unique(np.array(out, dtype=np.uint64))
