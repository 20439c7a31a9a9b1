"""Edge (geodesic segment) kernels: distances, projection,
interpolation, polyline simplification.

Re-derivation of s2/edge_distances.go:30-332 (point<->segment minimum
distance via the interior-vs-endpoint case split), s2/edge_distances.go
:96-168 (Project / Interpolate), and the tolerance-guaranteed vertex
subsampling of s2/polyline.go:230-358 (same guarantee — every dropped
vertex lies within tolerance of the replacement edge — via a direct
check rather than the reference's wedge-narrowing scan).

All functions are vectorized over numpy arrays; the kNN refine and the
polyline UDFs batch through them.
"""

from __future__ import annotations

import math

import numpy as np


def _norm(v: np.ndarray) -> np.ndarray:
    return np.sqrt((v * v).sum(axis=-1))


def point_segment_chord2(
    x: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Squared chord distance from points x (N,3) to segments (a,b)
    ((N,3) aligned): interior case when x projects inside the minor arc
    (sign tests against the edge normal), else nearest endpoint."""
    x = np.atleast_2d(x)
    a = np.atleast_2d(a)
    b = np.atleast_2d(b)
    n = np.cross(a, b)  # edge great-circle normal (unnormalized)
    # Interior iff x is within the lune swept from a to b.
    in_a = (np.cross(a, x) * n).sum(axis=1) >= 0
    in_b = (np.cross(x, b) * n).sum(axis=1) >= 0
    interior = in_a & in_b

    nn = _norm(n)
    nn = np.where(nn == 0, 1.0, nn)
    sin_d = np.abs((x * n).sum(axis=1)) / nn
    sin_d = np.clip(sin_d, 0.0, 1.0)
    cos_d = np.sqrt(1.0 - sin_d * sin_d)
    chord2_interior = 2.0 * (1.0 - cos_d)

    da = ((x - a) ** 2).sum(axis=1)
    db = ((x - b) ** 2).sum(axis=1)
    chord2_end = np.minimum(da, db)
    out = np.where(interior, chord2_interior, chord2_end)
    return np.minimum(out, 4.0)


def point_to_edges_chord2(x: np.ndarray, chain: np.ndarray) -> np.ndarray:
    """Min squared chord distance from each point (N,3) to ANY edge of
    the open chain (M,3) -> (N,)."""
    x = np.atleast_2d(x)
    chain = np.atleast_2d(chain)
    if len(chain) == 1:
        d = x - chain[0]
        return np.minimum((d * d).sum(axis=1), 4.0)
    best = np.full(len(x), 4.0)
    for i in range(len(chain) - 1):
        a = np.broadcast_to(chain[i], x.shape)
        b = np.broadcast_to(chain[i + 1], x.shape)
        best = np.minimum(best, point_segment_chord2(x, a, b))
    return best


def interpolate(a: np.ndarray, b: np.ndarray, t: float) -> np.ndarray:
    """Point at fraction t along the minor arc ab (slerp);
    s2/edge_distances.go:129-160."""
    cosang = float(np.clip(np.dot(a, b), -1.0, 1.0))
    ang = math.acos(cosang)
    if ang == 0.0:
        return a.copy()
    s = math.sin(ang)
    p = (math.sin((1 - t) * ang) / s) * a + (math.sin(t * ang) / s) * b
    return p / math.sqrt(p @ p)


def project(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Closest point on segment ab to x; s2/edge_distances.go:96-115."""
    n = np.cross(a, b)
    nn = math.sqrt(n @ n)
    if nn == 0:
        return a.copy()
    n = n / nn
    in_a = float(np.dot(np.cross(a, x), n)) >= 0
    in_b = float(np.dot(np.cross(x, b), n)) >= 0
    if in_a and in_b:
        p = x - n * float(np.dot(x, n))
        norm = math.sqrt(p @ p)
        if norm > 0:
            return p / norm
    da = float(((x - a) ** 2).sum())
    db = float(((x - b) ** 2).sum())
    return (a if da <= db else b).copy()


def simplify_polyline(verts: np.ndarray, tolerance_rad: float) -> np.ndarray:
    """Indices of a subsampled polyline: greedy longest-edge advance with
    the guarantee that every skipped vertex is within tolerance of the
    replacement edge (s2/polyline.go:230-263 contract).  O(n^2) worst
    case; per-geometry (one task), so the bound is per-polyline size."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    m = len(verts)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    tol_chord2 = (2 * math.sin(min(max(tolerance_rad, 0.0), math.pi / 2) / 2)) ** 2
    keep = [0]
    idx = 0
    while idx + 1 < m:
        # furthest j such that verts[idx+1..j-1] all within tolerance of
        # edge (idx, j)
        nxt = idx + 1
        for j in range(idx + 2, m):
            mid = verts[idx + 1 : j]
            a = np.broadcast_to(verts[idx], mid.shape)
            b = np.broadcast_to(verts[j], mid.shape)
            if np.all(point_segment_chord2(mid, a, b) <= tol_chord2):
                nxt = j
            else:
                break
        if not np.array_equal(verts[nxt], verts[idx]):
            keep.append(nxt)
        idx = nxt
    return np.array(keep, dtype=np.int64)


def edge_pair_chord2(
    a0: np.ndarray, a1: np.ndarray, b0: np.ndarray, b1: np.ndarray
) -> float:
    """Min squared chord distance between segments A=(a0,a1) and
    B=(b0,b1): zero when they cross, else the minimum of the four
    endpoint-to-opposite-segment distances (the closest pair of
    non-crossing geodesic segments always involves an endpoint);
    s2/edge_distances.go:334-419."""
    from geo_spark.kernel.relations import chain_crossings

    if chain_crossings(
        np.stack([a0, a1]), np.stack([b0, b1]), a_closed=False, b_closed=False
    ):
        return 0.0
    d = min(
        float(point_segment_chord2(a0[None, :], b0[None, :], b1[None, :])[0]),
        float(point_segment_chord2(a1[None, :], b0[None, :], b1[None, :])[0]),
        float(point_segment_chord2(b0[None, :], a0[None, :], a1[None, :])[0]),
        float(point_segment_chord2(b1[None, :], a0[None, :], a1[None, :])[0]),
    )
    return d


def chain_pair_chord2(a_chain: np.ndarray, b_chain: np.ndarray) -> float:
    """Min squared chord distance between two open chains: zero on any
    crossing, else min over (vertex, opposite chain) pairs — vectorized
    (the endpoint property makes vertex-to-chain sweeps sufficient);
    the polyline<->polyline distance kernel (s2/polyline.go:493-532
    Intersects + edge-pair distances)."""
    from geo_spark.kernel.relations import chain_crossings

    a_chain = np.atleast_2d(a_chain)
    b_chain = np.atleast_2d(b_chain)
    if len(a_chain) >= 2 and len(b_chain) >= 2 and chain_crossings(
        a_chain, b_chain, a_closed=False, b_closed=False
    ):
        return 0.0
    d1 = point_to_edges_chord2(a_chain, b_chain).min()
    d2 = point_to_edges_chord2(b_chain, a_chain).min()
    return float(min(d1, d2))


def polylines_intersect(a_chain: np.ndarray, b_chain: np.ndarray) -> bool:
    """Whether two polylines share any point: an interior crossing or an
    exact touch (distance exactly zero); s2/polyline.go:493-532."""
    return chain_pair_chord2(a_chain, b_chain) == 0.0
