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
    # Interior iff x is within the lune swept from a to b.  A zero
    # normal (degenerate a==b point-segment, or antipodal endpoints)
    # makes both sign tests vacuously true with sin_d = 0 — force the
    # endpoint path there.
    in_a = (np.cross(a, x) * n).sum(axis=1) >= 0
    in_b = (np.cross(x, b) * n).sum(axis=1) >= 0
    interior = in_a & in_b & ((n * n).sum(axis=1) > 0)

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


# Cache block for the per-edge sweep: each edge pass spawns ~a dozen
# point-length temporaries (cross products, dots, masks); sweeping a
# long chain over a large point batch streams all of them through DRAM
# once PER EDGE.  Processing points in ~16k-row chunks keeps the whole
# per-edge working set cache-resident — bitwise-identical results (no
# cross-row interaction), measured 3-4x on bandwidth-walled hosts.
_EDGE_BLOCK_PTS = 16384


def point_to_edges_chord2(x: np.ndarray, chain: np.ndarray) -> np.ndarray:
    """Min squared chord distance from each point (N,3) to ANY edge of
    the open chain (M,3) -> (N,).  Points stream in cache-sized chunks
    (see _EDGE_BLOCK_PTS)."""
    x = np.atleast_2d(x)
    chain = np.atleast_2d(chain)
    n = len(x)
    if n > _EDGE_BLOCK_PTS and len(chain) > 2:
        out = np.empty(n)
        for s in range(0, n, _EDGE_BLOCK_PTS):
            out[s : s + _EDGE_BLOCK_PTS] = _point_to_edges_chord2_block(
                x[s : s + _EDGE_BLOCK_PTS], chain
            )
        return out
    return _point_to_edges_chord2_block(x, chain)


def _point_to_edges_chord2_block(x: np.ndarray, chain: np.ndarray) -> np.ndarray:
    if len(chain) == 1:
        d = x - chain[0]
        return np.minimum((d * d).sum(axis=1), 4.0)
    best = np.full(len(x), 4.0)
    for i in range(len(chain) - 1):
        a = np.broadcast_to(chain[i], x.shape)
        b = np.broadcast_to(chain[i + 1], x.shape)
        best = np.minimum(best, point_segment_chord2(x, a, b))
    return best


def point_to_edges_chord2_argmin(
    x: np.ndarray, chain: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(min chord2, argmin segment index) from each point (N,3) to the
    open chain (M,3).  Strict `<` update keeps the LOWEST segment index
    on exact ties (the shared-vertex case: both adjacent segments report
    the identical endpoint chord2), matching the relational tie-break
    ORDER BY (chord2, seg_idx) used by the map-match oracle."""
    x = np.atleast_2d(x)
    chain = np.atleast_2d(chain)
    n = len(x)
    if n > _EDGE_BLOCK_PTS and len(chain) > 2:
        best = np.empty(n)
        idx = np.empty(n, dtype=np.int64)
        for s in range(0, n, _EDGE_BLOCK_PTS):
            best[s : s + _EDGE_BLOCK_PTS], idx[s : s + _EDGE_BLOCK_PTS] = (
                _point_to_edges_chord2_argmin_block(x[s : s + _EDGE_BLOCK_PTS], chain)
            )
        return best, idx
    return _point_to_edges_chord2_argmin_block(x, chain)


def _point_to_edges_chord2_argmin_block(
    x: np.ndarray, chain: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    if len(chain) == 1:
        d = x - chain[0]
        return np.minimum((d * d).sum(axis=1), 4.0), np.zeros(len(x), np.int64)
    best = np.full(len(x), 4.0)
    idx = np.zeros(len(x), dtype=np.int64)
    for i in range(len(chain) - 1):
        a = np.broadcast_to(chain[i], x.shape)
        b = np.broadcast_to(chain[i + 1], x.shape)
        d = point_segment_chord2(x, a, b)
        m = d < best
        best[m] = d[m]
        idx[m] = i
    return best, idx


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


# ---------------------------------------------------------------------------
# PolylineSimplifier — the angle-interval algorithm
# (s2/polyline_simplifier.go:31-263), O(n) per output edge instead of the
# greedy O(n^2) re-check in simplify_polyline.
# ---------------------------------------------------------------------------


def _tangent_frame(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Orthonormal (e1, e2) spanning the tangent plane at unit p."""
    ref = np.array([0.0, 0.0, 1.0]) if abs(p[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    e1 = np.cross(p, ref)
    e1 = e1 / math.sqrt(e1 @ e1)
    e2 = np.cross(p, e1)
    return e1, e2


def _direction_to(src: np.ndarray, e1: np.ndarray, e2: np.ndarray, t: np.ndarray) -> float:
    """Bearing (radians in the src tangent frame) of the great circle
    from src toward t."""
    d = t - src * float(src @ t)
    return math.atan2(float(d @ e2), float(d @ e1))


def simplify_polyline_s2(verts: np.ndarray, tolerance_rad: float) -> np.ndarray:
    """Kept-vertex indices via direction-interval narrowing: from each
    source vertex, the set of great-circle bearings that pass within
    tolerance of every skipped vertex is an S1 interval intersection
    (half-width asin(sin tol / sin dist) per target,
    s2/polyline_simplifier.go:175-240); the edge extends while the next
    vertex's bearing stays inside the running interval.  Guarantees every
    skipped vertex lies within tolerance of the chosen edge's great
    circle (the reference documents the same ray-distance guarantee); a
    final vectorized segment-distance verification walks the endpoint
    back when a skipped vertex projects beyond the edge, restoring the
    hard SEGMENT guarantee."""
    from geo_spark.kernel.interval import S1Interval

    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    m = len(verts)
    if m <= 2:
        return np.arange(m, dtype=np.int64)
    tol = min(max(tolerance_rad, 0.0), math.pi / 2)
    sin_tol = math.sin(tol)
    tol_chord2 = (2 * math.sin(tol / 2)) ** 2

    keep = [0]
    i = 0
    while i < m - 1:
        src = verts[i]
        e1, e2 = _tangent_frame(src)
        wedge = S1Interval.full()
        best = i + 1
        j = i + 1
        while j < m:
            bearing = _direction_to(src, e1, e2, verts[j])
            if not wedge.contains(bearing):
                break
            best = j
            # narrow by the disc around verts[j]
            cosd = float(np.clip(src @ verts[j], -1.0, 1.0))
            dist = math.acos(cosd)
            if dist > tol:
                w = math.asin(min(1.0, sin_tol / math.sin(dist)))
                half = S1Interval(
                    math.remainder(bearing - w, 2 * math.pi),
                    math.remainder(bearing + w, 2 * math.pi),
                )
                wedge = wedge.intersection(half)
                if wedge.is_empty():
                    break
            j += 1
        # segment (not just ray) verification, one vectorized pass
        while best > i + 1:
            mid = verts[i + 1 : best]
            d2 = point_segment_chord2(
                mid,
                np.broadcast_to(src, mid.shape),
                np.broadcast_to(verts[best], mid.shape),
            )
            if bool((d2 <= tol_chord2).all()):
                break
            best -= 1
        keep.append(best)
        i = best
    return np.array(keep, dtype=np.int64)


# ---------------------------------------------------------------------------
# EdgeTessellator — s2/edge_tessellator.go:187-291: geodesic <-> projected
# conversion with a guaranteed error tolerance (plate carree projection).
# ---------------------------------------------------------------------------


def _latlng_of(p: np.ndarray) -> tuple[float, float]:
    return (
        math.atan2(p[2], math.hypot(p[0], p[1])),
        math.atan2(p[1], p[0]),
    )


def _from_latlng(lat: float, lng: float) -> np.ndarray:
    cl = math.cos(lat)
    return np.array([cl * math.cos(lng), cl * math.sin(lng), math.sin(lat)])


def tessellate_projected(
    a: np.ndarray, b: np.ndarray, tolerance_rad: float, max_depth: int = 30
) -> np.ndarray:
    """Vertices (incl. endpoints) such that the plate-carree straight
    line between consecutive outputs stays within tolerance of the
    geodesic ab: recursive bisection while the projected midpoint of the
    output segment is farther than tolerance from the geodesic midpoint
    (AppendProjected, s2/edge_tessellator.go:187-240)."""
    out = [a]

    def rec(p: np.ndarray, q: np.ndarray, depth: int) -> None:
        geo_mid = p + q
        geo_mid = geo_mid / math.sqrt(geo_mid @ geo_mid)
        pl, pg = _latlng_of(p)
        ql, qg = _latlng_of(q)
        dg = math.remainder(qg - pg, 2 * math.pi)
        proj_mid = _from_latlng(0.5 * (pl + ql), pg + 0.5 * dg)
        err2 = chord2 = float(((geo_mid - proj_mid) ** 2).sum())
        tol_chord2 = (2 * math.sin(tolerance_rad / 2)) ** 2
        if depth >= max_depth or err2 <= tol_chord2:
            out.append(q)
            return
        rec(p, geo_mid, depth + 1)
        rec(geo_mid, q, depth + 1)

    rec(a, b, 0)
    return np.array(out)


def tessellate_unprojected(
    a: np.ndarray, b: np.ndarray, tolerance_rad: float, max_depth: int = 30
) -> np.ndarray:
    """Inverse direction: vertices whose geodesic chain stays within
    tolerance of the plate-carree straight line between a and b
    (AppendUnprojected, s2/edge_tessellator.go:242-291)."""
    al, ag = _latlng_of(a)
    bl, bg = _latlng_of(b)
    dg = math.remainder(bg - ag, 2 * math.pi)
    out = [a]

    def rec(t0: float, t1: float, depth: int) -> None:
        p0 = _from_latlng(al + t0 * (bl - al), ag + t0 * dg)
        p1 = _from_latlng(al + t1 * (bl - al), ag + t1 * dg)
        tm = 0.5 * (t0 + t1)
        proj_mid = _from_latlng(al + tm * (bl - al), ag + tm * dg)
        geo_mid = p0 + p1
        geo_mid = geo_mid / math.sqrt(geo_mid @ geo_mid)
        err2 = float(((geo_mid - proj_mid) ** 2).sum())
        tol_chord2 = (2 * math.sin(tolerance_rad / 2)) ** 2
        if depth >= max_depth or err2 <= tol_chord2:
            out.append(p1)
            return
        rec(t0, tm, depth + 1)
        rec(tm, t1, depth + 1)

    rec(0.0, 1.0, 0)
    return np.array(out)


def chain_pairs_chord2_indexed(
    A: np.ndarray,
    lenA: np.ndarray,
    B: np.ndarray,
    lenB: np.ndarray,
    ai: np.ndarray,
    bi: np.ndarray,
    chunk_elems: int = 20_000_000,
) -> np.ndarray:
    """Batched :func:`chain_pair_chord2` over pair INDEX arrays — the
    within-distance refine for millions of candidate chain pairs
    without a Python call per pair.

    A (nA, ma, 3) / B (nB, mb, 3) are padded vertex tables (pad = the
    chain's last vertex repeated; padded segments are degenerate
    (v, v), whose point-segment distance is the distance to that real
    vertex — harmless inside a min — and padded edges are masked out of
    the crossing test).  lenA/lenB give true vertex counts; ai/bi index
    the tables per pair.

    Exactness contract: distances use the same float formulas as
    point_segment_chord2 (min-reduction is order-free); crossings are
    decided by the vectorized triage sign, and any pair with an
    indeterminate (triage == 0) edge-pair sign and no certain crossing
    falls back to the scalar robust path — results equal
    chain_pair_chord2 pair for pair (differential-tested)."""
    from geo_spark.kernel import predicates as pred

    ai = np.asarray(ai, dtype=np.int64)
    bi = np.asarray(bi, dtype=np.int64)
    n = len(ai)
    out = np.empty(n, dtype=np.float64)
    ma, mb = A.shape[1], B.shape[1]
    sa, sb = max(ma - 1, 0), max(mb - 1, 0)
    # chunk so the LARGEST live set of (k, m, s, 3) temporaries (~8 of
    # them in flight in the vertex-segment pass) stays ~chunk_elems
    # doubles — oversizing regresses badly on bandwidth-bound hosts
    per_pair = 24 * max(ma * max(sb, 1), mb * max(sa, 1), sa * max(sb, 1), 1)
    chunk = max(1024, chunk_elems // per_pair)

    def _verts_to_segs(X, Q):
        """min chord2 from each pair's X-vertices to its Q-segments;
        X (k, mx, 3), Q (k, mq, 3) -> (k,)"""
        if Q.shape[1] < 2:
            d = X[:, :, None, :] - Q[:, None, :, :]
            return np.minimum((d * d).sum(-1), 4.0).min(axis=(1, 2))
        a = Q[:, None, :-1, :]
        b = Q[:, None, 1:, :]
        x = X[:, :, None, :]
        nrm = np.cross(Q[:, :-1, :], Q[:, 1:, :])[:, None, :, :]
        in_a = (np.cross(a, x) * nrm).sum(-1) >= 0
        in_b = (np.cross(x, b) * nrm).sum(-1) >= 0
        nn2 = (nrm * nrm).sum(-1)
        interior = in_a & in_b & (nn2 > 0)
        nn = np.sqrt(nn2)
        nn = np.where(nn == 0, 1.0, nn)
        sin_d = np.clip(np.abs((x * nrm).sum(-1)) / nn, 0.0, 1.0)
        chord2_int = 2.0 * (1.0 - np.sqrt(1.0 - sin_d * sin_d))
        da = ((x - a) ** 2).sum(-1)
        db = ((x - b) ** 2).sum(-1)
        vals = np.where(interior, chord2_int, np.minimum(da, db))
        return np.minimum(vals, 4.0).min(axis=(1, 2))

    err = pred.MAX_DETERMINANT_ERROR

    def _sgn(det: np.ndarray) -> np.ndarray:
        return np.where(
            det > err, np.int8(1), np.where(det < -err, np.int8(-1), np.int8(0))
        )

    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        P = A[ai[lo:hi]]
        Q = B[bi[lo:hi]]
        la = lenA[ai[lo:hi]]
        lb = lenB[bi[lo:hi]]
        k = hi - lo

        # crossing pass FIRST (cheap: one normal per edge, four dets per
        # edge pair) — crossing pairs skip the heavier distance pass
        # entirely, which on dense workloads is most of them
        if sa > 0 and sb > 0:
            na = pred.cross(P[:, :-1, :], P[:, 1:, :])  # (k, sa, 3)
            nb = pred.cross(Q[:, :-1, :], Q[:, 1:, :])  # (k, sb, 3)
            acb = -_sgn(pred.dot(na[:, :, None, :], Q[:, None, :-1, :]))
            bda = _sgn(pred.dot(na[:, :, None, :], Q[:, None, 1:, :]))
            cbd = -_sgn(pred.dot(nb[:, None, :, :], P[:, 1:, None, :]))
            dac = _sgn(pred.dot(nb[:, None, :, :], P[:, :-1, None, :]))
            valid = (
                (np.arange(sa)[None, :, None] < (la - 1)[:, None, None])
                & (np.arange(sb)[None, None, :] < (lb - 1)[:, None, None])
            )
            certain = (acb != 0) & (bda != 0) & (cbd != 0) & (dac != 0)
            crossing = (
                valid & certain & (acb == bda) & (cbd == acb) & (dac == acb)
            )
            pair_cross = crossing.any(axis=(1, 2))
            uncertain = (valid & ~certain).any(axis=(1, 2)) & ~pair_cross
        else:
            pair_cross = np.zeros(k, dtype=bool)
            uncertain = np.zeros(k, dtype=bool)

        dist = np.zeros(k, dtype=np.float64)
        rest = np.nonzero(~pair_cross)[0]
        if len(rest):
            Pr, Qr = P[rest], Q[rest]
            dist[rest] = np.minimum(
                _verts_to_segs(Pr, Qr), _verts_to_segs(Qr, Pr)
            )
        for j in np.nonzero(uncertain)[0]:
            dist[j] = chain_pair_chord2(
                A[ai[lo + j]][: lenA[ai[lo + j]]],
                B[bi[lo + j]][: lenB[bi[lo + j]]],
            )
        out[lo:hi] = dist
    return out


def pad_chain_table(chains: list) -> tuple[np.ndarray, np.ndarray]:
    """List of (mi, 3) chains -> (padded (n, max_m, 3) table, lengths);
    padding repeats each chain's last vertex (see
    chain_pairs_chord2_indexed for why that is harmless)."""
    lens = np.array([len(c) for c in chains], dtype=np.int64)
    m = int(lens.max()) if len(lens) else 0
    T = np.empty((len(chains), m, 3), dtype=np.float64)
    for i, c in enumerate(chains):
        T[i, : len(c)] = c
        T[i, len(c):] = c[-1]
    return T, lens
