"""Point-in-polygon kernel: vectorized edge-crossing parity over S2 loops.

Semantics re-derived from the reference's brute-force containment
(s2/loop.go:587-598): starting from the fixed OriginPoint with the loop's
precomputed ``origin_inside`` bit, XOR EdgeOrVertexCrossing over the edge
chain origin->p vs every loop edge (s2/edge_crosser.go:37-228,
s2/edge_crossings.go:88-159).  The vectorized form computes the triage sign
matrix for ALL (point, vertex) pairs as one matrix product, resolves the
common same-side case wholesale, and runs the expensive cascade only on the
sparse residue — identical results to the sequential crosser because every
path bottoms out in the same exact predicates (see kernel/predicates.py).

Loop preparation (origin_inside, bound) follows s2/loop.go:125-216.
"""

from __future__ import annotations

import math

import numpy as np

from geo_spark.kernel import predicates as pred
from geo_spark.kernel.interval import PI, R1Interval, Rect, S1Interval

DBL_EPSILON = pred.DBL_EPSILON
# Tangent-test error bound, s2/edge_crosser.go:188.
MAX_TANGENT_ERROR = (1.5 + 1.0 / math.sqrt(3.0)) * DBL_EPSILON


def latlng_text_to_xyz(text: str) -> np.ndarray:
    """Parse the reference test grammar '"lat:lng, lat:lng"' (degrees) into
    unit xyz vertices; s2/textformat_test.go:27-60."""
    pts = []
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        lat_s, lng_s = tok.split(":")
        phi = math.radians(float(lat_s))
        theta = math.radians(float(lng_s))
        cosphi = math.cos(phi)
        pts.append(
            (math.cos(theta) * cosphi, math.sin(theta) * cosphi, math.sin(phi))
        )
    return np.array(pts, dtype=np.float64).reshape(-1, 3)


# ---------------------------------------------------------------------------
# Scalar slow-path crossing (rare residue only)
# ---------------------------------------------------------------------------


def _eq(p: np.ndarray, q: np.ndarray) -> bool:
    return p[0] == q[0] and p[1] == q[1] and p[2] == q[2]


def _robust_sign_scalar(a, b, c) -> int:
    s = int(pred.triage_sign(a[None, :], b[None, :], c[None, :])[0])
    if s == 0:
        s = pred.expensive_sign_scalar(a, b, c)
    return s


def _vertex_crossing(a, b, c, d) -> bool:
    """s2/edge_crossings.go:117-142."""
    if _eq(a, b) or _eq(c, d):
        return False
    if _eq(a, c):
        return _eq(b, d) or pred.ordered_ccw(pred.ortho(a), d, b, a)
    if _eq(b, d):
        return pred.ordered_ccw(pred.ortho(b), c, a, b)
    if _eq(a, d):
        return _eq(b, c) or pred.ordered_ccw(pred.ortho(a), c, b, a)
    if _eq(b, c):
        return pred.ordered_ccw(pred.ortho(b), d, a, b)
    return False


def _crossing_slow(a, b, c, d, acb: int, bda: int) -> bool:
    """Slow path of EdgeOrVertexCrossing given triage acb/bda states;
    s2/edge_crosser.go:165-228 + EdgeOrVertexChainCrossing."""
    # Outward tangent early-out for chains of nearly-collinear edges.
    norm = pred.point_cross(a, b)
    a_tan = pred.cross(a, norm)
    b_tan = pred.cross(norm, b)
    if (
        c @ a_tan > MAX_TANGENT_ERROR and d @ a_tan > MAX_TANGENT_ERROR
    ) or (c @ b_tan > MAX_TANGENT_ERROR and d @ b_tan > MAX_TANGENT_ERROR):
        return False  # DoNotCross

    if _eq(a, c) or _eq(a, d) or _eq(b, c) or _eq(b, d):
        return _vertex_crossing(a, b, c, d)  # MaybeCross
    if _eq(a, b) or _eq(c, d):
        return False

    if acb == 0:
        acb = -pred.expensive_sign_scalar(a, b, c)
    if bda == 0:
        bda = pred.expensive_sign_scalar(a, b, d)
    if bda != acb:
        return False
    cbd = -_robust_sign_scalar(c, d, b)
    if cbd != acb:
        return False
    dac = _robust_sign_scalar(c, d, a)
    return dac == acb


# ---------------------------------------------------------------------------
# Vectorized loop containment
# ---------------------------------------------------------------------------


# Point-chunk budget for the PIP sign matrix: keep the (chunk, M+1)
# float64 determinant block (plus its int8/bool shadows) cache-resident.
# Unchunked, a 200k-row Arrow batch against a 256-vertex loop streams
# ~600 MB of temporaries through DRAM per batch — on a bandwidth-walled
# host that serializes every core behind the memory bus (measured: the
# dense-PIP scaling row collapsed to ~0.3 efficiency while pure-compute
# kernels held 0.9).  ~0.5M f64 elements ≈ 4 MB keeps the whole working
# set in per-core cache; results are bitwise identical (no cross-row
# interaction).
_PIP_BLOCK_ELEMS = 1 << 19


def loop_contains_points(
    verts: np.ndarray, origin_inside: bool, pts: np.ndarray
) -> np.ndarray:
    """For each point (N,3), whether the loop (M,3 CCW vertices) contains it.

    Vectorization: with A = OriginPoint fixed and B = the query point, the
    chain state acb_i for loop vertex i is -triage_sign(A,B,V_i) — the whole
    (N, M+1) sign matrix is one GEMM on cross(A,B).  Edges where consecutive
    signs are equal and nonzero cannot cross (the crosser's fast path,
    s2/edge_crosser.go:128-139); the rest go through the scalar cascade.
    Points stream in cache-sized chunks (see _PIP_BLOCK_ELEMS)."""
    pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    n = len(pts)
    m = len(verts)
    chunk = max(1024, _PIP_BLOCK_ELEMS // max(m + 1, 1))
    if n > chunk:
        out = np.empty(n, dtype=bool)
        for s in range(0, n, chunk):
            out[s : s + chunk] = _loop_contains_points_block(
                verts, origin_inside, pts[s : s + chunk]
            )
        return out
    return _loop_contains_points_block(verts, origin_inside, pts)


def _loop_contains_points_block(
    verts: np.ndarray, origin_inside: bool, pts: np.ndarray
) -> np.ndarray:
    n = len(pts)
    m = len(verts)
    if m == 0:
        return np.zeros(n, dtype=bool)
    chain = np.vstack([verts, verts[:1]])  # closed: vertex 0 appended

    origin = pred.ORIGIN
    a_x_b = pred.cross(origin[None, :], pts)  # (N,3)
    dets = a_x_b @ chain.T  # (N, M+1)
    signs = np.where(
        dets > pred.MAX_DETERMINANT_ERROR,
        np.int8(1),
        np.where(dets < -pred.MAX_DETERMINANT_ERROR, np.int8(-1), np.int8(0)),
    )

    s_i = signs[:, :-1]
    s_j = signs[:, 1:]
    # Fast no-cross: same nonzero side (acb == -bda, bda != 0).
    candidate = ~((s_i == s_j) & (s_j != 0) & (s_i != 0))

    inside = np.full(n, bool(origin_inside))
    rows, edges = np.nonzero(candidate)
    if len(rows) == 0:
        return inside

    # Vectorized resolution of candidates whose triage signs are all
    # conclusive.  Any vertex-equality / degenerate case yields an exact-zero
    # determinant => triage 0 => routed to the scalar cascade, so the
    # vectorized branch never sees MaybeCross inputs.
    acb = -s_i[rows, edges]
    bda = s_j[rows, edges]
    B = pts[rows]
    C = chain[edges]
    D = chain[edges + 1]

    crossing = np.zeros(len(rows), dtype=bool)
    unresolved = (acb == 0) | (bda == 0)
    live = ~unresolved & (bda == acb)  # bda != acb => DoNotCross (resolved)

    if live.any():
        cbd = -pred.triage_sign(C[live], D[live], B[live])
        live_idx = np.nonzero(live)[0]
        zero_cbd = cbd == 0
        unresolved[live_idx[zero_cbd]] = True
        ok = ~zero_cbd & (cbd == acb[live_idx])
        # cbd != acb (nonzero) => DoNotCross
        if ok.any():
            sub = live_idx[ok]
            dac = pred.triage_sign(C[sub], D[sub], origin[None, :])
            zero_dac = dac == 0
            unresolved[sub[zero_dac]] = True
            crossing[sub[~zero_dac]] = dac[~zero_dac] == acb[sub[~zero_dac]]

    for k in np.nonzero(unresolved)[0]:
        crossing[k] = _crossing_slow(
            origin, B[k], C[k], D[k], int(acb[k]), int(bda[k])
        )

    flips = np.zeros(n, dtype=np.int64)
    np.add.at(flips, rows[crossing], 1)
    return inside ^ ((flips & 1) == 1)


def loop_origin_inside(verts: np.ndarray) -> bool:
    """Whether OriginPoint is inside the loop; s2/loop.go:125-162."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    if len(verts) < 3:
        if len(verts) == 1:
            # empty (z=+1) / full (z=-1) special loops, s2/loop.go:107-121
            return bool(verts[0][2] < 0)
        return False
    v1_inside = (
        not _eq(verts[0], verts[1])
        and not _eq(verts[2], verts[1])
        and pred.angle_contains_vertex(verts[0], verts[1], verts[2])
    )
    contains_v1 = bool(loop_contains_points(verts, False, verts[1][None, :])[0])
    return v1_inside != contains_v1


# ---------------------------------------------------------------------------
# RectBounder — conservative loop bounds (s2/rect_bounder.go:36-204)
# ---------------------------------------------------------------------------


def _latlng(p: np.ndarray) -> tuple[float, float]:
    lat = math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))
    lng = math.atan2(p[1], p[0])
    return lat, lng


def rect_bound_of_chain(verts: np.ndarray, closed: bool = True) -> Rect:
    """Bound of the edge chain, including edge latitude extrema;
    s2/rect_bounder.go:68-197.  ``closed=False`` skips the wrap-around
    edge (open polylines)."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    bound = Rect.empty()
    a = None
    a_ll = None
    for idx in range(len(verts) + (1 if closed else 0)):
        b = verts[idx % len(verts)]
        b_ll = _latlng(b)
        if bound.is_empty():
            a, a_ll = b, b_ll
            bound = bound.add_point(*b_ll)
            continue

        n = pred.cross(a - b, a + b)  # 2 * (A x B)
        n_norm = math.sqrt(n @ n)
        if n_norm < 1.91346e-15:
            # nearly identical or antipodal
            if a @ b < 0:
                bound = Rect.full()
            else:
                bound = bound.union(
                    Rect.from_latlng(*a_ll).add_point(*b_ll)
                )
            a, a_ll = b, b_ll
            continue

        lng_ab = S1Interval.empty().add_point(a_ll[1]).add_point(b_ll[1])
        if lng_ab.length() >= PI - 2 * DBL_EPSILON:
            lng_ab = S1Interval.full()

        lat_ab = R1Interval.from_point(a_ll[0]).add_point(b_ll[0])

        m = np.array([n[1], -n[0], 0.0])  # n x z
        m_a = m @ a
        m_b = m @ b
        m_error = 6.06638e-16 * n_norm + 6.83174e-31
        if m_a * m_b < 0 or abs(m_a) <= m_error or abs(m_b) <= m_error:
            max_lat = min(
                math.atan2(math.sqrt(n[0] * n[0] + n[1] * n[1]), abs(n[2]))
                + 3 * DBL_EPSILON,
                PI / 2,
            )
            d = a - b
            lat_budget = 2 * math.asin(
                min(1.0, 0.5 * math.sqrt(d @ d) * math.sin(max_lat))
            )
            max_delta = 0.5 * (lat_budget - lat_ab.length()) + DBL_EPSILON
            lo, hi = lat_ab.lo, lat_ab.hi
            if m_a <= m_error and m_b >= -m_error:
                hi = min(max_lat, hi + max_delta)
            if m_b <= m_error and m_a >= -m_error:
                lo = max(-max_lat, lo - max_delta)
            lat_ab = R1Interval(lo, hi)

        a, a_ll = b, b_ll
        bound = bound.union(Rect(lat_ab, lng_ab))
    # RectBound(): expand lat by 2 eps, polar closure
    bound = bound.expanded(2 * DBL_EPSILON, 0.0)
    return bound.polar_closure()


def loop_rect_bound(verts: np.ndarray, origin_inside: bool) -> Rect:
    """Full loop bound incl. pole-containment fixups; s2/loop.go:175-216."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    if len(verts) == 1:
        # empty or full special loops
        return Rect.full() if origin_inside else Rect.empty()
    b = rect_bound_of_chain(verts)
    north = np.array([0.0, 0.0, 1.0])
    if bool(loop_contains_points(verts, origin_inside, north[None, :])[0]):
        b = Rect(R1Interval(b.lat.lo, PI / 2), S1Interval.full())
    if b.lng.is_full():
        south = np.array([0.0, 0.0, -1.0])
        if bool(loop_contains_points(verts, origin_inside, south[None, :])[0]):
            b = Rect(R1Interval(-PI / 2, b.lat.hi), b.lng)
    return b


# ---------------------------------------------------------------------------
# Vertex models — s2/contains_point_query.go:23-40.
# ---------------------------------------------------------------------------

VERTEX_MODEL_OPEN = "open"
VERTEX_MODEL_SEMI_OPEN = "semi_open"
VERTEX_MODEL_CLOSED = "closed"


def point_on_chain(verts: np.ndarray, pts: np.ndarray, closed: bool = True) -> np.ndarray:
    """Whether each point lies ON the chain's boundary (a vertex or the
    interior of an edge).  Triage on the edge-plane determinant, exact
    collinearity + chord-betweenness on the residue."""
    pts = np.atleast_2d(np.asarray(pts, dtype=np.float64))
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    chain = np.vstack([verts, verts[:1]]) if closed else verts
    out = np.zeros(len(pts), dtype=bool)
    if len(chain) < 2:
        if len(chain) == 1:
            return (pts == chain[0]).all(axis=1)
        return out
    c = chain[:-1]
    d = chain[1:]
    n = np.cross(c, d)  # (M,3) edge planes
    dets = pts @ n.T  # (N,M)
    # |det| <= error -> possibly on the plane; exact check those pairs only
    near = np.abs(dets) <= 4 * pred.MAX_DETERMINANT_ERROR
    for i, j in zip(*np.nonzero(near)):
        p, a, b = pts[i], c[j], d[j]
        if _eq(p, a) or _eq(p, b):
            out[i] = True
            continue
        if pred.exact_sign_scalar(a, b, p, perturb=False) != 0:
            continue
        # collinear: on the minor arc iff between both endpoints chord-wise
        if (p - a) @ (b - a) >= 0 and (p - b) @ (a - b) >= 0:
            out[i] = True
    return out


def loop_contains_points_with_model(
    verts: np.ndarray,
    origin_inside: bool,
    pts: np.ndarray,
    model: str = VERTEX_MODEL_SEMI_OPEN,
) -> np.ndarray:
    """Loop containment under a vertex model: Open excludes the whole
    boundary, Closed includes it, SemiOpen is the crossing-parity default
    (s2/contains_point_query.go:23-40; boundary handling per the C++
    S2VertexModel contract)."""
    base = loop_contains_points(verts, origin_inside, pts)
    if model == VERTEX_MODEL_SEMI_OPEN:
        return base
    boundary = point_on_chain(verts, pts, closed=True)
    if model == VERTEX_MODEL_OPEN:
        return base & ~boundary
    if model == VERTEX_MODEL_CLOSED:
        return base | boundary
    raise ValueError(f"unknown vertex model {model!r}")
