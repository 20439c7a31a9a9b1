"""Geometric measures: areas, centroids, lengths.

Re-derived from s2/point_measures.go:33-147 (l'Huilier triangle area with
the Girard fallback for large triangles), s2/centroids.go:61-143
(TrueCentroid), s2/loop.go:1136-1260 (loop area/centroid via a triangle
fan of signed contributions), s2/polyline_measures.go:28-63, and
s2/cell.go:260-295 (cell areas).  Aggregation across loops of a polygon
or edges of a polyline happens in Spark (groupBy sum) — these kernels
produce the per-piece values.
"""

from __future__ import annotations

import math

import numpy as np

from geo_spark.kernel import predicates as pred

FOUR_PI = 4 * math.pi


def angle(a: np.ndarray, b: np.ndarray) -> float:
    """Angle between unit vectors via atan2(|axb|, a.b) — accurate for
    both small and near-pi angles (r3/vector.go Angle)."""
    c = np.cross(a, b)
    return math.atan2(math.sqrt(float(c @ c)), float(a @ b))


def girard_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Girard spherical excess via PointCross angles; s2/point_measures.go:83-103."""
    ab = pred.point_cross(a, b)
    bc = pred.point_cross(b, c)
    ac = pred.point_cross(a, c)
    ab /= math.sqrt(ab @ ab)
    bc /= math.sqrt(bc @ bc)
    ac /= math.sqrt(ac @ ac)
    area = angle(ab, ac) - angle(ab, bc) + angle(bc, ac)
    return max(0.0, area)


def point_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Triangle area, l'Huilier with Girard fallback; s2/point_measures.go:33-81."""
    sa = angle(b, c)
    sb = angle(c, a)
    sc = angle(a, b)
    s = 0.5 * (sa + sb + sc)
    if s >= 3e-4:
        s2 = s * s
        dmin = s - max(sa, sb, sc)
        if dmin < 1e-2 * s * s2 * s2:
            area = girard_area(a, b, c)
            if dmin < s * 0.1 * area:
                return area
    t = (
        math.tan(0.5 * s)
        * math.tan(0.5 * (s - sa))
        * math.tan(0.5 * (s - sb))
        * math.tan(0.5 * (s - sc))
    )
    return 4 * math.atan(math.sqrt(max(0.0, t)))


def signed_area(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Area with CCW sign; s2/point_measures.go:105-112."""
    return float(pred.robust_sign(a, b, c)[0]) * point_area(a, b, c)


def true_centroid(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Area-weighted (non-normalized) triangle centroid; s2/centroids.go:79-109."""
    ra = rb = rc = 1.0
    sa = angle(b, c)
    if sa != 0:
        ra = sa / math.sin(sa)
    sb = angle(c, a)
    if sb != 0:
        rb = sb / math.sin(sb)
    sc = angle(a, b)
    if sc != 0:
        rc = sc / math.sin(sc)
    x = np.array([a[0], b[0], c[0]])
    y = np.array([a[1], b[1], c[1]])
    z = np.array([a[2], b[2], c[2]])
    r = np.array([ra, rb, rc])
    return 0.5 * np.array(
        [
            float(np.cross(y, z) @ r),
            float(np.cross(z, x) @ r),
            float(np.cross(x, y) @ r),
        ]
    )


def loop_signed_area_fan(verts: np.ndarray) -> float:
    """Signed area of the loop as a triangle fan anchored at vertex 0
    (the surface-integral decomposition of s2/loop.go:1014-1101; anchor
    re-selection for antipodal fans is unnecessary for valid loops whose
    vertices stay within a hemisphere of v0 — asserted by callers)."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    if len(verts) < 3:
        return 0.0
    total = 0.0
    for i in range(1, len(verts) - 1):
        total += signed_area(verts[0], verts[i], verts[i + 1])
    return total


def loop_area(verts: np.ndarray, origin_inside: bool | None = None) -> float:
    """Loop interior area in [0, 4*pi]; canonicalization per
    s2/loop.go:1136-1180 (negative fan => complement was measured)."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    if len(verts) == 1:
        # empty/full specials (s2/loop.go:107-121)
        return FOUR_PI if verts[0][2] < 0 else 0.0
    area = loop_signed_area_fan(verts)
    if area < 0:
        area += FOUR_PI
    return min(FOUR_PI, max(0.0, area))


def loop_centroid(verts: np.ndarray) -> np.ndarray:
    """Area-weighted (non-normalized) loop centroid; s2/loop.go:1253-1260."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    out = np.zeros(3)
    # true_centroid is antisymmetric in (b,c), so fan orientation carries
    # the sign — no explicit robust_sign needed.
    for i in range(1, len(verts) - 1):
        out += true_centroid(verts[0], verts[i], verts[i + 1])
    return out


def polyline_length(verts: np.ndarray) -> float:
    """Sum of edge angles; s2/polyline_measures.go:28-36."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    return sum(angle(verts[i], verts[i + 1]) for i in range(len(verts) - 1))


def edge_true_centroid(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Length-weighted edge centroid: direction (a+b)/|a+b| scaled by
    |a-b| = 2 sin(theta/2); s2/centroids.go:124-143."""
    v_sum = a + b
    v_diff = a - b
    n2 = float(v_sum @ v_sum)
    if n2 == 0:
        return np.zeros(3)
    return v_sum * math.sqrt(float(v_diff @ v_diff) / n2)


def polyline_centroid(verts: np.ndarray) -> np.ndarray:
    """s2/polyline_measures.go:44-63."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    out = np.zeros(3)
    for i in range(len(verts) - 1):
        out += edge_true_centroid(verts[i], verts[i + 1])
    return out


def cell_exact_area(cid: int) -> float:
    """Two-triangle exact cell area; s2/cell.go:284-289."""
    from geo_spark.kernel.cell import Cell

    cell = Cell.from_id(cid)
    v = cell.vertices()
    return point_area(v[0], v[1], v[2]) + point_area(v[0], v[2], v[3])


def cell_average_area(level: int) -> float:
    """AvgAreaMetric value; s2/cell.go:291-295."""
    from geo_spark.kernel import metric

    return metric.AVG_AREA.value(level)


def turn_angle(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> float:
    """Exterior angle at b of the chain a->b->c, positive for a left
    turn; s2/point_measures.go:131-147 (sign via RobustSign so collinear
    chains are handled deterministically)."""
    from geo_spark.kernel import predicates as pred

    ang = angle(np.cross(a, b), np.cross(b, c))
    s = float(pred.robust_sign(a[None, :], b[None, :], c[None, :])[0])
    return s * ang if s != 0 else ang


def loop_turning_angle(verts: np.ndarray, origin_inside: bool | None = None) -> float:
    """Sum of turning angles (Kahan-compensated); 2*pi for a tiny CCW
    loop, -2*pi for CW, +-4*pi degenerate convention for empty/full
    loops; s2/loop.go:792-838."""
    verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
    n = len(verts)
    if n < 3:
        if origin_inside is None and n == 1:
            origin_inside = bool(verts[0][2] < 0)
        return -4 * math.pi if origin_inside else 4 * math.pi
    total = 0.0
    comp = 0.0  # Kahan compensation, per the reference's error control
    for i in range(n):
        a = verts[(i - 1) % n]
        b = verts[i]
        c = verts[(i + 1) % n]
        t = turn_angle(a, b, c)
        y = t - comp
        s = total + y
        comp = (s - total) - y
        total = s
    # clamp to the legal range, s2/loop.go:836
    return max(-4 * math.pi, min(4 * math.pi, total))


def loop_is_normalized(verts: np.ndarray, origin_inside: bool | None = None) -> bool:
    """A loop is normalized when its area is at most 2*pi (interior no
    larger than the exterior), equivalently TurningAngle >= 0;
    s2/loop.go:867-881."""
    return loop_turning_angle(verts, origin_inside) >= -1e-14


def haversine_distance(lat1, lng1, lat2, lng2) -> np.ndarray:
    """Angular distance (radians) between degree lat/lng pairs via the
    haversin form — numerically accurate for small distances;
    s2/latlng.go:61-69.  Vectorized over arrays."""
    la1, ln1, la2, ln2 = (
        np.radians(np.asarray(v, dtype=np.float64))
        for v in (lat1, lng1, lat2, lng2)
    )
    dlat = np.sin(0.5 * (la2 - la1))
    dlng = np.sin(0.5 * (ln2 - ln1))
    x = dlat * dlat + dlng * dlng * np.cos(la1) * np.cos(la2)
    return 2 * np.arcsin(np.sqrt(np.minimum(1.0, x)))
