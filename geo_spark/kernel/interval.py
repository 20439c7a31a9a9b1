"""1-D intervals and lat/lng rectangles (layer-prep plumbing, not hot path).

S1Interval: interval on the circle [-pi, pi] with wrap semantics
(reference: s1/interval.go).  R1Interval: plain real interval
(r1/interval.go).  Rect: lat x lng rectangle (s2/rect.go).  Used for
polygon bounds (RectBounder), coverer seeding, and cheap prefilters; the
join hot path uses only the resulting numeric columns.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

PI = math.pi
DBL_EPSILON = 2.220446049250313e-16


@dataclass(frozen=True)
class R1Interval:
    lo: float
    hi: float

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point(p: float) -> "R1Interval":
        return R1Interval(p, p)

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def length(self) -> float:
        return self.hi - self.lo

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval(p, p)
        return R1Interval(min(self.lo, p), max(self.hi, p))

    def union(self, o: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return o
        if o.is_empty():
            return self
        return R1Interval(min(self.lo, o.lo), max(self.hi, o.hi))

    def intersection(self, o: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, o.lo), min(self.hi, o.hi))

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def contains_interval(self, o: "R1Interval") -> bool:
        if o.is_empty():
            return True
        return self.lo <= o.lo and o.hi <= self.hi

    def intersects(self, o: "R1Interval") -> bool:
        if self.lo <= o.lo:
            return o.lo <= self.hi and o.lo <= o.hi
        return self.lo <= o.hi and self.lo <= self.hi

    def expanded(self, margin: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - margin, self.hi + margin)


def _positive_distance(a: float, b: float) -> float:
    d = b - a
    if d >= 0:
        return d
    return (b + PI) - (a - PI)


@dataclass(frozen=True)
class S1Interval:
    """Longitude interval with wrap; inverted (lo > hi) means it wraps
    through +-pi.  Semantics per s1/interval.go:50-304."""

    lo: float
    hi: float

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(PI, -PI)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-PI, PI)

    def is_empty(self) -> bool:
        return self.lo == PI and self.hi == -PI

    def is_full(self) -> bool:
        return self.lo == -PI and self.hi == PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def length(self) -> float:
        l = self.hi - self.lo
        if l >= 0:
            return l
        l += 2 * PI
        return l if l > 0 else -1.0

    def _fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        return self._fast_contains(p)

    def interior_contains(self, p: float) -> bool:
        if p == -PI:
            p = PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, o: "S1Interval") -> bool:
        if self.is_inverted():
            if o.is_inverted():
                return o.lo >= self.lo and o.hi <= self.hi
            return (o.lo >= self.lo or o.hi <= self.hi) and not self.is_empty()
        if o.is_inverted():
            return self.is_full() or o.is_empty()
        return o.lo >= self.lo and o.hi <= self.hi

    def intersects(self, o: "S1Interval") -> bool:
        if self.is_empty() or o.is_empty():
            return False
        if self.is_inverted():
            return o.is_inverted() or o.lo <= self.hi or o.hi >= self.lo
        if o.is_inverted():
            return o.lo <= self.hi or o.hi >= self.lo
        return o.lo <= self.hi and o.hi >= self.lo

    def add_point(self, p: float) -> "S1Interval":
        if abs(p) > PI:
            return self
        if p == -PI:
            p = PI
        if self._fast_contains(p):
            return self
        if self.is_empty():
            return S1Interval(p, p)
        if _positive_distance(p, self.lo) < _positive_distance(self.hi, p):
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def union(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return self
        if self._fast_contains(o.lo):
            if self._fast_contains(o.hi):
                if self.contains_interval(o):
                    return self
                return S1Interval.full()
            return S1Interval(self.lo, o.hi)
        if self._fast_contains(o.hi):
            return S1Interval(o.lo, self.hi)
        if self.is_empty() or o._fast_contains(self.lo):
            return o
        if _positive_distance(o.hi, self.lo) < _positive_distance(self.hi, o.lo):
            return S1Interval(o.lo, self.hi)
        return S1Interval(self.lo, o.hi)

    def intersection(self, o: "S1Interval") -> "S1Interval":
        if o.is_empty():
            return S1Interval.empty()
        if self._fast_contains(o.lo):
            if self._fast_contains(o.hi):
                # Reference tie rule (s1/interval.go:256-271) picks the shorter
                # interval; on a float-equal length tie it can return the
                # containing interval.  Strengthen with a containment check so
                # the result is always the smallest interval containing the
                # intersection even when lengths round equal.
                if o.length() < self.length() or (
                    o.length() == self.length() and self.contains_interval(o)
                ):
                    return o
                return self
            return S1Interval(o.lo, self.hi)
        if self._fast_contains(o.hi):
            return S1Interval(self.lo, o.hi)
        if o._fast_contains(self.lo):
            return self
        return S1Interval.empty()

    def expanded(self, margin: float) -> "S1Interval":
        if margin >= 0:
            if self.is_empty():
                return self
            if self.length() + 2 * margin + 2 * DBL_EPSILON >= 2 * PI:
                return S1Interval.full()
        else:
            if self.is_full():
                return self
            if self.length() + 2 * margin - 2 * DBL_EPSILON <= 0:
                return S1Interval.empty()
        lo = math.remainder(self.lo - margin, 2 * PI)
        hi = math.remainder(self.hi + margin, 2 * PI)
        if lo <= -PI:
            lo = PI
        return S1Interval(lo, hi)


@dataclass(frozen=True)
class Rect:
    """Latitude x longitude rectangle; s2/rect.go."""

    lat: R1Interval
    lng: S1Interval

    @staticmethod
    def empty() -> "Rect":
        return Rect(R1Interval.empty(), S1Interval.empty())

    @staticmethod
    def full() -> "Rect":
        return Rect(R1Interval(-PI / 2, PI / 2), S1Interval.full())

    @staticmethod
    def from_latlng(lat: float, lng: float) -> "Rect":
        return Rect(R1Interval(lat, lat), S1Interval(lng, lng))

    def is_empty(self) -> bool:
        return self.lat.is_empty()

    def is_full(self) -> bool:
        return (
            self.lat.lo == -PI / 2 and self.lat.hi == PI / 2 and self.lng.is_full()
        )

    def add_point(self, lat: float, lng: float) -> "Rect":
        if not (abs(lat) <= PI / 2 and abs(lng) <= PI):
            return self
        return Rect(self.lat.add_point(lat), self.lng.add_point(lng))

    def union(self, o: "Rect") -> "Rect":
        return Rect(self.lat.union(o.lat), self.lng.union(o.lng))

    def intersection(self, o: "Rect") -> "Rect":
        lat = self.lat.intersection(o.lat)
        lng = self.lng.intersection(o.lng)
        if lat.is_empty() or lng.is_empty():
            return Rect.empty()
        return Rect(lat, lng)

    def intersects(self, o: "Rect") -> bool:
        return self.lat.intersects(o.lat) and self.lng.intersects(o.lng)

    def contains_latlng(self, lat: float, lng: float) -> bool:
        if not (abs(lat) <= PI / 2 and abs(lng) <= PI):
            return False
        return self.lat.contains(lat) and self.lng.contains(lng)

    def contains_rect(self, o: "Rect") -> bool:
        return self.lat.contains_interval(o.lat) and self.lng.contains_interval(
            o.lng
        )

    def expanded(self, lat_margin: float, lng_margin: float) -> "Rect":
        lat = self.lat.expanded(lat_margin)
        lng = self.lng.expanded(lng_margin)
        if lat.is_empty() or lng.is_empty():
            return Rect.empty()
        return Rect(lat.intersection(R1Interval(-PI / 2, PI / 2)), lng)

    def polar_closure(self) -> "Rect":
        if self.lat.lo == -PI / 2 or self.lat.hi == PI / 2:
            return Rect(self.lat, S1Interval.full())
        return self


def rect_centroid(rect: Rect) -> "tuple[float, float, float]":
    """True (area-weighted, unnormalized) centroid of the rect's surface
    patch; s2/rect.go:~650-683.  Derived analytically: with dA =
    cos(lat) dlat dlng over [lat_lo, lat_hi] x the lng interval,
      integral z dA = dlng * (sin^2 hi - sin^2 lo) / 2,
      integral x dA = alpha * (sin t2 - sin t1),
      integral y dA = alpha * (cos t1 - cos t2),
    with alpha = (lat + sin*cos)/2 evaluated over the lat span."""
    import math as _m

    if rect.is_empty():
        return (0.0, 0.0, 0.0)
    lo, hi = rect.lat.lo, rect.lat.hi
    dlng = rect.lng.length()
    z = dlng * (_m.sin(hi) ** 2 - _m.sin(lo) ** 2) / 2.0
    alpha = (
        (hi + _m.sin(hi) * _m.cos(hi)) - (lo + _m.sin(lo) * _m.cos(lo))
    ) / 2.0
    # lng interval [t1, t2] in its wrapped parametrization
    t1 = rect.lng.lo
    t2 = rect.lng.lo + dlng
    x = alpha * (_m.sin(t2) - _m.sin(t1))
    y = alpha * (_m.cos(t1) - _m.cos(t2))
    return (x, y, z)


def rect_distance_to_latlng(rect: Rect, lat: float, lng: float) -> float:
    """Min angular distance from a point to the rect (0 when inside);
    s2/rect.go:~475-520 semantics.  Nearest boundary point is either due
    north/south along the point's meridian (when the point's longitude
    lies inside the rect's interval) or on one of the two meridian edge
    segments — parallels' interiors are never nearest for an outside
    longitude (distance decreases monotonically toward the corner)."""
    import math as _m

    import numpy as np

    from geo_spark.kernel import cellid as _ck
    from geo_spark.kernel import edges as _E

    if rect.is_empty():
        return _m.inf
    if rect.contains_latlng(lat, lng):
        return 0.0
    if rect.lng.contains(lng):
        if lat > rect.lat.hi:
            return lat - rect.lat.hi
        return rect.lat.lo - lat
    x, y, z = _ck.latlng_to_xyz(np.float64(_m.degrees(lat)), np.float64(_m.degrees(lng)))
    p = np.array([float(x), float(y), float(z)])
    best = _m.pi
    for edge_lng in (rect.lng.lo, rect.lng.hi):
        ax, ay, az = _ck.latlng_to_xyz(
            np.float64(_m.degrees(rect.lat.lo)), np.float64(_m.degrees(edge_lng))
        )
        bx, by, bz = _ck.latlng_to_xyz(
            np.float64(_m.degrees(rect.lat.hi)), np.float64(_m.degrees(edge_lng))
        )
        a = np.array([float(ax), float(ay), float(az)])
        b = np.array([float(bx), float(by), float(bz)])
        c2 = float(_E.point_segment_chord2(p[None, :], a[None, :], b[None, :])[0])
        best = min(best, 2.0 * _m.asin(0.5 * _m.sqrt(min(4.0, c2))))
    return best


def rect_distance_to_latlngs(rect: Rect, lat_deg, lng_deg):
    """Vectorized ``rect_distance_to_latlng`` over degree arrays ->
    radians array (0 inside).  Same reduction: latitude gap when the
    point's longitude is inside the rect's interval, else min distance
    to the two meridian edge segments."""
    import numpy as np

    from geo_spark.kernel import cellid as _ck
    from geo_spark.kernel import edges as _E

    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    n = len(lat)
    out = np.zeros(n, dtype=np.float64)
    if rect.is_empty():
        out[:] = np.inf
        return out

    lng_in = np.array([rect.lng.contains(float(v)) for v in lng])
    above = lat > rect.lat.hi
    below = lat < rect.lat.lo
    # longitude inside: pure latitude gap (0 if inside the rect)
    out[lng_in & above] = (lat - rect.lat.hi)[lng_in & above]
    out[lng_in & below] = (rect.lat.lo - lat)[lng_in & below]

    outside = ~lng_in
    if outside.any():
        x, y, z = _ck.latlng_to_xyz(
            np.degrees(lat[outside]), np.degrees(lng[outside])
        )
        p = np.stack([x, y, z], axis=1)
        best = np.full(len(p), 4.0)
        for edge_lng in (rect.lng.lo, rect.lng.hi):
            ax, ay, az = _ck.latlng_to_xyz(
                np.degrees(rect.lat.lo), np.degrees(edge_lng)
            )
            bx, by, bz = _ck.latlng_to_xyz(
                np.degrees(rect.lat.hi), np.degrees(edge_lng)
            )
            a = np.array([float(ax), float(ay), float(az)])
            b = np.array([float(bx), float(by), float(bz)])
            best = np.minimum(
                best,
                _E.point_segment_chord2(
                    p, np.broadcast_to(a, p.shape), np.broadcast_to(b, p.shape)
                ),
            )
        out[outside] = 2.0 * np.arcsin(0.5 * np.sqrt(np.minimum(4.0, best)))
    return out


# ---------------------------------------------------------------------------
# Hausdorff distances between rects (s2/rect.go:494-646).


def _s1_center(i: S1Interval) -> float:
    """Center of a circular interval (s1/interval.go Center)."""
    c = 0.5 * (i.lo + i.hi)
    if not i.is_inverted():
        return c
    return c + PI if c <= 0 else c - PI


def _s1_complement_center(i: S1Interval) -> float:
    """Center of the complement interval; for a singleton, the antipodal
    point (s1/interval.go:405-414)."""
    if i.lo != i.hi:
        return _s1_center(S1Interval(i.hi, i.lo))
    return i.hi + PI if i.hi <= 0 else i.hi - PI


def r1_directed_hausdorff(a: R1Interval, b: R1Interval) -> float:
    """h(a,b) = max_{p in a} min_{q in b} |p-q| on the line
    (r1/interval.go:166-178)."""
    if a.is_empty():
        return 0.0
    if b.is_empty():
        return float("inf")
    return max(0.0, a.hi - b.hi, b.lo - a.lo)


def s1_directed_hausdorff(i: S1Interval, y: S1Interval) -> float:
    """h(i,y) measured along the circle (s1/interval.go:416-447): zero
    when contained; otherwise realized at one of i's endpoints, or at the
    center of y's complement when i spans it."""
    if y.contains_interval(i):
        return 0.0
    if y.is_empty():
        return PI
    y_comp_center = _s1_complement_center(y)
    if i.contains(y_comp_center):
        return _positive_distance(y.hi, y_comp_center)
    hi_hi = 0.0
    if S1Interval(y.hi, y_comp_center).contains(i.hi):
        hi_hi = _positive_distance(y.hi, i.hi)
    lo_lo = 0.0
    if S1Interval(y_comp_center, y.lo).contains(i.lo):
        lo_lo = _positive_distance(i.lo, y.lo)
    return max(hi_hi, lo_lo)


def _ll_xyz(lat: float, lng: float):
    """Unit xyz from radians lat/lng (local scalar helper)."""
    import math as _m

    import numpy as np

    cl = _m.cos(lat)
    return np.array([cl * _m.cos(lng), cl * _m.sin(lng), _m.sin(lat)])


def _segment_distance(p, a, b) -> float:
    """Angular point-to-geodesic-segment distance."""
    import math as _m

    from geo_spark.kernel import edges as _E

    c2 = float(_E.point_segment_chord2(p[None, :], a[None, :], b[None, :])[0])
    return 2.0 * _m.asin(0.5 * _m.sqrt(min(4.0, c2)))


def _interior_max_distance(a_lat: R1Interval, b) -> float | None:
    """Max distance from point ``b`` to the longitude-0 meridian segment
    spanning ``a_lat``, when the max lies in the segment interior
    (s2/rect.go:615-632); None otherwise."""
    import math as _m

    import numpy as np

    if a_lat.is_empty() or b[0] >= 0:
        return None
    # the farthest point on the full meridian from b is the antipode of
    # b's projection onto the y=0 plane
    proj = np.array([-b[0], 0.0, -b[2]])
    proj = proj / np.linalg.norm(proj)
    lat = _m.asin(max(-1.0, min(1.0, proj[2])))
    if not (a_lat.lo < lat < a_lat.hi):
        return None
    d = float(np.clip(b @ proj, -1.0, 1.0))
    return _m.acos(d)


def _bisector_intersection(lat: R1Interval, lng: float):
    """Intersection of longitude 0 with the perpendicular bisector of the
    meridian edge at longitude ``lng`` spanning ``lat``
    (s2/rect.go:634-646)."""
    import math as _m

    import numpy as np

    from geo_spark.kernel.predicates import point_cross

    lng = abs(lng)
    lat_center = 0.5 * (lat.lo + lat.hi)
    if lat_center >= 0:
        ortho_bisector = _ll_xyz(lat_center - PI / 2, lng)
    else:
        ortho_bisector = _ll_xyz(-lat_center - PI / 2, lng - PI)
    ortho_lng = np.array([0.0, -1.0, 0.0])
    p = point_cross(ortho_lng[None, :], ortho_bisector[None, :])[0]
    return p / np.linalg.norm(p)


def _directed_hausdorff_lat_edges(lng_diff: float, a: R1Interval, b: R1Interval) -> float:
    """Directed Hausdorff from the meridian edge spanning latitudes ``a``
    (at longitude 0) to the meridian edge spanning ``b`` (at longitude
    ``lng_diff``); the Voronoi case analysis of s2/rect.go:527-613."""
    import math as _m

    import numpy as np

    if lng_diff < 0 or lng_diff > PI:
        raise ValueError("lng_diff out of range")
    if lng_diff == 0:
        return r1_directed_hausdorff(a, b)

    b_lo = _ll_xyz(b.lo, lng_diff)
    b_hi = _ll_xyz(b.hi, lng_diff)
    a_lo = _ll_xyz(a.lo, 0.0)
    a_hi = _ll_xyz(a.hi, 0.0)
    max_distance = max(
        _segment_distance(a_lo, b_lo, b_hi), _segment_distance(a_hi, b_lo, b_hi)
    )

    if lng_diff <= PI / 2:
        if a.contains(0.0) and b.contains(0.0):
            max_distance = max(max_distance, lng_diff)
        return max_distance

    p = _bisector_intersection(b, lng_diff)
    p_lat = _m.asin(max(-1.0, min(1.0, p[2])))
    if a.contains(p_lat):
        max_distance = max(max_distance, _m.acos(float(np.clip(p @ b_lo, -1, 1))))

    if p_lat > a.lo:
        d = _interior_max_distance(R1Interval(a.lo, min(p_lat, a.hi)), b_lo)
        if d is not None:
            max_distance = max(max_distance, d)
    if p_lat < a.hi:
        d = _interior_max_distance(R1Interval(max(p_lat, a.lo), a.hi), b_hi)
        if d is not None:
            max_distance = max(max_distance, d)
    return max_distance


def rect_directed_hausdorff(a: Rect, b: Rect) -> float:
    """Directed Hausdorff distance h(A,B) = max_{p in A} min_{q in B}
    d(p,q) along the sphere (s2/rect.go:494-507)."""
    if a.is_empty():
        return 0.0
    if b.is_empty():
        return PI
    lng = s1_directed_hausdorff(a.lng, b.lng)
    return _directed_hausdorff_lat_edges(lng, a.lat, b.lat)


def rect_hausdorff(a: Rect, b: Rect) -> float:
    """Undirected Hausdorff distance H(A,B) = max(h(A,B), h(B,A))
    (s2/rect.go:509-516)."""
    return max(rect_directed_hausdorff(a, b), rect_directed_hausdorff(b, a))
