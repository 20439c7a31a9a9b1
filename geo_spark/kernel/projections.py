"""Map projections: Plate Carree and spherical (Web) Mercator.

Reference: s2/projections.go (PlateCarreeProjection :95-145,
MercatorProjection :146-230, wrapDestination :232-247).  Vectorized
numpy over radian lat/lng arrays; the Mercator "y" uses the
0.5*log((1+sin)/(1-sin)) form (more accurate near zero than
log(tan()), per the reference comment at s2/projections.go:190) and
the inverse uses asin((k-1)/(k+1)) with the documented +-inf -> +-pi/2
guard (s2/projections.go:199-210).

Poles project to y = +-inf under Mercator (by design, matching the
reference); callers tessellating Mercator edges must clip poles first
(s2/projections.go:158-161 warning).

One deliberate difference: the reference's coordinate wrapping uses
IEEE-754 remainder (math.Remainder, round-half-to-even quotient); the
vectorized form here is ``x - rint(x/w)*w`` which agrees everywhere
except when ``x/w`` sits exactly halfway between integers AND the
division itself rounded — unreachable for the finite coordinate
streams these kernels serve.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "PlateCarreeProjection",
    "MercatorProjection",
    "interpolate_xy",
    "wrap_destination",
    "tessellate_projected_in",
    "rhumb_distance_bearing",
]


def _ieee_remainder(x: np.ndarray, w: float) -> np.ndarray:
    # np.rint rounds half to even, matching math.Remainder's quotient
    # rounding (see module docstring for the edge-case caveat).
    return x - np.rint(x / w) * w


class PlateCarreeProjection:
    """x = lng, y = lat, scaled so lng spans [-x_scale, x_scale]
    (s2/projections.go:95-145)."""

    def __init__(self, x_scale: float = 180.0):
        self.x_scale = float(x_scale)
        self.x_wrap = 2.0 * self.x_scale
        self.to_radians = np.pi / self.x_scale
        self.from_radians = self.x_scale / np.pi

    def project(
        self, lat_rad: np.ndarray, lng_rad: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        lat = np.asarray(lat_rad, dtype=np.float64)
        lng = np.asarray(lng_rad, dtype=np.float64)
        return self.from_radians * lng, self.from_radians * lat

    def unproject(
        self, x: np.ndarray, y: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(lat_rad, lng_rad); x wraps, lat clamps to +-pi/2
        (s2/projections.go:122-130)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lng = self.to_radians * _ieee_remainder(x, self.x_wrap)
        lat = np.clip(self.to_radians * y, -0.5 * np.pi, 0.5 * np.pi)
        return lat, lng

    def wrap_distance(self) -> tuple[float, float]:
        return self.x_wrap, 0.0


class MercatorProjection:
    """Spherical Mercator: x = lng over [-max_lng, max_lng], y =
    0.5*log((1+sin lat)/(1-sin lat)) scaled equally; poles at y =
    +-inf (s2/projections.go:146-230).  max_lng = 180 with WGS84
    coordinates is the "Web Mercator" of online map tiling."""

    def __init__(self, max_lng: float = 180.0):
        self.max_lng = float(max_lng)
        self.x_wrap = 2.0 * self.max_lng
        self.to_radians = np.pi / self.max_lng
        self.from_radians = self.max_lng / np.pi

    def project(
        self, lat_rad: np.ndarray, lng_rad: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.project_sinlat(
            np.sin(np.asarray(lat_rad, dtype=np.float64)), lng_rad
        )

    def project_sinlat(
        self, sin_lat: np.ndarray, lng_rad: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Same, but from sin(lat) directly — lets pure-arithmetic
        fixture streams (SINLAT_SQL) skip the trig call entirely, so a
        SQL oracle can replay the whole chain with ln() alone."""
        s = np.asarray(sin_lat, dtype=np.float64)
        lng = np.asarray(lng_rad, dtype=np.float64)
        with np.errstate(divide="ignore"):
            y = 0.5 * np.log((1.0 + s) / (1.0 - s))
        return self.from_radians * lng, self.from_radians * y

    def unproject(
        self, x: np.ndarray, y: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(lat_rad, lng_rad) (s2/projections.go:197-210)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lng = self.to_radians * _ieee_remainder(x, self.x_wrap)
        with np.errstate(over="ignore", invalid="ignore"):
            k = np.exp(2.0 * self.to_radians * y)
            ratio = np.where(np.isinf(k), 1.0, (k - 1.0) / (k + 1.0))
        lat = np.arcsin(np.clip(ratio, -1.0, 1.0))
        return lat, lng

    def wrap_distance(self) -> tuple[float, float]:
        return self.x_wrap, 0.0


def tessellate_projected_in(
    projection,
    a_xyz: np.ndarray,
    b_xyz: np.ndarray,
    tolerance_rad: float,
    max_depth: int = 30,
) -> np.ndarray:
    """Projection-parameterized AppendProjected
    (s2/edge_tessellator.go:187-240 generalized beyond the plate
    carree special case in kernel/edges.py): (k, 2) projected vertices
    whose straight segments stay within ``tolerance_rad`` of the
    geodesic a->b under ``projection`` (PlateCarreeProjection or
    MercatorProjection).  The b endpoint is wrapped the short way in x
    first (WrapDestination semantics).  Mercator callers must clip
    pole-adjacent edges beforehand (s2/projections.go:158-161
    warning — poles project to infinite y)."""
    import math

    def _latlng(p):
        return (
            math.atan2(p[2], math.hypot(p[0], p[1])),
            math.atan2(p[1], p[0]),
        )

    def _xyz(lat, lng):
        cl = math.cos(lat)
        return np.array(
            [cl * math.cos(lng), cl * math.sin(lng), math.sin(lat)]
        )

    a3 = np.asarray(a_xyz, dtype=np.float64)
    b3 = np.asarray(b_xyz, dtype=np.float64)
    la, lna = _latlng(a3)
    lb, lnb = _latlng(b3)
    ax, ay = projection.project(np.array([la]), np.array([lna]))
    bx, by = projection.project(np.array([lb]), np.array([lnb]))
    wrap_x, wrap_y = projection.wrap_distance()
    bxw, byw = wrap_destination(ax, ay, bx, by, wrap_x, wrap_y)
    tol_chord2 = (2.0 * math.sin(tolerance_rad / 2.0)) ** 2
    out = [(float(ax[0]), float(ay[0]))]

    def _proj_near(p3, near_x, near_y):
        """Project p3, wrapped toward an already-emitted neighbor."""
        pl, pg = _latlng(p3)
        x, y = projection.project(np.array([pl]), np.array([pg]))
        x, y = wrap_destination(
            np.array([near_x]), np.array([near_y]), x, y, wrap_x, wrap_y
        )
        return float(x[0]), float(y[0])

    def rec(p3, px, py, q3, qx, qy, depth):
        # split at the GEODESIC midpoint (vertices stay on the
        # geodesic, as AppendProjected emits projections of geodesic
        # points); accept when the unprojected midpoint of the
        # projected segment sits within tolerance of it
        gm = p3 + q3
        gm = gm / math.sqrt(gm @ gm)
        mx, my = 0.5 * (px + qx), 0.5 * (py + qy)
        ml, mg = projection.unproject(np.array([mx]), np.array([my]))
        pm = _xyz(float(ml[0]), float(mg[0]))
        err2 = float(((gm - pm) ** 2).sum())
        if depth >= max_depth or err2 <= tol_chord2:
            out.append((float(qx), float(qy)))
            return
        gx, gy = _proj_near(gm, px, py)
        rec(p3, px, py, gm, gx, gy, depth + 1)
        rec(gm, gx, gy, q3, qx, qy, depth + 1)

    rec(
        a3,
        float(ax[0]),
        float(ay[0]),
        b3,
        float(bxw[0]),
        float(byw[0]),
        0,
    )
    return np.array(out)


def rhumb_distance_bearing(
    lat1_deg: np.ndarray,
    lng1_deg: np.ndarray,
    lat2_deg: np.ndarray,
    lng2_deg: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """(dist_rad, bearing_rad): loxodrome (constant-bearing) distance
    and initial bearing — the straight line in Mercator space
    (MercatorProjection semantics; a navigation op the reference's
    geodesic family does not carry).

    dist = sqrt(dphi^2 + q^2 * dlam^2) with the Mercator stretch
    q = dphi / dpsi (cos(phi1) in the dphi->0 limit), dlam wrapped the
    short way; bearing = atan2(dlam, dpsi).  The wrap uses the
    floor-form ``d - floor(d/2pi + 0.5)*2pi`` so a SQL twin replays it
    with identical rounding (floor is exact in both engines; the
    rint-based wrap in wrap_destination differs only exactly at
    half-turn ties)."""
    phi1 = np.radians(np.asarray(lat1_deg, dtype=np.float64))
    phi2 = np.radians(np.asarray(lat2_deg, dtype=np.float64))
    lam1 = np.radians(np.asarray(lng1_deg, dtype=np.float64))
    lam2 = np.radians(np.asarray(lng2_deg, dtype=np.float64))
    dphi = phi2 - phi1
    with np.errstate(divide="ignore", invalid="ignore"):
        psi1 = 0.5 * np.log((1.0 + np.sin(phi1)) / (1.0 - np.sin(phi1)))
        psi2 = 0.5 * np.log((1.0 + np.sin(phi2)) / (1.0 - np.sin(phi2)))
    dpsi = psi2 - psi1
    q = np.where(np.abs(dpsi) > 1e-12, dphi / np.where(dpsi == 0, 1.0, dpsi),
                 np.cos(phi1))
    d = lam2 - lam1
    dlam = d - np.floor(d / (2.0 * np.pi) + 0.5) * (2.0 * np.pi)
    dist = np.sqrt(dphi * dphi + q * q * dlam * dlam)
    bearing = np.arctan2(dlam, dpsi)
    return dist, bearing


def interpolate_xy(
    f: float,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """a*(1-f) + b*f per axis — exact at f=0 and f=1
    (s2/projections.go:131-135,211-214: both projections interpolate
    linearly in projected space)."""
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    return ax * (1.0 - f) + bx * f, ay * (1.0 - f) + by * f


def wrap_destination(
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    wrap_x: float,
    wrap_y: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Wrap b per axis so the edge a->b is the short way around
    (s2/projections.go:232-247): b moves by a multiple of the wrap
    distance only when |b - a| exceeds half of it."""
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    x = np.asarray(bx, dtype=np.float64).copy()
    y = np.asarray(by, dtype=np.float64).copy()
    if wrap_x > 0:
        far = np.abs(x - ax) > 0.5 * wrap_x
        x = np.where(far, ax + _ieee_remainder(x - ax, wrap_x), x)
    if wrap_y > 0:
        far = np.abs(y - ay) > 0.5 * wrap_y
        y = np.where(far, ay + _ieee_remainder(y - ay, wrap_y), y)
    return x, y
