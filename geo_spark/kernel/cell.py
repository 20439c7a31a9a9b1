"""Cell geometry derived on the fly from a cell id (never stored).

Re-derivation of the reference's ``Cell`` value type (s2/cell.go:50-258):
uv bounds via ijLevelToBoundUV (s2/cellid.go:654-671), vertices/edge
normals via the face (u,v,w) frames (s2/stuv.go:369-450), point
containment with the epsilon margin of s2/cell.go:466-495, and the exact
RectBound of s2/cell.go:114-149 (vertex-pair extrema + face-cell
specials) — needed so region predicates stay *conservative* (bound always
a superset of the cell).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.interval import PI, DBL_EPSILON, R1Interval, Rect, S1Interval

PI_2 = PI / 2
PI_4 = PI / 4
# Face cells 2/5 extend past the pole-adjacent latitude; s2/cell.go:40.
POLE_MIN_LAT = math.asin(math.sqrt(1.0 / 3.0)) - 0.5 * DBL_EPSILON

# Face (u,v,w) axes, s2/stuv.go:417-450: AXES[face] = (uAxis, vAxis, wAxis).
_FACE_UVW_AXES = np.array(
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


def u_axis(face: int) -> np.ndarray:
    return _FACE_UVW_AXES[face][0]


def v_axis(face: int) -> np.ndarray:
    return _FACE_UVW_AXES[face][1]


def u_norm(face: int, u: float) -> np.ndarray:
    """Outward normal of the plane through the u-line; s2/stuv.go:369-387."""
    return (
        np.array([u, -1.0, 0.0]),
        np.array([1.0, u, 0.0]),
        np.array([1.0, 0.0, u]),
        np.array([-u, 0.0, 1.0]),
        np.array([0.0, -u, 1.0]),
        np.array([0.0, -1.0, -u]),
    )[face]


def v_norm(face: int, v: float) -> np.ndarray:
    """Outward normal of the plane through the v-line; s2/stuv.go:393-411."""
    return (
        np.array([-v, 0.0, 1.0]),
        np.array([0.0, -v, 1.0]),
        np.array([0.0, -1.0, -v]),
        np.array([v, -1.0, 0.0]),
        np.array([1.0, v, 0.0]),
        np.array([1.0, 0.0, v]),
    )[face]


def _face_uv_to_xyz(face: int, u: float, v: float) -> np.ndarray:
    """Scalar fast path of ck.face_uv_to_xyz (np.select is ~100x slower
    on scalars; this sits in the coverer's hot loop)."""
    if face == 0:
        return np.array([1.0, u, v])
    if face == 1:
        return np.array([-u, 1.0, v])
    if face == 2:
        return np.array([-u, -v, 1.0])
    if face == 3:
        return np.array([-1.0, -v, -u])
    if face == 4:
        return np.array([v, -1.0, -u])
    return np.array([v, u, -1.0])


def _normalize(p: np.ndarray) -> np.ndarray:
    return p / math.sqrt(p @ p)


def _st_to_uv_scalar(s: float) -> float:
    """Scalar quadratic projection (s2/stuv.go:186-194); same math as
    ck.st_to_uv without the per-call numpy dispatch."""
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def ij_level_to_bound_uv(i: int, j: int, level: int) -> tuple[float, float, float, float]:
    """(u_lo, u_hi, v_lo, v_hi) of the cell; s2/cellid.go:654-671."""
    cell_size = 1 << (ck.MAX_LEVEL - level)
    x_lo = i & -cell_size
    y_lo = j & -cell_size
    scale = 1.0 / ck.MAX_SIZE
    return (
        _st_to_uv_scalar(scale * x_lo),
        _st_to_uv_scalar(scale * (x_lo + cell_size)),
        _st_to_uv_scalar(scale * y_lo),
        _st_to_uv_scalar(scale * (y_lo + cell_size)),
    )


@dataclass(frozen=True)
class Cell:
    """Scalar cell for the per-geometry region/coverer path (the bulk
    PIP/tiling path never materializes Cells — it stays in numpy)."""

    id: int  # uint64 value held in a Python int
    face: int
    level: int
    u_lo: float
    u_hi: float
    v_lo: float
    v_hi: float

    @staticmethod
    def from_id(cid: int) -> "Cell":
        cid = int(cid)
        f, i, j, _ = ck.face_ij_orientation_scalar(cid)
        lsb = cid & -cid & 0xFFFFFFFFFFFFFFFF
        lvl = 30 - (lsb.bit_length() - 1) // 2
        u_lo, u_hi, v_lo, v_hi = ij_level_to_bound_uv(i, j, lvl)
        return Cell(cid, f, lvl, u_lo, u_hi, v_lo, v_hi)

    def vertex(self, k: int) -> np.ndarray:
        """Normalized k-th vertex, CCW from lower-left in (u,v); s2/cell.go:117-126."""
        return self.vertices()[k]

    def vertices(self) -> np.ndarray:
        cached = self.__dict__.get("_verts")
        if cached is None:
            cached = np.stack(
                [
                    _normalize(
                        _face_uv_to_xyz(
                            self.face,
                            self.u_lo if k in (0, 3) else self.u_hi,
                            self.v_lo if k in (0, 1) else self.v_hi,
                        )
                    )
                    for k in range(4)
                ]
            )
            self.__dict__["_verts"] = cached
        return cached

    def edge(self, k: int) -> np.ndarray:
        """Inward-facing normal of edge k->k+1; s2/cell.go:128-141."""
        if k == 0:
            return _normalize(v_norm(self.face, self.v_lo))  # bottom
        if k == 1:
            return _normalize(u_norm(self.face, self.u_hi))  # right
        if k == 2:
            return -_normalize(v_norm(self.face, self.v_hi))  # top
        return -_normalize(u_norm(self.face, self.u_lo))  # left

    def center(self) -> np.ndarray:
        x, y, z = ck.cellid_to_xyz_scalar(self.id)
        return _normalize(np.array([x, y, z]))

    def contains_point(self, p: np.ndarray) -> bool:
        """uv-bounds test with the dblEpsilon/2 margin; s2/cell.go:466-495."""
        return bool(self.contains_points(p[None, :])[0])

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized containment over an (N,3) batch."""
        pts = np.atleast_2d(pts)
        f, u, v = ck.face_uv_from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
        m = DBL_EPSILON / 2
        return (
            (f == self.face)
            & (u >= self.u_lo - m)
            & (u <= self.u_hi + m)
            & (v >= self.v_lo - m)
            & (v <= self.v_hi + m)
        )

    def _latitude(self, i: int, j: int) -> float:
        p = _face_uv_to_xyz(
            self.face, self.u_lo if i == 0 else self.u_hi, self.v_lo if j == 0 else self.v_hi
        )
        return math.atan2(p[2], math.sqrt(p[0] * p[0] + p[1] * p[1]))

    def _longitude(self, i: int, j: int) -> float:
        p = _face_uv_to_xyz(
            self.face, self.u_lo if i == 0 else self.u_hi, self.v_lo if j == 0 else self.v_hi
        )
        return math.atan2(p[1], p[0])

    def rect_bound(self) -> Rect:
        """Conservative lat/lng bound; s2/cell.go:114-149 (memoized)."""
        cached = self.__dict__.get("_rect_bound")
        if cached is None:
            cached = self._rect_bound_impl()
            self.__dict__["_rect_bound"] = cached
        return cached

    def _rect_bound_impl(self) -> Rect:
        if self.level > 0:
            # Latitude range from one diagonal pair of vertices, longitude
            # from the other; which diagonal depends on the face orientation.
            u = self.u_lo + self.u_hi
            v = self.v_lo + self.v_hi
            i = 0
            j = 0
            if u_axis(self.face)[2] == 0.0:
                if u < 0:
                    i = 1
            elif u > 0:
                i = 1
            if v_axis(self.face)[2] == 0.0:
                if v < 0:
                    j = 1
            elif v > 0:
                j = 1
            lat = R1Interval.from_point(self._latitude(i, j)).add_point(
                self._latitude(1 - i, 1 - j)
            )
            lng = (
                S1Interval.empty()
                .add_point(self._longitude(i, 1 - j))
                .add_point(self._longitude(1 - i, j))
            )
            return (
                Rect(lat, lng).expanded(2 * DBL_EPSILON, 2 * DBL_EPSILON).polar_closure()
            )
        bounds = {
            0: Rect(R1Interval(-PI_4, PI_4), S1Interval(-PI_4, PI_4)),
            1: Rect(R1Interval(-PI_4, PI_4), S1Interval(PI_4, 3 * PI_4)),
            2: Rect(R1Interval(POLE_MIN_LAT, PI_2), S1Interval.full()),
            3: Rect(R1Interval(-PI_4, PI_4), S1Interval(3 * PI_4, -3 * PI_4)),
            4: Rect(R1Interval(-PI_4, PI_4), S1Interval(-3 * PI_4, -PI_4)),
            5: Rect(R1Interval(-PI_2, -POLE_MIN_LAT), S1Interval.full()),
        }[self.face]
        # s2/cell.go:444 expands latitude by dblEpsilon (longitude is exact
        # for face cells); Rect.expanded takes (lat_margin, lng_margin).
        return bounds.expanded(DBL_EPSILON, 0.0)

    def children(self) -> list["Cell"]:
        return [Cell.from_id(c) for c in ck.children_scalar(self.id)]


# ---------------------------------------------------------------------------
# uv-bound expansion by spherical distance (s2/cellid.go:808-857).


def bound_uv(cellids) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (u_lo, u_hi, v_lo, v_hi) bounds for an array of cell
    ids (s2/cellid.go:802-806 via ijLevelToBoundUV)."""
    cellids = np.atleast_1d(np.asarray(cellids, dtype=np.uint64))
    f, i, j, _ = ck.face_ij_orientation(cellids)
    lvl = ck.level(cellids)
    cell_size = (np.int64(1) << (30 - lvl)).astype(np.int64)
    i_lo = i & -cell_size
    j_lo = j & -cell_size
    scale = 1.0 / float(1 << 30)
    u_lo = ck.st_to_uv(scale * i_lo)
    u_hi = ck.st_to_uv(scale * (i_lo + cell_size))
    v_lo = ck.st_to_uv(scale * j_lo)
    v_hi = ck.st_to_uv(scale * (j_lo + cell_size))
    return u_lo, u_hi, v_lo, v_hi


def _expand_endpoint(u, max_v, sin_dist):
    """Shift the u=const boundary line outward so its spherical distance
    to the original line is exactly asin(sin_dist)
    (s2/cellid.go:808-819); vectorized."""
    u = np.asarray(u, dtype=np.float64)
    max_v = np.asarray(max_v, dtype=np.float64)
    sin_u_shift = sin_dist * np.sqrt((1.0 + u * u + max_v * max_v) / (1.0 + u * u))
    cos_u_shift = np.sqrt(1.0 - sin_u_shift * sin_u_shift)
    # tan(atan(u) + asin(sin_u_shift)), expanded
    return (cos_u_shift * u + sin_u_shift) / (cos_u_shift - sin_u_shift * u)


def expanded_by_distance_uv(
    u_lo, u_hi, v_lo, v_hi, distance: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Expand (or, negative ``distance``, shrink) uv rects so they contain
    all points within ``distance`` radians *on the sphere* of the original
    boundary (s2/cellid.go:821-857); vectorized over rect arrays.

    The "expand cell by d meters" primitive for within-distance
    prefilters: project a query point onto the cell's face and test
    containment in the expanded bound.  Valid for |distance| <= 45deg (a
    face rect covers at most one hemisphere).
    """
    u_lo = np.asarray(u_lo, dtype=np.float64)
    u_hi = np.asarray(u_hi, dtype=np.float64)
    v_lo = np.asarray(v_lo, dtype=np.float64)
    v_hi = np.asarray(v_hi, dtype=np.float64)
    max_u = np.maximum(np.abs(u_lo), np.abs(u_hi))
    max_v = np.maximum(np.abs(v_lo), np.abs(v_hi))
    sin_dist = math.sin(distance)
    return (
        _expand_endpoint(u_lo, max_v, -sin_dist),
        _expand_endpoint(u_hi, max_v, sin_dist),
        _expand_endpoint(v_lo, max_u, -sin_dist),
        _expand_endpoint(v_hi, max_u, sin_dist),
    )
