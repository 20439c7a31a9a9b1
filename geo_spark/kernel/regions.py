"""Region adapters for the covering machinery.

The reference's ``Region`` interface (s2/region.go:22-65) reduced to what
the coverer consumes: ``cap_bound``, ``cell_union_bound``,
``contains_cell``, ``may_intersect_cell``.  Implementations:

- :class:`Cap` — spherical disc, predicates per s2/cap.go:341-440.
- :class:`RectRegion` — lat/lng rectangle with *conservative* cell
  predicates built from Cell.rect_bound (exactness restored by the join's
  refine step; coverings stay valid supersets).
- :class:`CellUnionRegion` — a set of cells (range containment).
- :class:`LoopRegion` / :class:`PolygonRegion` — closed rings with
  crossing-parity interior.  Cell predicates use the convexity of cells:
  a loop boundary intersects a cell iff a loop vertex lies in the cell,
  a cell vertex lies on the boundary-crossing side, or a loop edge
  crosses a cell edge (robust CrossingSign); replaces the reference's
  ShapeIndex walk (s2/loop.go:632-681) with a direct vectorized test —
  same answers, no index.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu
from geo_spark.kernel import metric, pip
from geo_spark.kernel import predicates as pred
from geo_spark.kernel.cell import Cell
from geo_spark.kernel.interval import DBL_EPSILON, PI, R1Interval, Rect, S1Interval

RIGHT_CHORD2 = 2.0  # squared chord length of a 90-degree angle
MAX_CHORD2 = 4.0  # antipodal


def chord2_from_angle(rad: float) -> float:
    """Squared chord length from an angle; s1/chordangle.go:69-80."""
    if rad < 0:
        return -1.0  # negative/empty
    if rad >= math.pi:
        return MAX_CHORD2
    length = 2 * math.sin(0.5 * min(math.pi, rad))
    return length * length


def angle_from_chord2(c2: float) -> float:
    if c2 < 0:
        return -1.0
    return 2 * math.asin(0.5 * math.sqrt(min(MAX_CHORD2, c2)))


def chord2_between(a: np.ndarray, b: np.ndarray) -> float:
    """min(4, |a-b|^2); s2/point.go:141-146."""
    d = a - b
    return min(MAX_CHORD2, float(d @ d))


class Region:
    def cap_bound(self) -> "Cap":
        raise NotImplementedError

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()

    def contains_cell(self, cell: Cell) -> bool:
        raise NotImplementedError

    def may_intersect_cell(self, cell: Cell) -> bool:
        raise NotImplementedError

    def contains_point(self, p: np.ndarray) -> bool:
        raise NotImplementedError

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized containment over an (N,3) batch — the join's refine
        kernel.  Default: scalar fallback."""
        return np.array([self.contains_point(p) for p in np.atleast_2d(pts)])

    def relate_cells(self, cells: list[Cell]) -> tuple[np.ndarray, np.ndarray]:
        """(contains[], may_intersect[]) over a batch of cells — the
        coverer/subdivision inner loop.  Default: scalar fallback; shapes
        with vectorizable predicates (LoopRegion) override."""
        n = len(cells)
        contains = np.empty(n, dtype=bool)
        may = np.empty(n, dtype=bool)
        for i, c in enumerate(cells):
            contains[i] = self.contains_cell(c)
            may[i] = self.may_intersect_cell(c)
        return contains, may


@dataclass(frozen=True)
class Cap(Region):
    """Spherical disc: center (unit xyz) + squared-chord radius;
    s2/cap.go:61-90."""

    center: np.ndarray
    radius2: float  # squared chord length, in [-1, 4]

    @staticmethod
    def from_center_angle(lat_deg: float, lng_deg: float, radius_rad: float) -> "Cap":
        x, y, z = ck.latlng_to_xyz(np.float64(lat_deg), np.float64(lng_deg))
        c = np.array([float(x), float(y), float(z)])
        c /= math.sqrt(c @ c)
        return Cap(c, chord2_from_angle(radius_rad))

    def is_empty(self) -> bool:
        return self.radius2 < 0

    def is_full(self) -> bool:
        return self.radius2 == MAX_CHORD2

    def radius(self) -> float:
        return angle_from_chord2(self.radius2)

    def contains_point(self, p: np.ndarray) -> bool:
        return chord2_between(self.center, p) <= self.radius2

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        d = np.atleast_2d(pts) - self.center
        return np.minimum(
            (d * d).sum(axis=1), MAX_CHORD2
        ) <= self.radius2

    def complement(self) -> "Cap":
        if self.is_full():
            return Cap(-self.center, -1.0)
        if self.is_empty():
            return Cap(-self.center, MAX_CHORD2)
        return Cap(-self.center, MAX_CHORD2 - self.radius2)

    def cap_bound(self) -> "Cap":
        return self

    def rect_bound(self) -> Rect:
        """s2/cap.go:296-339."""
        if self.is_empty():
            return Rect.empty()
        center_lat = math.atan2(
            self.center[2],
            math.sqrt(self.center[0] ** 2 + self.center[1] ** 2),
        )
        center_lng = math.atan2(self.center[1], self.center[0])
        r = self.radius()
        lat = R1Interval(center_lat - r, center_lat + r)
        if lat.lo <= -PI / 2 + 1e-15 or lat.hi >= PI / 2 - 1e-15 or r >= PI:
            lat = R1Interval(max(lat.lo, -PI / 2), min(lat.hi, PI / 2))
            if lat.lo == -PI / 2 or lat.hi == PI / 2:
                return Rect(lat, S1Interval.full())
        cos_lat = math.cos(center_lat)
        sin_r = math.sin(r)
        if abs(sin_r) >= abs(cos_lat):
            return Rect(lat, S1Interval.full())
        dlng = math.asin(sin_r / cos_lat)
        return Rect(
            R1Interval(max(lat.lo, -PI / 2), min(lat.hi, PI / 2)),
            S1Interval(
                math.remainder(center_lng - dlng, 2 * PI),
                math.remainder(center_lng + dlng, 2 * PI),
            ),
        )

    # -- cell predicates, s2/cap.go:341-419 -------------------------------

    def _intersects(self, cell: Cell, vertices: np.ndarray) -> bool:
        """Whether the cap intersects any point of the cell other than its
        (already-tested) vertices; s2/cap.go:377-419."""
        if self.radius2 >= RIGHT_CHORD2:
            return False  # hemisphere+: both convex, no vertex in => disjoint
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self.radius2 * (1 - 0.25 * self.radius2)  # sin^2 from chord^2
        for k in range(4):
            edge = cell.edge(k)
            d = float(self.center @ edge)
            if d > 0:
                continue
            if d * d > sin2_angle:
                return False
            direction = np.cross(edge, self.center)
            if (
                float(direction @ vertices[k]) < 0
                and float(direction @ vertices[(k + 1) & 3]) > 0
            ):
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for k in range(4):
            if not self.contains_point(vertices[k]):
                return False
        return not self.complement()._intersects(cell, vertices)

    def may_intersect_cell(self, cell: Cell) -> bool:
        vertices = cell.vertices()
        for k in range(4):
            if self.contains_point(vertices[k]):
                return True
        return self._intersects(cell, vertices)

    def cell_union_bound(self) -> list[int]:
        """4 vertex neighbors at the cap-width level (or 6 faces);
        s2/cap.go:421-440."""
        level = metric.MIN_WIDTH.max_level(self.radius()) - 1
        if level < 1:
            return [(f << 61) | (1 << 60) for f in range(6)]
        cid = ck.cellid_from_xyz(
            self.center[0:1], self.center[1:2], self.center[2:3]
        )[0]
        nbrs = ck.vertex_neighbors(np.array([cid], dtype=np.uint64), level)[0]
        return [int(v) for v in nbrs]


@dataclass(frozen=True)
class RectRegion(Region):
    """Lat/lng rectangle region (radians internally)."""

    rect: Rect

    @staticmethod
    def from_degrees(lat_lo: float, lng_lo: float, lat_hi: float, lng_hi: float) -> "RectRegion":
        return RectRegion(
            Rect(
                R1Interval(math.radians(lat_lo), math.radians(lat_hi)),
                S1Interval(math.radians(lng_lo), math.radians(lng_hi)),
            )
        )

    def contains_point(self, p: np.ndarray) -> bool:
        lat = math.atan2(p[2], math.sqrt(p[0] ** 2 + p[1] ** 2))
        lng = math.atan2(p[1], p[0])
        return self.rect.contains_latlng(lat, lng)

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(pts)
        lat = np.arctan2(pts[:, 2], np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2))
        lng = np.arctan2(pts[:, 1], pts[:, 0])
        lat_ok = (lat >= self.rect.lat.lo) & (lat <= self.rect.lat.hi)
        lo, hi = self.rect.lng.lo, self.rect.lng.hi
        if lo <= hi:
            lng_ok = (lng >= lo) & (lng <= hi)
        else:  # wraps the antimeridian
            lng_ok = (lng >= lo) | (lng <= hi)
        return lat_ok & lng_ok

    def cap_bound(self) -> Cap:
        """s2/rect.go:447-473: the better of a mid-point cap and a pole cap."""
        r = self.rect
        if r.is_empty():
            return Cap(np.array([1.0, 0.0, 0.0]), -1.0)
        if r.lat.hi + r.lat.lo < 0:
            pole_z, pole_angle = -1.0, PI / 2 + r.lat.hi
        else:
            pole_z, pole_angle = 1.0, PI / 2 - r.lat.lo
        pole_cap = Cap(np.array([0.0, 0.0, pole_z]), chord2_from_angle(pole_angle))
        if r.lng.length() < 2 * PI:
            mid_lat = 0.5 * (r.lat.lo + r.lat.hi)
            mid_lng = r.lng.lo + 0.5 * r.lng.length()
            x, y, z = (
                math.cos(mid_lng) * math.cos(mid_lat),
                math.sin(mid_lng) * math.cos(mid_lat),
                math.sin(mid_lat),
            )
            center = np.array([x, y, z])
            r2 = 0.0
            for lat, lng in (
                (r.lat.lo, r.lng.lo),
                (r.lat.lo, r.lng.hi),
                (r.lat.hi, r.lng.lo),
                (r.lat.hi, r.lng.hi),
            ):
                v = np.array(
                    [
                        math.cos(lng) * math.cos(lat),
                        math.sin(lng) * math.cos(lat),
                        math.sin(lat),
                    ]
                )
                r2 = max(r2, chord2_between(center, v))
            mid_cap = Cap(center, r2)
            if mid_cap.radius2 < pole_cap.radius2:
                return mid_cap
        return pole_cap

    def contains_cell(self, cell: Cell) -> bool:
        # Conservative: cell.rect_bound() is a superset of the cell, so
        # containment of the bound implies containment of the cell.
        return self.rect.contains_rect(cell.rect_bound())

    def may_intersect_cell(self, cell: Cell) -> bool:
        # Conservative: bound superset => may-intersect superset.
        return self.rect.intersects(cell.rect_bound())


@dataclass(frozen=True)
class CellUnionRegion(Region):
    cells: tuple[int, ...]  # normalized uint64 ids

    def contains_cell(self, cell: Cell) -> bool:
        return cu.contains_cellid(list(self.cells), cell.id)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return cu.intersects_cellid(list(self.cells), cell.id)

    def contains_point(self, p: np.ndarray) -> bool:
        leaf = int(ck.cellid_from_xyz(p[0:1], p[1:2], p[2:3])[0])
        return cu.contains_cellid(list(self.cells), leaf)

    def cell_union_bound(self) -> list[int]:
        return list(self.cells)

    def cap_bound(self) -> Cap:
        if not self.cells:
            return Cap(np.array([1.0, 0.0, 0.0]), -1.0)
        centers = np.stack(
            [Cell.from_id(c).center() for c in self.cells]
        )
        mean = centers.sum(axis=0)
        mean /= math.sqrt(mean @ mean)
        r2 = 0.0
        for c in self.cells:
            cell = Cell.from_id(c)
            for k in range(4):
                r2 = max(r2, chord2_between(mean, cell.vertex(k)))
        return Cap(mean, r2)


def _edges_cross_cell(
    verts: np.ndarray, cell: Cell, cell_verts: np.ndarray, closed: bool = True
) -> bool:
    """Whether any chain edge crosses any cell edge (MaybeCross counts);
    vectorized triage with the robust cascade on the residue.
    ``closed=False`` leaves out the wrap-around edge (open polylines)."""
    chain = np.vstack([verts, verts[:1]]) if closed else verts
    a = chain[:-1]  # (M,3)
    b = chain[1:]
    m = len(a)
    for k in range(4):
        c = cell_verts[k]
        d = cell_verts[(k + 1) & 3]
        # CrossingSign(a,b,c,d) == Cross requires the four triage signs to
        # alternate; sign==0 anywhere => MaybeCross => treat as crossing
        # (conservative for covering predicates).
        acb = -pred.triage_sign(a, b, np.broadcast_to(c, (m, 3)))
        bda = pred.triage_sign(a, b, np.broadcast_to(d, (m, 3)))
        maybe = (acb == 0) | (bda == 0)
        live = (acb == bda) & (acb != 0)
        if live.any():
            al, bl = a[live], b[live]
            cbd = -pred.triage_sign(
                np.broadcast_to(c, al.shape), np.broadcast_to(d, al.shape), bl
            )
            dac = pred.triage_sign(
                np.broadcast_to(c, al.shape), np.broadcast_to(d, al.shape), al
            )
            acb_l = acb[live]
            if ((cbd == acb_l) & (dac == acb_l)).any():
                return True
            maybe_live = (cbd == 0) | (dac == 0)
            if maybe_live.any():
                return True
        if maybe.any():
            return True
    return False


def _edges_cross_cells_batch(
    a: np.ndarray, b: np.ndarray, cv: np.ndarray
) -> np.ndarray:
    """bool[K]: any chain edge (a[j] -> b[j]) crosses any edge of cell k
    (MaybeCross counts, same conservative semantics as _edges_cross_cell).
    ``cv`` is a (K,4,3) stack of cell vertices.  Bit-identical to the
    scalar path: triage_sign broadcasts elementwise over the same
    floats.  Work is chunked so the (K,4,M) intermediates stay bounded
    for huge chains (a 65k-edge loop against hundreds of cells would
    otherwise allocate hundreds of MB)."""
    K, M = len(cv), len(a)
    budget = 2_000_000  # elements per (chunk,4,M) intermediate
    if K * M * 4 > budget and K > 1:
        step = max(1, budget // (4 * M))
        return np.concatenate(
            [
                _edges_cross_cells_batch(a, b, cv[i : i + step])
                for i in range(0, K, step)
            ]
        )
    A = a[None, None, :, :]
    B = b[None, None, :, :]
    C = cv[:, :, None, :]
    D = np.roll(cv, -1, axis=1)[:, :, None, :]
    acb = -pred.triage_sign(A, B, C)  # (K,4,M)
    bda = pred.triage_sign(A, B, D)
    maybe = (acb == 0) | (bda == 0)
    live = (acb == bda) & (acb != 0)
    cbd = -pred.triage_sign(C, D, B)
    dac = pred.triage_sign(C, D, A)
    proper = live & (cbd == acb) & (dac == acb)
    maybe_live = live & ((cbd == 0) | (dac == 0))
    return (maybe | proper | maybe_live).any(axis=(1, 2))


def _boundary_hits_batch(
    verts: np.ndarray, memo: dict, sub: list[Cell], closed: bool
) -> np.ndarray:
    """bool[len(sub)]: chain boundary touches each cell — a chain vertex
    inside the cell, or a chain edge crossing a cell edge.  The chain
    vertices' (face,u,v) projection and edge arrays are memoized per
    region (the scalar path recomputed the projection per cell; it was
    the layer build's hottest line)."""
    fuv = memo.get("_fuv")
    if fuv is None:
        fuv = ck.face_uv_from_xyz(verts[:, 0], verts[:, 1], verts[:, 2])
        memo["_fuv"] = fuv
    f, u, v = fuv
    faces = np.array([c.face for c in sub])[:, None]
    ulo = np.array([c.u_lo for c in sub])[:, None]
    uhi = np.array([c.u_hi for c in sub])[:, None]
    vlo = np.array([c.v_lo for c in sub])[:, None]
    vhi = np.array([c.v_hi for c in sub])[:, None]
    m = DBL_EPSILON / 2
    vin = (
        (f[None, :] == faces)
        & (u[None, :] >= ulo - m)
        & (u[None, :] <= uhi + m)
        & (v[None, :] >= vlo - m)
        & (v[None, :] <= vhi + m)
    ).any(axis=1)
    hit = vin.copy()
    need = np.nonzero(~vin)[0]
    if len(need):
        ch = memo.get("_chain")
        if ch is None:
            closed_chain = np.vstack([verts, verts[:1]]) if closed else verts
            ch = (closed_chain[:-1], closed_chain[1:])
            memo["_chain"] = ch
        a, b = ch
        cv = np.stack([sub[i].vertices() for i in need])
        hit[need] = _edges_cross_cells_batch(a, b, cv)
    return hit


@dataclass(frozen=True)
class LoopRegion(Region):
    """Single closed CCW ring with crossing-parity interior.

    ``_memo`` caches boundary-intersects answers per cell id — the
    coverer asks contains_cell AND may_intersect_cell for the same cells
    and interior+exterior coverings revisit them."""

    verts: np.ndarray  # (M,3) unit vectors
    origin_inside: bool
    bound: Rect
    _memo: dict = field(default_factory=dict, compare=False, repr=False)

    @staticmethod
    def from_vertices(verts: np.ndarray) -> "LoopRegion":
        verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
        oi = pip.loop_origin_inside(verts)
        bound = pip.loop_rect_bound(verts, oi)
        return LoopRegion(verts, oi, bound)

    def contains_point(self, p: np.ndarray) -> bool:
        return bool(
            pip.loop_contains_points(self.verts, self.origin_inside, p[None, :])[0]
        )

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return pip.loop_contains_points(self.verts, self.origin_inside, pts)

    def cap_bound(self) -> Cap:
        return RectRegion(self.bound).cap_bound()

    def _boundary_intersects(self, cell: Cell, cell_verts: np.ndarray) -> bool:
        hit = self._memo.get(cell.id)
        if hit is None:
            hit = bool(cell.contains_points(self.verts).any()) or _edges_cross_cell(
                self.verts, cell, cell_verts
            )
            self._memo[cell.id] = hit
        return hit

    def contains_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects(cell.rect_bound()):
            return False
        cell_verts = cell.vertices()
        if self._boundary_intersects(cell, cell_verts):
            return False
        return self.contains_point(cell.center())

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.bound.intersects(cell.rect_bound()):
            return False
        cell_verts = cell.vertices()
        if self._boundary_intersects(cell, cell_verts):
            return True
        return self.contains_point(cell.center())

    def _boundary_hits_batch(self, sub: list[Cell]) -> np.ndarray:
        return _boundary_hits_batch(self.verts, self._memo, sub, closed=True)

    def relate_cells(self, cells: list[Cell]) -> tuple[np.ndarray, np.ndarray]:
        """Batched (contains[], may_intersect[]): one rect prefilter pass,
        one shared-projection vertex-in-cell test, one broadcast edge-
        crossing cascade, one loop_contains_points call over all cell
        centers — replacing per-cell scalar predicate calls in the
        coverer/subdivision inner loop (~5x on the 50-city layer build)."""
        n = len(cells)
        contains = np.zeros(n, dtype=bool)
        may = np.zeros(n, dtype=bool)
        alive = [i for i in range(n) if self.bound.intersects(cells[i].rect_bound())]
        if not alive:
            return contains, may
        sub = [cells[i] for i in alive]
        hit = self._boundary_hits_batch(sub)
        centers = np.stack([c.center() for c in sub])
        cin = pip.loop_contains_points(self.verts, self.origin_inside, centers)
        idx = np.array(alive)
        contains[idx] = ~hit & cin
        may[idx] = hit | cin
        return contains, may


@dataclass(frozen=True)
class PolylineRegion(Region):
    """Open chain of geodesic edges — dimension 1, no interior
    (s2/polyline.go:29).  Cell predicates are the Polyline.IntersectsCell
    test (s2/polyline.go:131-161) restated for convex cells: a chain
    meets a cell iff a vertex lies inside or an edge crosses a cell edge
    (a geodesic segment cannot traverse a convex cell otherwise).  Drives
    the coverer so trajectory edges get covering terms for the crossing
    join (s2/crossing_edge_query.go:31-390 analog)."""

    verts: np.ndarray  # (M,3) unit vectors, M >= 2
    bound: Rect
    _memo: dict = field(default_factory=dict, compare=False, repr=False)

    @staticmethod
    def from_vertices(verts: np.ndarray) -> "PolylineRegion":
        verts = np.atleast_2d(np.asarray(verts, dtype=np.float64))
        return PolylineRegion(verts, pip.rect_bound_of_chain(verts, closed=False))

    @staticmethod
    def from_latlng(lat_deg: np.ndarray, lng_deg: np.ndarray) -> "PolylineRegion":
        x, y, z = ck.latlng_to_xyz(
            np.asarray(lat_deg, dtype=np.float64),
            np.asarray(lng_deg, dtype=np.float64),
        )
        return PolylineRegion.from_vertices(np.stack([x, y, z], axis=1))

    def cap_bound(self) -> Cap:
        return RectRegion(self.bound).cap_bound()

    def contains_point(self, p: np.ndarray) -> bool:
        return False  # measure-zero boundary, SemiOpen convention

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        return np.zeros(len(np.atleast_2d(pts)), dtype=bool)

    def contains_cell(self, cell: Cell) -> bool:
        return False  # no interior

    def may_intersect_cell(self, cell: Cell) -> bool:
        hit = self._memo.get(cell.id)
        if hit is None:
            if not self.bound.intersects(cell.rect_bound()):
                hit = False
            else:
                hit = bool(
                    cell.contains_points(self.verts).any()
                ) or _edges_cross_cell(
                    self.verts, cell, cell.vertices(), closed=False
                )
            self._memo[cell.id] = hit
        return hit

    def relate_cells(self, cells: list[Cell]) -> tuple[np.ndarray, np.ndarray]:
        """Batched: contains is identically False (no interior); may =
        rect prefilter + one vectorized boundary-touch pass."""
        n = len(cells)
        contains = np.zeros(n, dtype=bool)
        may = np.zeros(n, dtype=bool)
        alive = [i for i in range(n) if self.bound.intersects(cells[i].rect_bound())]
        if not alive:
            return contains, may
        sub = [cells[i] for i in alive]
        may[np.array(alive)] = _boundary_hits_batch(
            self.verts, self._memo, sub, closed=False
        )
        return contains, may


@dataclass(frozen=True)
class PolygonRegion(Region):
    """Nested loops; interior = XOR of loop parities (s2/polygon.go:591-613)."""

    loops: tuple[LoopRegion, ...]

    @staticmethod
    def from_loops(loops: list[np.ndarray]) -> "PolygonRegion":
        return PolygonRegion(tuple(LoopRegion.from_vertices(v) for v in loops))

    def contains_point(self, p: np.ndarray) -> bool:
        inside = False
        for lp in self.loops:
            inside ^= lp.contains_point(p)
        return inside

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(pts)
        inside = np.zeros(len(pts), dtype=bool)
        for lp in self.loops:
            inside ^= lp.contains_points(pts)
        return inside

    def bound(self) -> Rect:
        b = Rect.empty()
        for lp in self.loops:
            b = b.union(lp.bound)
        return b

    def cap_bound(self) -> Cap:
        return RectRegion(self.bound()).cap_bound()

    def _boundary_intersects(self, cell: Cell, cell_verts: np.ndarray) -> bool:
        for lp in self.loops:
            if lp.bound.intersects(cell.rect_bound()) and lp._boundary_intersects(
                cell, cell_verts
            ):
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        if not self.bound().intersects(cell.rect_bound()):
            return False
        cell_verts = cell.vertices()
        if self._boundary_intersects(cell, cell_verts):
            return False
        return self.contains_point(cell.center())

    def may_intersect_cell(self, cell: Cell) -> bool:
        if not self.bound().intersects(cell.rect_bound()):
            return False
        cell_verts = cell.vertices()
        if self._boundary_intersects(cell, cell_verts):
            return True
        return self.contains_point(cell.center())

    def relate_cells(self, cells: list[Cell]) -> tuple[np.ndarray, np.ndarray]:
        """Batched: boundary-touch is the OR over rings (each ring only
        evaluated for cells its own bound reaches), center parity is the
        XOR of one loop_contains_points call per ring."""
        n = len(cells)
        contains = np.zeros(n, dtype=bool)
        may = np.zeros(n, dtype=bool)
        b = self.bound()
        alive = [i for i in range(n) if b.intersects(cells[i].rect_bound())]
        if not alive:
            return contains, may
        sub = [cells[i] for i in alive]
        hit = np.zeros(len(sub), dtype=bool)
        for lp in self.loops:
            idx = [
                j
                for j in range(len(sub))
                if not hit[j] and lp.bound.intersects(sub[j].rect_bound())
            ]
            if idx:
                hit[idx] |= lp._boundary_hits_batch([sub[j] for j in idx])
        centers = np.stack([c.center() for c in sub])
        cin = np.zeros(len(sub), dtype=bool)
        for lp in self.loops:
            cin ^= pip.loop_contains_points(lp.verts, lp.origin_inside, centers)
        idx = np.array(alive)
        contains[idx] = ~hit & cin
        may[idx] = hit | cin
        return contains, may


# ---------------------------------------------------------------------------
# Distance-to-region (squared chord; 0 inside) — the within-distance join's
# refine kernel (min-distance targets, s2/min_distance_targets.go:53-355).
# ---------------------------------------------------------------------------


def _cap_distance_chord2(cap: Cap, pts: np.ndarray) -> np.ndarray:
    d = np.atleast_2d(pts) - cap.center
    chord2 = np.minimum((d * d).sum(axis=1), MAX_CHORD2)
    ang = 2 * np.arcsin(0.5 * np.sqrt(chord2))
    out_ang = np.maximum(0.0, ang - cap.radius())
    s = 2 * np.sin(0.5 * np.minimum(out_ang, math.pi))
    return s * s


def _loop_distance_chord2(loop: "LoopRegion", pts: np.ndarray) -> np.ndarray:
    from geo_spark.kernel import edges as E

    pts = np.atleast_2d(pts)
    inside = loop.contains_points(pts)
    out = E.point_to_edges_chord2(pts, np.vstack([loop.verts, loop.verts[:1]]))
    return np.where(inside, 0.0, out)


def distance_chord2(region: Region, pts: np.ndarray) -> np.ndarray:
    """Squared chord distance from each point to the region (0 if
    contained).  Supported: Cap, LoopRegion, PolygonRegion."""
    if isinstance(region, Cap):
        return _cap_distance_chord2(region, pts)
    if isinstance(region, LoopRegion):
        return _loop_distance_chord2(region, pts)
    if isinstance(region, PolygonRegion):
        pts = np.atleast_2d(pts)
        inside = region.contains_points(pts)
        best = np.full(len(pts), MAX_CHORD2)
        from geo_spark.kernel import edges as E

        for lp in region.loops:
            best = np.minimum(
                best, E.point_to_edges_chord2(pts, np.vstack([lp.verts, lp.verts[:1]]))
            )
        return np.where(inside, 0.0, best)
    raise TypeError(f"distance_chord2: unsupported region {type(region).__name__}")


@dataclass(frozen=True)
class RegionUnion(Region):
    """Union of regions; predicates are any/all reductions over members
    (s2/regionunion.go:30-90)."""

    regions: tuple[Region, ...]

    def contains_point(self, p: np.ndarray) -> bool:
        return any(r.contains_point(p) for r in self.regions)

    def contains_points(self, pts: np.ndarray) -> np.ndarray:
        pts = np.atleast_2d(pts)
        out = np.zeros(len(pts), dtype=bool)
        for r in self.regions:
            out |= r.contains_points(pts)
        return out

    def contains_cell(self, cell: Cell) -> bool:
        # any single member containing the cell suffices (the union could
        # contain it jointly — conservative exactly like the reference,
        # s2/regionunion.go:63-70)
        return any(r.contains_cell(cell) for r in self.regions)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return any(r.may_intersect_cell(cell) for r in self.regions)

    def cap_bound(self) -> Cap:
        return RectRegion(self.rect_bound()).cap_bound()

    def rect_bound(self) -> Rect:
        b = Rect.empty()
        for r in self.regions:
            if hasattr(r, "rect_bound"):
                rb = r.rect_bound() if callable(getattr(r, "rect_bound")) else r.bound
            elif hasattr(r, "bound"):
                rb = r.bound
            else:
                return Rect.full()
            b = b.union(rb)
        return b

    def cell_union_bound(self) -> list[int]:
        out: list[int] = []
        for r in self.regions:
            out.extend(r.cell_union_bound())
        return cu.normalize(out)
