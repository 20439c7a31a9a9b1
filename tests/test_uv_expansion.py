"""uv-bound expansion by spherical distance.

Mirrors the reference's TestCellIDExpandedByDistanceUV protocol
(s2/cellid_test.go:884-931): sample points near the boundary of a random
cell's uv bound, compute their true spherical distance to the boundary,
and check the expansion's containment guarantees for positive and
negative distances.
"""

import math

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.cell import (
    Cell,
    bound_uv,
    expanded_by_distance_uv,
    _face_uv_to_xyz,
)
from geo_spark.kernel.clipping import face_xyz_to_uvw


def _random_cellid(rng) -> int:
    lvl = int(rng.integers(0, 31))
    lat = math.degrees(math.asin(rng.uniform(-1, 1)))
    lng = rng.uniform(-180, 180)
    leaf = ck.cellid_from_latlng(np.array([lat]), np.array([lng]))
    return int(ck.parent(leaf, lvl)[0])


def _sample_boundary(rng, rect):
    u_lo, u_hi, v_lo, v_hi = rect
    side = rng.integers(0, 4)
    if side == 0:
        return u_lo, rng.uniform(v_lo, v_hi)
    if side == 1:
        return u_hi, rng.uniform(v_lo, v_hi)
    if side == 2:
        return rng.uniform(u_lo, u_hi), v_lo
    return rng.uniform(u_lo, u_hi), v_hi


def _project_to_boundary(u, v, rect):
    u_lo, u_hi, v_lo, v_hi = rect
    du0, du1 = abs(u - u_lo), abs(u - u_hi)
    dv0, dv1 = abs(v - v_lo), abs(v - v_hi)
    dmin = min(du0, du1, dv0, dv1)
    if dmin == du0:
        return u_lo, min(max(v, v_lo), v_hi)
    if dmin == du1:
        return u_hi, min(max(v, v_lo), v_hi)
    if dmin == dv0:
        return min(max(u, u_lo), u_hi), v_lo
    return min(max(u, u_lo), u_hi), v_hi


def _contains(rect, u, v):
    u_lo, u_hi, v_lo, v_hi = rect
    return u_lo <= u <= u_hi and v_lo <= v <= v_hi


class TestBoundUV:
    def test_matches_cell_ctor_and_partitions(self):
        rng = np.random.default_rng(3)
        for _ in range(200):
            cid = _random_cellid(rng)
            cell = Cell.from_id(cid)
            u_lo, u_hi, v_lo, v_hi = (
                float(x[0]) for x in bound_uv(np.array([cid], dtype=np.uint64))
            )
            assert (u_lo, u_hi, v_lo, v_hi) == (
                cell.u_lo,
                cell.u_hi,
                cell.v_lo,
                cell.v_hi,
            )

    def test_children_tile_parent(self):
        rng = np.random.default_rng(5)
        for _ in range(50):
            cid = _random_cellid(rng)
            lvl = int(ck.level(np.array([cid], dtype=np.uint64))[0])
            if lvl >= 30:
                continue
            first = ck.child_begin_at_level(np.array([cid], dtype=np.uint64), lvl + 1)[0]
            kids = [int(first)]
            for _ in range(3):
                kids.append(int(ck.next_cell(np.array([kids[-1]], dtype=np.uint64))[0]))
            pu_lo, pu_hi, pv_lo, pv_hi = (
                float(x[0]) for x in bound_uv(np.array([cid], dtype=np.uint64))
            )
            area = 0.0
            for kid in kids:
                u_lo, u_hi, v_lo, v_hi = (
                    float(x[0]) for x in bound_uv(np.array([kid], dtype=np.uint64))
                )
                assert pu_lo - 1e-15 <= u_lo and u_hi <= pu_hi + 1e-15
                assert pv_lo - 1e-15 <= v_lo and v_hi <= pv_hi + 1e-15
                area += (u_hi - u_lo) * (v_hi - v_lo)
            # the four children tile the parent's uv rect exactly
            assert abs(area - (pu_hi - pu_lo) * (pv_hi - pv_lo)) < 1e-12


class TestExpandedByDistanceUV:
    def test_reference_protocol(self):
        rng = np.random.default_rng(7)
        for _ in range(400):
            cid = _random_cellid(rng)
            face = int(ck.face(np.array([cid], dtype=np.uint64))[0])
            rect = tuple(
                float(x[0]) for x in bound_uv(np.array([cid], dtype=np.uint64))
            )
            distance = math.radians(rng.uniform(-10, 10))
            ex = expanded_by_distance_uv(*rect, distance)
            expanded = tuple(float(np.atleast_1d(x)[0]) for x in ex)
            for _ in range(10):
                bu, bv = _sample_boundary(rng, rect)
                center = _face_uv_to_xyz(face, bu, bv)
                center = center / np.linalg.norm(center)
                # sample from a disc of radius 2|distance| around the
                # boundary point
                r = 2 * abs(distance) * math.sqrt(rng.uniform(0, 1))
                theta = rng.uniform(0, 2 * math.pi)
                # build an orthonormal frame at center
                tmp = np.array([1.0, 0.0, 0.0])
                if abs(center[0]) > 0.9:
                    tmp = np.array([0.0, 1.0, 0.0])
                e1 = np.cross(center, tmp)
                e1 /= np.linalg.norm(e1)
                e2 = np.cross(center, e1)
                p = (
                    math.cos(r) * center
                    + math.sin(r) * (math.cos(theta) * e1 + math.sin(theta) * e2)
                )
                # project p onto the face
                fu, fv, fw = (float(x) for x in face_xyz_to_uvw(face, p))
                if fw <= 0:
                    continue
                u, v = fu / fw, fv / fw
                cu, cv = _project_to_boundary(u, v, rect)
                closest = _face_uv_to_xyz(face, cu, cv)
                closest /= np.linalg.norm(closest)
                actual = math.acos(max(-1.0, min(1.0, float(p @ closest))))
                if distance >= 0:
                    if _contains(rect, u, v) or actual < distance:
                        assert _contains(expanded, u, v), (
                            cid,
                            distance,
                            actual,
                            (u, v),
                            rect,
                            expanded,
                        )
                else:
                    if actual < -distance:
                        assert not _contains(expanded, u, v)

    def test_zero_distance_identity(self):
        rng = np.random.default_rng(11)
        cid = _random_cellid(rng)
        rect = tuple(float(x[0]) for x in bound_uv(np.array([cid], dtype=np.uint64)))
        ex = expanded_by_distance_uv(*rect, 0.0)
        got = tuple(float(np.atleast_1d(x)[0]) for x in ex)
        assert got == rect
