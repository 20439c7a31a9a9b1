"""Edge-clipping kernel: face segments, per-face clipping, 2-D rect
clipping, and the edge->cell enumeration used by the crossing join.

Mirrors the reference's property-based strategy
(s2/edge_clipping_test.go): random edges, chain continuity, proximity to
the exact great circle, and exact 2-D differential checks against a
rational-arithmetic oracle.
"""

from fractions import Fraction

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import clipping as cl


def _rand_pts(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _uv_xyz(face, uv):
    p = cl._face_uv_to_xyz(face, *uv)
    return p / np.linalg.norm(p)


class TestFaceSegments:
    def test_continuity_endpoints_and_line_proximity(self):
        rng = np.random.default_rng(7)
        for k in range(400):
            a, b = _rand_pts(rng, 2)
            segs = cl.face_segments(a, b)
            # endpoints reproduce A and B
            f0, auv, _ = segs[0]
            fl, _, buv = segs[-1]
            assert np.linalg.norm(_uv_xyz(f0, auv) - a) < 1e-13
            assert np.linalg.norm(_uv_xyz(fl, buv) - b) < 1e-13
            # consecutive segments share the crossing point
            for (f1, _, b1), (f2, a2, _) in zip(segs, segs[1:]):
                assert np.linalg.norm(_uv_xyz(f1, b1) - _uv_xyz(f2, a2)) < 1e-13
            # every vertex lies on the great circle AB and inside the face square
            nrm = np.cross(a, b)
            nrm /= np.linalg.norm(nrm)
            for f, u1, u2 in segs:
                for uv in (u1, u2):
                    assert abs(nrm @ _uv_xyz(f, uv)) < 1e-10
                    assert max(abs(uv[0]), abs(uv[1])) <= 1 + 1e-14

    def test_same_face_fast_path(self):
        a = np.array([1.0, 0.01, 0.02])
        b = np.array([1.0, -0.03, 0.01])
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        segs = cl.face_segments(a, b)
        assert len(segs) == 1 and segs[0][0] == 0

    def test_antipodal_face_centers_walk_terminates(self):
        # A and B on opposite faces; the walk must still form a chain.
        a = np.array([1.0, 1e-9, 2e-9])
        b = np.array([-1.0, 3e-9, -1e-9])
        a /= np.linalg.norm(a)
        b /= np.linalg.norm(b)
        segs = cl.face_segments(a, b)
        assert segs[0][0] == 0 and segs[-1][0] == 3
        assert 2 <= len(segs) <= 5


class TestClipToFace:
    def test_consistent_with_face_segments(self):
        rng = np.random.default_rng(11)
        for k in range(300):
            a, b = _rand_pts(rng, 2)
            hit = {f for f in range(6) if cl.clip_to_face(a, b, f) is not None}
            segfaces = {f for f, _, _ in cl.face_segments(a, b)}
            # exact test: every face the chain passes through must be hit
            assert segfaces <= hit

    def test_clipped_points_near_line_and_inside_square(self):
        rng = np.random.default_rng(13)
        for k in range(300):
            a, b = _rand_pts(rng, 2)
            nrm = np.cross(a, b)
            nrm /= np.linalg.norm(nrm)
            for f in range(6):
                r = cl.clip_to_padded_face(a, b, f, 0.0)
                if r is None:
                    continue
                for uv in r:
                    assert max(abs(uv[0]), abs(uv[1])) <= 1 + 1e-12
                    # within faceClipError of the exact great circle
                    assert abs(nrm @ _uv_xyz(f, uv)) < 1e-9

    def test_padding_expands_clip_region(self):
        rng = np.random.default_rng(17)
        grow = 0
        for k in range(200):
            a, b = _rand_pts(rng, 2)
            for f in range(6):
                plain = cl.clip_to_padded_face(a, b, f, 0.0)
                padded = cl.clip_to_padded_face(a, b, f, 0.1)
                if plain is not None:
                    assert padded is not None  # padding can only add faces
                if padded is not None and plain is None:
                    grow += 1
        assert grow > 0  # padding demonstrably widened at least one case


class TestClipEdge2D:
    @staticmethod
    def _exact_intersects(a, b, rect):
        """Rational-arithmetic segment-vs-rect intersection oracle."""
        ax, ay = Fraction(a[0]), Fraction(a[1])
        bx, by = Fraction(b[0]), Fraction(b[1])
        x_lo, x_hi, y_lo, y_hi = (Fraction(v) for v in rect)
        if max(ax, bx) < x_lo or min(ax, bx) > x_hi:
            return False
        if max(ay, by) < y_lo or min(ay, by) > y_hi:
            return False
        # all four corners strictly on one side of line AB => miss
        nx, ny = -(by - ay), bx - ax
        side = [
            nx * (cx - ax) + ny * (cy - ay)
            for cx in (x_lo, x_hi)
            for cy in (y_lo, y_hi)
        ]
        return not (all(s > 0 for s in side) or all(s < 0 for s in side))

    def test_intersects_rect_differential(self):
        rng = np.random.default_rng(29)
        agree = 0
        for k in range(2000):
            a = tuple(rng.uniform(-1, 1, 2))
            b = tuple(rng.uniform(-1, 1, 2))
            lo = rng.uniform(-1, 1, 2)
            hi = lo + rng.uniform(0, 1, 2)
            rect = (lo[0], hi[0], lo[1], hi[1])
            got = cl.edge_intersects_rect(a, b, rect)
            want = self._exact_intersects(a, b, rect)
            # the fast test is conservative only within error bounds;
            # with random (non-degenerate) inputs it must agree
            assert got == want
            agree += 1
        assert agree == 2000

    def test_clip_edge_endpoints_inside_and_on_segment(self):
        rng = np.random.default_rng(31)
        hits = 0
        for k in range(2000):
            a = tuple(rng.uniform(-1, 1, 2))
            b = tuple(rng.uniform(-1, 1, 2))
            lo = rng.uniform(-1, 1, 2)
            hi = lo + rng.uniform(0, 1, 2)
            rect = (lo[0], hi[0], lo[1], hi[1])
            r = cl.clip_edge(a, b, rect)
            if r is None:
                assert not self._exact_intersects(a, b, rect)
                continue
            hits += 1
            (ax, ay), (bx, by) = r
            eps = cl.EDGE_CLIP_ERROR_UV_COORD * 4
            for x, y in ((ax, ay), (bx, by)):
                assert rect[0] - eps <= x <= rect[1] + eps
                assert rect[2] - eps <= y <= rect[3] + eps
                # point lies on segment AB: cross product ~ 0, param in [0,1]
                cross = (b[0] - a[0]) * (y - a[1]) - (b[1] - a[1]) * (x - a[0])
                seg_len2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
                assert abs(cross) <= 1e-12 + 4 * cl.EDGE_CLIP_ERROR_UV_DIST * np.sqrt(
                    seg_len2
                )
                t = ((x - a[0]) * (b[0] - a[0]) + (y - a[1]) * (b[1] - a[1])) / seg_len2
                assert -1e-12 <= t <= 1 + 1e-12
        assert hits > 200

    def test_clip_preserves_original_endpoints_when_inside(self):
        rect = (-0.5, 0.5, -0.5, 0.5)
        a, b = (-0.1, -0.2), (0.3, 0.4)
        r = cl.clip_edge(a, b, rect)
        assert r == (a, b)  # exact, no drift

    def test_interpolate_guarantees(self):
        # exact endpoint reproduction (s2/edge_clipping.go:489-496)
        assert cl.interpolate_float64(1.0, 1.0, 5.0, -3.0, 9.0) == -3.0
        assert cl.interpolate_float64(5.0, 1.0, 5.0, -3.0, 9.0) == 9.0
        # betweenness
        rng = np.random.default_rng(37)
        for k in range(500):
            a, b = sorted(rng.uniform(-10, 10, 2))
            if a == b:
                continue
            a1, b1 = sorted(rng.uniform(-10, 10, 2))
            x = rng.uniform(a, b)
            x1 = cl.interpolate_float64(x, a, b, a1, b1)
            assert a1 <= x1 <= b1


class TestEdgeCells:
    def test_superset_of_sampled_cells(self):
        rng = np.random.default_rng(41)
        for k in range(40):
            a, b = _rand_pts(rng, 2)
            for lvl in (3, 6, 9):
                cells = set(int(c) for c in cl.edge_cells_at_level(a, b, lvl))
                ts = np.linspace(0, 1, 1000)[:, None]
                pts = (1 - ts) * a + ts * b
                pts /= np.linalg.norm(pts, axis=1, keepdims=True)
                par = ck.parent(
                    ck.cellid_from_xyz(pts[:, 0], pts[:, 1], pts[:, 2]), lvl
                )
                assert set(int(c) for c in np.unique(par)) <= cells

    def test_all_results_at_requested_level(self):
        rng = np.random.default_rng(43)
        a, b = _rand_pts(rng, 2)
        cells = cl.edge_cells_at_level(a, b, 7)
        assert (ck.level(cells) == 7).all()
        # sorted unique
        assert (np.diff(cells.astype(np.uint64)) > 0).all()

    def test_short_edge_single_cell_neighborhood(self):
        # a very short edge inside one level-5 cell yields a handful of
        # cells (the cell plus padded-boundary neighbors), not a swath
        p = np.array([1.0, 0.1, 0.1])
        p /= np.linalg.norm(p)
        q = p + np.array([0, 1e-7, 0])
        q /= np.linalg.norm(q)
        cells = cl.edge_cells_at_level(p, q, 5)
        assert 1 <= len(cells) <= 4
