"""Plate Carree / Mercator projection kernels: reference test vectors
(s2/projections_test.go), round trips, wrapping, pole behavior."""

import math

import numpy as np

from geo_spark.kernel.projections import (
    MercatorProjection,
    PlateCarreeProjection,
    interpolate_xy,
    wrap_destination,
)

HALF_PI = 0.5 * math.pi


def _latlng_of_xyz(x, y, z):
    return math.atan2(z, math.hypot(x, y)), math.atan2(y, x)


def test_plate_carree_axis_vectors():
    # s2/projections_test.go:60-84 (axis points at x_scale=180)
    p = PlateCarreeProjection(180)
    lat = np.array([0.0, 0.0, 0.0, 0.0, HALF_PI, -HALF_PI])
    lng = np.array([0.0, math.pi, HALF_PI, -HALF_PI, 0.0, 0.0])
    X, Y = p.project(lat, lng)
    np.testing.assert_allclose(X, [0, 180, 90, -90, 0, 0], atol=1e-12)
    np.testing.assert_allclose(Y, [0, 0, 0, 0, 90, -90], atol=1e-12)
    la, ln = p.unproject(X, Y)
    np.testing.assert_allclose(la, lat, atol=1e-12)
    np.testing.assert_allclose(ln, lng, atol=1e-12)


def test_mercator_reference_vectors():
    # s2/projections_test.go:86-110: axis points plus the arbitrary
    # lat=1rad golden value 70.255578967830246 at max_lng=180
    m = MercatorProjection(180)
    lat = np.array([0.0, 0.0, 0.0, 0.0, 1.0])
    lng = np.array([0.0, math.pi, HALF_PI, -HALF_PI, 0.0])
    X, Y = m.project(lat, lng)
    np.testing.assert_allclose(X, [0, 180, 90, -90, 0], atol=1e-12)
    np.testing.assert_allclose(
        Y, [0, 0, 0, 0, 70.255578967830246], atol=1e-12
    )


def test_mercator_poles_are_infinite():
    # s2/projections_test.go:112-131
    m = MercatorProjection(180)
    _, Y = m.project(np.array([HALF_PI, -HALF_PI]), np.array([0.0, 0.0]))
    assert math.isinf(Y[0]) and Y[0] > 0
    assert math.isinf(Y[1]) and Y[1] < 0
    # unproject of +-inf y lands exactly on the poles
    la, _ = m.unproject(np.array([0.0, 0.0]), np.array([np.inf, -np.inf]))
    assert la[0] == HALF_PI and la[1] == -HALF_PI


def test_mercator_round_trip():
    rng = np.random.default_rng(5)
    lat = rng.uniform(-1.5, 1.5, 5000)
    lng = rng.uniform(-math.pi, math.pi, 5000)
    for max_lng in (180.0, math.pi, 20037508.342789244 / 6378137 * 180 / math.pi):
        m = MercatorProjection(max_lng)
        X, Y = m.project(lat, lng)
        la, ln = m.unproject(X, Y)
        np.testing.assert_allclose(la, lat, atol=1e-12)
        np.testing.assert_allclose(ln, lng, atol=1e-12)


def test_plate_carree_round_trip_and_clamp():
    p = PlateCarreeProjection(1.0)
    rng = np.random.default_rng(6)
    lat = rng.uniform(-HALF_PI, HALF_PI, 2000)
    lng = rng.uniform(-math.pi, math.pi, 2000)
    X, Y = p.project(lat, lng)
    la, ln = p.unproject(X, Y)
    np.testing.assert_allclose(la, lat, atol=1e-12)
    np.testing.assert_allclose(ln, lng, atol=1e-12)
    # out-of-range y clamps to the poles (s2/projections.go:126-129)
    la, _ = p.unproject(np.array([0.0, 0.0]), np.array([5.0, -5.0]))
    assert la[0] == HALF_PI and la[1] == -HALF_PI


def test_project_sinlat_matches_project():
    m = MercatorProjection(180)
    rng = np.random.default_rng(7)
    lat = rng.uniform(-1.55, 1.55, 3000)
    lng = rng.uniform(-math.pi, math.pi, 3000)
    X1, Y1 = m.project(lat, lng)
    X2, Y2 = m.project_sinlat(np.sin(lat), lng)
    assert (X1 == X2).all() and (Y1 == Y2).all()


def test_interpolate_vectors():
    # s2/projections_test.go:25-57: midpoint-ish, extrapolation,
    # exactness at both endpoints
    x, y = interpolate_xy(0.25, 1.0, 5.0, 3.0, 9.0)
    assert x == 1.5 and y == 6.0
    x, y = interpolate_xy(-2.0, 1.0, 0.0, 3.0, 0.0)
    assert x == -3.0 and y == 0.0
    ax, ay = 1.234, -5.456e-20
    bx, by = 2.1234e-20, 7.456
    x, y = interpolate_xy(0.0, ax, ay, bx, by)
    assert x == ax and y == ay
    x, y = interpolate_xy(1.0, ax, ay, bx, by)
    assert x == bx and y == by


def test_wrap_destination():
    # s2/projections.go:232-247: wrap only when the direct hop exceeds
    # half the wrap distance; y never wraps (wrap_y=0)
    ax = np.array([170.0, 0.0, -170.0, 10.0])
    bx = np.array([-170.0, 10.0, 170.0, -10.0])
    ay = np.zeros(4)
    by = np.array([1.0, 2.0, 3.0, 4.0])
    x, y = wrap_destination(ax, ay, bx, by, wrap_x=360.0)
    np.testing.assert_allclose(x, [190.0, 10.0, -190.0, -10.0], atol=1e-12)
    assert (y == by).all()


def test_mercator_tessellation_via_projection():
    """A Mercator edge interpolated in projected space then unprojected
    stays a rhumb line: its bearing (computed per segment) is constant."""
    m = MercatorProjection(math.pi)
    a_lat, a_lng = math.radians(10.0), math.radians(-30.0)
    b_lat, b_lng = math.radians(55.0), math.radians(40.0)
    ax, ay = m.project(np.array([a_lat]), np.array([a_lng]))
    bx, by = m.project(np.array([b_lat]), np.array([b_lng]))
    fs = np.linspace(0.0, 1.0, 33)
    xs, ys = interpolate_xy(0.0, ax, ay, bx, by)
    pts = [interpolate_xy(f, float(ax[0]), float(ay[0]), float(bx[0]), float(by[0])) for f in fs]
    # in Mercator space the path is straight: slope between every
    # consecutive pair equals the end-to-end slope exactly
    slope = (by[0] - ay[0]) / (bx[0] - ax[0])
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        assert abs((y1 - y0) / (x1 - x0) - slope) < 1e-9
    # and unprojection round-trips each vertex onto the sphere
    la, ln = m.unproject(
        np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
    )
    assert la[0] == np.float64(a_lat) or abs(la[0] - a_lat) < 1e-12
    assert abs(la[-1] - b_lat) < 1e-12 and abs(ln[-1] - b_lng) < 1e-12


def test_rhumb_distance_analytic_cases():
    from geo_spark.kernel.projections import rhumb_distance_bearing

    # meridian: dist = dphi, bearing 0 (north)
    d, b = rhumb_distance_bearing(
        np.array([10.0]), np.array([20.0]), np.array([30.0]), np.array([20.0])
    )
    assert abs(d[0] - math.radians(20.0)) < 1e-12 and abs(b[0]) < 1e-12
    # equator: dist = dlam, bearing pi/2 (east)
    d, b = rhumb_distance_bearing(
        np.array([0.0]), np.array([10.0]), np.array([0.0]), np.array([50.0])
    )
    assert abs(d[0] - math.radians(40.0)) < 1e-12
    assert abs(b[0] - HALF_PI) < 1e-12
    # constant latitude: dist = dlam * cos(lat) (parallel sailing)
    d, b = rhumb_distance_bearing(
        np.array([60.0]), np.array([0.0]), np.array([60.0]), np.array([10.0])
    )
    assert abs(d[0] - math.radians(10.0) * math.cos(math.radians(60.0))) < 1e-12
    assert abs(b[0] - HALF_PI) < 1e-9
    # antimeridian wrap goes the short way (westward, negative bearing)
    d, b = rhumb_distance_bearing(
        np.array([0.0]), np.array([-175.0]), np.array([0.0]), np.array([175.0])
    )
    assert abs(d[0] - math.radians(10.0)) < 1e-12 and b[0] < 0


def test_rhumb_at_least_great_circle():
    from geo_spark.kernel.projections import rhumb_distance_bearing

    rng = np.random.default_rng(9)
    lat1 = rng.uniform(-80, 80, 2000)
    lat2 = rng.uniform(-80, 80, 2000)
    lng1 = rng.uniform(-180, 180, 2000)
    lng2 = rng.uniform(-180, 180, 2000)
    d, _ = rhumb_distance_bearing(lat1, lng1, lat2, lng2)
    # great-circle via haversine
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lng2 - lng1)
    h = (
        np.sin((p2 - p1) / 2) ** 2
        + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    )
    gc = 2 * np.arcsin(np.sqrt(h))
    assert (d >= gc - 1e-9).all()


def test_generic_tessellator_plate_carree_matches_edges_kernel():
    """tessellate_projected_in(PlateCarree) reproduces the specialized
    plate-carree tessellator in kernel/edges.py on the same edge."""
    from geo_spark.kernel.edges import tessellate_projected
    from geo_spark.kernel.projections import (
        PlateCarreeProjection,
        tessellate_projected_in,
    )

    def xyz(lat, lng):
        la, ln = math.radians(lat), math.radians(lng)
        return np.array(
            [
                math.cos(la) * math.cos(ln),
                math.cos(la) * math.sin(ln),
                math.sin(la),
            ]
        )

    a, b = xyz(10.0, -60.0), xyz(55.0, 70.0)
    tol = 1e-3
    want = tessellate_projected(a, b, tol)
    got_xy = tessellate_projected_in(PlateCarreeProjection(1.0), a, b, tol)
    assert len(got_xy) == len(want)
    p = PlateCarreeProjection(1.0)
    la, ln = p.unproject(got_xy[:, 0], got_xy[:, 1])
    got3 = np.stack(
        [np.cos(la) * np.cos(ln), np.cos(la) * np.sin(ln), np.sin(la)],
        axis=1,
    )
    np.testing.assert_allclose(got3, want, atol=1e-9)


def test_generic_tessellator_mercator_midpoint_criterion():
    """Every emitted Mercator segment satisfies the tessellation
    criterion: the unprojected segment midpoint sits within tolerance
    of the geodesic midpoint of its endpoints."""
    from geo_spark.kernel.projections import (
        MercatorProjection,
        tessellate_projected_in,
    )

    def xyz(lat, lng):
        la, ln = math.radians(lat), math.radians(lng)
        return np.array(
            [
                math.cos(la) * math.cos(ln),
                math.cos(la) * math.sin(ln),
                math.sin(la),
            ]
        )

    m = MercatorProjection(math.pi)
    tol = 5e-4
    a, b = xyz(-35.0, 150.0), xyz(40.0, -120.0)  # crosses the antimeridian
    chain = tessellate_projected_in(m, a, b, tol)
    assert len(chain) >= 3
    # endpoint wrap went the short way: |dx| < pi
    assert abs(chain[-1, 0] - chain[0, 0]) < math.pi
    tol_chord2 = (2 * math.sin(tol / 2)) ** 2
    for (px, py), (qx, qy) in zip(chain, chain[1:]):
        pl, pg = m.unproject(np.array([px]), np.array([py]))
        ql, qg = m.unproject(np.array([qx]), np.array([qy]))
        p3, q3 = xyz(math.degrees(pl[0]), math.degrees(pg[0])), xyz(
            math.degrees(ql[0]), math.degrees(qg[0])
        )
        gm = p3 + q3
        gm /= np.linalg.norm(gm)
        ml, mg = m.unproject(
            np.array([(px + qx) / 2]), np.array([(py + qy) / 2])
        )
        pm = xyz(math.degrees(ml[0]), math.degrees(mg[0]))
        assert ((gm - pm) ** 2).sum() <= tol_chord2 * 1.0000001
