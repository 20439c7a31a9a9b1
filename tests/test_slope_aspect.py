"""tile_slope_aspect: Horn-stencil gradient over the mercator tile grid.

Differential against a dense-numpy Horn stencil on the same tile counts,
plus antimeridian wrap / pole clamp / flat-cell / octant edge cases.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.operators.tiling import tile_slope_aspect

ZOOM = 4
N = 1 << ZOOM


def _octant(a: int, b: int) -> int:
    if a == 0 and b == 0:
        return -1
    if b >= 0 and a > 0 and a > b:
        return 0
    if b > 0 and a > 0 and a <= b:
        return 1
    if b > 0 and a <= 0 and b > -a:
        return 2
    if b > 0 and a < 0 and -a >= b:
        return 3
    if b == 0 and a < 0:
        return 4
    if b < 0 and a < 0 and -a > -b:
        return 4
    if b < 0 and a < 0 and -a <= -b:
        return 5
    if b < 0 and a >= 0 and -b > a:
        return 6
    return 7


def _dense_horn(counts: dict[tuple[int, int], int]):
    """Dense reference: scatterless gather with x wrap, y clamp."""
    z = np.zeros((N, N), dtype=np.int64)  # [x, y]
    for (x, y), c in counts.items():
        z[x, y] = c
    out = {}
    for (x, y), c in counts.items():
        if c == 0:
            continue
        gx = gy = 0
        for rx in (-1, 0, 1):
            for ry in (-1, 0, 1):
                nx = (x + rx) % N
                ny = y + ry
                if ny < 0 or ny >= N:
                    continue
                v = int(z[nx, ny])
                gx += rx * (2 - abs(ry)) * v
                gy += ry * (2 - abs(rx)) * v
        out[(x, y)] = (gx, gy, gx * gx + gy * gy, _octant(gx, gy))
    return out


def _tile_latlng(x: int, y: int) -> tuple[float, float]:
    """A lat/lng strictly interior to mercator tile (x, y) at ZOOM."""
    import math

    lng = (x + 0.5) / N * 360.0 - 180.0
    yn = (y + 0.5) / N
    lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * yn))))
    return lat, lng


@pytest.fixture(scope="module")
def counts():
    rng = np.random.default_rng(20260821)
    c = {}
    # random interior blob + antimeridian straddle + pole rows
    for _ in range(120):
        x = int(rng.integers(0, N))
        y = int(rng.integers(0, N))
        c[(x, y)] = c.get((x, y), 0) + int(rng.integers(1, 9))
    for y in (3, 4, 5):
        c[(0, y)] = c.get((0, y), 0) + 5  # wrap partners
        c[(N - 1, y)] = c.get((N - 1, y), 0) + 7
    c[(2, 0)] = 4  # clamped top row
    c[(9, N - 1)] = 6  # clamped bottom row
    return c


def test_matches_dense_reference(spark, counts):
    rows = []
    for (x, y), c in counts.items():
        lat, lng = _tile_latlng(x, y)
        rows += [(lat, lng)] * c
    df = spark.createDataFrame(rows, "lat double, lng double")
    got = {
        (r["tx"], r["ty"]): (r["gx"], r["gy"], r["slope2"], r["octant"])
        for r in tile_slope_aspect(df, ZOOM).collect()
    }
    want = _dense_horn(counts)
    assert got == want


def test_isolated_tile_is_flat(spark):
    lat, lng = _tile_latlng(7, 7)
    df = spark.createDataFrame([(lat, lng)] * 3, "lat double, lng double")
    [r] = tile_slope_aspect(df, ZOOM).collect()
    assert (r["gx"], r["gy"], r["slope2"], r["octant"]) == (0, 0, 0, -1)


def test_octant_classifier_covers_the_circle():
    # every 5-degree direction lands in its 45-degree bin
    import math

    for deg in range(0, 360, 5):
        a = round(1000 * math.cos(math.radians(deg)))
        b = round(1000 * math.sin(math.radians(deg)))
        assert _octant(a, b) == (deg % 360) // 45, deg
    assert _octant(0, 0) == -1


def test_wrap_gradient_crosses_antimeridian(spark, counts):
    """The x=0 column must see x=N-1 as its west neighbor."""
    rows = []
    sub = {(x, y): c for (x, y), c in counts.items() if x in (0, N - 1, 1)}
    for (x, y), c in sub.items():
        lat, lng = _tile_latlng(x, y)
        rows += [(lat, lng)] * c
    df = spark.createDataFrame(rows, "lat double, lng double")
    got = {
        (r["tx"], r["ty"]): (r["gx"], r["gy"])
        for r in tile_slope_aspect(df, ZOOM).collect()
    }
    want = _dense_horn(sub)
    for k, (gx, gy, _, _) in want.items():
        assert got[k] == (gx, gy)
    # and the wrap actually contributed: some x=0 tile has nonzero gx
    assert any(gx != 0 for (x, _), (gx, _) in got.items() if x == 0)


def test_plan_is_native_sql(spark):
    lat, lng = _tile_latlng(3, 3)
    df = spark.createDataFrame([(lat, lng)], "lat double, lng double")
    plan = tile_slope_aspect(df, ZOOM)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
