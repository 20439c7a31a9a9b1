"""tile_theil_sen: robust median-of-slopes trend per tile."""

import numpy as np
from pyspark.sql import functions as F

from geo_spark.operators.tiling import tile_theil_sen

ZOOM = 2
DAY = 86_400_000_000


def _mk(spark, tiles: dict):
    """tiles: {(lat, lng): {day: count}} -> events df"""
    rows = []
    for (la, ln), days in tiles.items():
        for d, c in days.items():
            for _ in range(c):
                rows.append((float(la), float(ln), d * DAY + 7))
    return spark.createDataFrame(rows, "lat double, lng double, ts_us long")


def _ref(days: dict) -> tuple[int, int, int]:
    ds = sorted(days)
    slopes = []
    k = 10**9
    for i in range(len(ds)):
        for j in range(i + 1, len(ds)):
            dd = ds[j] - ds[i]
            dc = days[ds[j]] - days[ds[i]]
            slopes.append((dc * 1000 + k * dd) // dd - k)
    slopes.sort()
    n = len(slopes)
    return len(ds), n, slopes[(n + 1) // 2 - 1]


def test_matches_reference_and_outlier_robust(spark):
    tiles = {
        (10.0, 10.0): {0: 5, 1: 7, 2: 9, 3: 11, 4: 500},  # bot spike day 4
        (40.0, -100.0): {0: 20, 2: 14, 5: 8},  # gappy decline
        (-30.0, 60.0): {1: 3},  # single day -> excluded
    }
    got = {
        r["qk"]: (r["n_days"], r["n_pairs"], r["slope_mu"])
        for r in tile_theil_sen(_mk(spark, tiles), ZOOM).collect()
    }
    assert len(got) == 2
    wants = [
        _ref(tiles[(10.0, 10.0)]),
        _ref(tiles[(40.0, -100.0)]),
    ]
    assert sorted(got.values()) == sorted(wants)
    # robustness: the spike tile's median slope stays at the underlying
    # +2/day trend (least squares would report ~ +90/day)
    spike = _ref(tiles[(10.0, 10.0)])
    assert spike[2] == 2000


def test_negative_slope_floors_match_python(spark):
    # dc*1000 not divisible by dd: floor semantics must match // exactly
    tiles = {(0.0, 0.0): {0: 10, 3: 3}}  # slope -7/3 -> floor(-2333.33)
    [r] = tile_theil_sen(_mk(spark, tiles), ZOOM).collect()
    assert r["slope_mu"] == (-7 * 1000 + 10**9 * 3) // 3 - 10**9 == -2334


def test_plan_is_native(spark):
    df = _mk(spark, {(0.0, 0.0): {0: 1, 1: 2}})
    plan = (
        tile_theil_sen(df, ZOOM)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_randomized_differential(spark):
    """Seeded random tile/day/count tables vs the pure-python
    reference — full (n_days, n_pairs, median) equality per tile."""
    rng = np.random.default_rng(20260821)
    tiles = {}
    centers = [(5.0, 5.0), (50.0, 120.0), (-45.0, -60.0), (70.0, 179.0)]
    for la, ln in centers:
        nd = int(rng.integers(2, 9))
        days = sorted(rng.choice(40, size=nd, replace=False).tolist())
        tiles[(la, ln)] = {int(d): int(rng.integers(1, 30)) for d in days}
    got = {
        r["qk"]: (r["n_days"], r["n_pairs"], r["slope_mu"])
        for r in tile_theil_sen(_mk(spark, tiles), ZOOM).collect()
    }
    want = sorted(_ref(d) for d in tiles.values())
    assert sorted(got.values()) == want
