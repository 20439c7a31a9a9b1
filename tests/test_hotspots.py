"""Gi* / Moran's I over mercator tile lattices.

Statistical ground truths are computed with a brute-force numpy
replica of the textbook formulas (Getis & Ord 1992; Moran 1950) over
the SAME occupied-tile study region, so the tests certify the
relational decomposition (explode-offset neighbor join + exact integer
moments), not a re-derivation of the same Spark code.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.operators.hotspots import gi_star, morans_i, tile_counts


def _brute_gi(cells, include_self=True):
    """cells: dict {(x,y): v} -> dict {(x,y): z} queen weights."""
    keys = sorted(cells)
    v = np.array([cells[k] for k in keys], dtype=np.float64)
    n = len(keys)
    mean = v.sum() / n
    s = math.sqrt((v * v).sum() / n - mean * mean)
    out = {}
    for k in keys:
        nbr = [
            (dx, dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if include_self or (dx, dy) != (0, 0)
        ]
        hits = [
            cells[(k[0] + dx, k[1] + dy)]
            for dx, dy in nbr
            if (k[0] + dx, k[1] + dy) in cells
        ]
        sumw = len(hits)
        sumwx = float(sum(hits))
        denom = s * math.sqrt((n * sumw - sumw * sumw) / (n - 1))
        out[k] = (sumwx - mean * sumw) / denom
    return out


def _brute_moran(cells):
    keys = sorted(cells)
    v = np.array([cells[k] for k in keys], dtype=np.float64)
    n = len(keys)
    mean = v.mean()
    num = 0.0
    w = 0
    for k in keys:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                j = (k[0] + dx, k[1] + dy)
                if j in cells:
                    w += 1
                    num += (cells[k] - mean) * (cells[j] - mean)
    den = ((v - mean) ** 2).sum()
    return (n / w) * num / den, w


def _tiles_df(spark, cells):
    return spark.createDataFrame(
        [(int(x), int(y), int(v)) for (x, y), v in cells.items()], "x long, y long, v long"
    )


CELLS = {
    # a hot 3x3 block around (5,5), a cold strip, scattered singles —
    # interior tiles, no wrap interaction at zoom 4 (lattice 16x16)
    **{(5 + dx, 5 + dy): 40 + 3 * dx + dy for dx in (-1, 0, 1) for dy in (-1, 0, 1)},
    (10, 2): 1,
    (11, 2): 2,
    (12, 2): 1,
    (2, 12): 5,
    (3, 12): 4,
    (14, 8): 7,
    (1, 1): 3,
    (8, 14): 2,
}


def test_gi_star_matches_brute(spark):
    got = {
        (r["x"], r["y"]): r["z"]
        for r in gi_star(_tiles_df(spark, CELLS), zoom=4).collect()
    }
    want = _brute_gi(CELLS)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_gi_star_hot_block_is_hottest(spark):
    got = {
        (r["x"], r["y"]): r["z"]
        for r in gi_star(_tiles_df(spark, CELLS), zoom=4).collect()
    }
    assert max(got, key=got.get) == (5, 5)
    assert got[(5, 5)] > 2.0  # statistically hot
    assert got[(10, 2)] < 0.0  # the cold strip sits below the mean


def test_morans_i_matches_brute(spark):
    row = morans_i(_tiles_df(spark, CELLS), zoom=4).collect()[0]
    want_i, want_w = _brute_moran(CELLS)
    assert row["w"] == want_w
    assert row["i"] == pytest.approx(want_i, rel=1e-12)
    # clustered values -> strong positive autocorrelation
    assert row["i"] > 0.2


def test_morans_i_checkerboard_negative(spark):
    cells = {
        (x, y): (50 if (x + y) % 2 == 0 else 1)
        for x in range(4, 8)
        for y in range(4, 8)
    }
    row = morans_i(_tiles_df(spark, cells), zoom=4).collect()[0]
    want_i, _ = _brute_moran(cells)
    assert row["i"] == pytest.approx(want_i, rel=1e-12)
    # queen weights dilute the checkerboard (diagonals share color),
    # but the sign is still negative
    assert row["i"] < 0.0


def test_x_wraparound_joins_antimeridian_neighbors(spark):
    # zoom 2: lattice 0..3; x=0 and x=3 are longitude neighbors
    cells = {(0, 1): 10, (3, 1): 20}
    got = {
        (r["x"], r["y"]): (r["sumw"], r["sumwx"])
        for r in gi_star(_tiles_df(spark, cells), zoom=2).collect()
    }
    # each sees itself AND the wrapped partner
    assert got[(0, 1)] == (2, 30)
    assert got[(3, 1)] == (2, 30)


def test_no_y_wrap_at_pole_rows(spark):
    cells = {(1, 0): 10, (1, 3): 20, (2, 0): 5}
    got = {
        (r["x"], r["y"]): r["sumw"]
        for r in gi_star(_tiles_df(spark, cells), zoom=2).collect()
    }
    # (1,0) sees itself + (2,0); nothing above y=0, nothing at y=3
    assert got[(1, 0)] == 2
    # (1,3) is alone (y=3 is the bottom row; no wrap to y=0)
    assert got[(1, 3)] == 1


def test_tile_counts_sum_mode(spark):
    df = spark.createDataFrame(
        [(10.0, 10.0, 3), (10.2, 10.2, 4), (40.0, 100.0, 5)],
        "lat double, lng double, value long",
    )
    out = {
        (r["x"], r["y"]): r["v"]
        for r in tile_counts(df, 4, value_col="value").collect()
    }
    assert sum(out.values()) == 12
    assert len(out) == 2  # two distinct tiles, first two points share one


def test_plan_is_native(spark):
    """No Python evaluation nodes anywhere in the Gi* plan."""
    tiles = _tiles_df(spark, CELLS)
    plan = gi_star(tiles, 4)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def _brute_mk_over(vals):
    """Mann-Kendall decision over a day-ordered value list (the
    tiling.tile_mann_kendall integer spec, z_mu=1960)."""
    from collections import Counter

    n = len(vals)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (vals[j] > vals[i]) - (vals[j] < vals[i])
    tie = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(vals).values()
    )
    w = n * (n - 1) * (2 * n + 5) - tie
    c = math.isqrt(18 * 1960 * 1960 * w) // 18 // 1000
    if s > 0 and s - 1 > c:
        return s, c, 1
    if s < 0 and -s - 1 > c:
        return s, c, -1
    return s, c, 0


def _daily_df(spark, cube):
    """cube: {(x, y): {day: v}} -> (x, y, day, v) df."""
    rows = [
        (int(x), int(y), int(d), int(v))
        for (x, y), days in cube.items()
        for d, v in days.items()
    ]
    return spark.createDataFrame(rows, "x long, y long, day long, v long")


def test_gi_star_daily_matches_per_day_brute(spark):
    """Each day's z must equal the whole-period gi_star brute replica
    run on that day's slice alone."""
    from geo_spark.operators.hotspots import gi_star_daily

    cube = {
        (3, 3): {0: 30, 1: 35, 2: 42},
        (3, 4): {0: 25, 1: 30, 2: 38},
        (4, 3): {0: 22, 2: 30},
        (8, 8): {0: 2, 1: 2, 2: 3},
        (9, 9): {0: 1, 1: 2, 2: 1},
        (12, 2): {1: 4},
        (1, 12): {0: 3, 1: 3, 2: 2},
    }
    got = {
        (r["x"], r["y"], r["day"]): r["z"]
        for r in gi_star_daily(_daily_df(spark, cube), 4).collect()
    }
    days = sorted({d for days in cube.values() for d in days})
    for d in days:
        cells = {
            k: days_[d] for k, days_ in cube.items() if d in days_
        }
        want = _brute_gi(cells, include_self=True)
        for k, wz in want.items():
            gz = got[(k[0], k[1], d)]
            if math.isnan(wz) or math.isinf(wz):
                assert gz is None
            else:
                assert gz == pytest.approx(wz, rel=1e-12), (k, d)


def test_emerging_hotspots_classes(spark):
    """End-to-end classification differential: per-day brute Gi* ->
    brute MK over each tile's z series -> the documented CASE, vs the
    operator — on a planted cube with an intensifying center, a
    cooling block, and background noise."""
    from geo_spark.operators.hotspots import (
        emerging_hotspots,
        gi_star_daily,
    )

    rng = np.random.default_rng(7)
    cube = {}
    days = list(range(8))
    # background: an 8x8 patch of mild noise
    for x in range(2, 10):
        for y in range(2, 10):
            cube[(x, y)] = {
                d: int(rng.integers(1, 6)) for d in days
            }
    # intensifying hotspot: center grows steadily
    for k in [(5, 5), (5, 6), (6, 5), (6, 6)]:
        cube[k] = {d: 10 + 12 * d for d in days}
    # waning hotspot: starts hot, decays
    for k in [(2, 2), (2, 3), (3, 2)]:
        cube[k] = {d: 120 - 14 * d for d in days}

    # points fixture: synthesize events whose tile_counts_daily equals
    # the cube (place v points at each tile center)
    rows = []
    n_tiles = 16
    for (x, y), dd in cube.items():
        # invert mercator tile -> a lat/lng interior to tile (x, y)
        lng = (x + 0.5) / n_tiles * 360.0 - 180.0
        yn = (y + 0.5) / n_tiles
        lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yn))))
        for d, v in dd.items():
            for i in range(v):
                rows.append((lat, lng, d * 86_400_000_000 + i))
    pts = spark.createDataFrame(rows, "lat double, lng double, ts_us long")

    got = {
        (r["x"], r["y"]): (
            r["n_days"],
            r["s_stat"],
            r["c_alpha"],
            r["trend"],
            r["n_hot"],
            r["hot_now"],
            r["class"],
        )
        for r in emerging_hotspots(pts, 4).collect()
    }

    # brute replica: per-day z from the SPARK gi_star_daily (the z tree
    # is certified against the textbook brute above; here we certify
    # the composition), then python MK + the CASE
    gz = {}
    for r in gi_star_daily(_daily_df(spark, cube), 4).collect():
        if r["z"] is not None:
            gz.setdefault((r["x"], r["y"]), {})[r["day"]] = r["z"]
    want = {}
    for k, series in gz.items():
        ds = sorted(series)
        if len(ds) < 2:
            continue
        vals = [series[d] for d in ds]
        s, c, trend = _brute_mk_over(vals)
        n_hot = sum(1 for z in vals if z > 1.96)
        hot_now = series[ds[-1]] > 1.96
        if hot_now and trend == 1:
            cls = "intensifying"
        elif hot_now and trend == -1:
            cls = "waning"
        elif hot_now:
            cls = "persistent"
        elif n_hot > 0:
            cls = "former"
        elif trend == 1:
            cls = "emerging"
        else:
            cls = "none"
        want[k] = (len(ds), s, c, trend, n_hot, hot_now, cls)
    assert got == want
    # the planted structures are actually detected
    assert got[(5, 5)][-1] == "intensifying"
    assert got[(2, 2)][-1] in ("waning", "former")
    classes = {cls for *_, cls in got.values()}
    assert "none" in classes  # background mostly unclassified


def test_emerging_hotspots_plan_is_native(spark):
    from geo_spark.operators.hotspots import emerging_hotspots

    pts = spark.createDataFrame(
        [(10.0, 10.0, i * 86_400_000_000) for i in range(3)],
        "lat double, lng double, ts_us long",
    )
    plan = (
        emerging_hotspots(pts, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
