"""Stay-point detection: semantics pins + brute-force differential."""

import math
import random

import pytest
from pyspark.sql import functions as F

from geo_spark.operators.staypoints import EARTH_RADIUS_M, stay_points


def _brute(rows, radius_m, min_dwell_s, min_pings):
    """Reference replay of the consecutive-ping segmentation."""
    chord = 2.0 * math.sin(min(radius_m / EARTH_RADIUS_M, math.pi) / 2.0)
    th = chord * chord
    by_traj = {}
    for t, ts, lat, lng in rows:
        by_traj.setdefault(t, []).append((ts, lat, lng))
    out = []
    for t, pings in by_traj.items():
        pings.sort()
        seg, prev = 0, None
        groups = {}
        for ts, lat, lng in pings:
            p = (
                math.cos(math.radians(lng)) * math.cos(math.radians(lat)),
                math.sin(math.radians(lng)) * math.cos(math.radians(lat)),
                math.sin(math.radians(lat)),
            )
            if prev is None or sum((a - b) ** 2 for a, b in zip(p, prev)) > th:
                seg += 1
            prev = p
            groups.setdefault(seg, []).append((ts, lat, lng))
        for s, g in groups.items():
            ts0, ts1 = g[0][0], g[-1][0]
            if len(g) >= min_pings and ts1 - ts0 >= min_dwell_s:
                out.append((t, s, len(g), ts0, ts1))
    return sorted(out)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "traj_id long, ts_s long, lat double, lng double"
    )


def test_basic_dwell_then_move(spark):
    rows = []
    # traj 0: 6 pings jittering ~20m around (10,10) for 10 min,
    # then 5 pings each 5km apart
    for i in range(6):
        rows.append((0, 120 * i, 10.0 + 2e-4 * (i % 2), 10.0 - 1e-4 * (i % 3)))
    for i in range(5):
        rows.append((0, 720 + 60 * i, 10.0 + 0.05 * (i + 1), 10.0))
    out = stay_points(
        _df(spark, rows), radius_m=1000.0, min_dwell_s=300, min_pings=4
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pings"] == 6 and r["dwell_s"] == 600
    assert r["lat"] == pytest.approx(10.0, abs=1e-3)
    assert r["lng"] == pytest.approx(10.0, abs=1e-3)


def test_slow_drift_stays_one_segment(spark):
    # 400m steps under a 1km break radius: one segment even though the
    # endpoints are ~4km apart (consecutive-ping semantics, documented)
    rows = [(1, 60 * i, 10.0 + 0.0036 * i, 20.0) for i in range(11)]
    out = stay_points(
        _df(spark, rows), radius_m=1000.0, min_dwell_s=300, min_pings=4
    ).collect()
    assert len(out) == 1 and out[0]["n_pings"] == 11


def test_short_dwell_filtered(spark):
    rows = [(2, 10 * i, 30.0, 30.0) for i in range(4)]  # only 30s
    out = stay_points(
        _df(spark, rows), radius_m=500.0, min_dwell_s=300, min_pings=4
    ).collect()
    assert out == []


def test_antimeridian_dwell(spark):
    # pings straddling lng=180: xyz chord ignores the wrap
    rows = [
        (3, 100 * i, 0.0, (179.9995 if i % 2 == 0 else -179.9995))
        for i in range(5)
    ]
    out = stay_points(
        _df(spark, rows), radius_m=1000.0, min_dwell_s=300, min_pings=4
    ).collect()
    assert len(out) == 1 and out[0]["n_pings"] == 5


def test_random_differential(spark):
    rng = random.Random(20260820)
    rows = []
    for t in range(12):
        lat = rng.uniform(-55, 55)
        lng = rng.uniform(-170, 170)
        ts = 0
        for _ in range(rng.randrange(5, 40)):
            ts += rng.randrange(30, 240)
            if rng.random() < 0.35:  # jump
                lat = rng.uniform(-55, 55)
                lng = rng.uniform(-170, 170)
            else:  # jitter < 100m
                lat += rng.uniform(-5e-4, 5e-4)
                lng += rng.uniform(-5e-4, 5e-4)
            rows.append((t, ts, lat, lng))
    got = sorted(
        (r["traj"], r["seg"], r["n_pings"], r["t_start"], r["t_end"])
        for r in stay_points(
            _df(spark, rows), radius_m=2000.0, min_dwell_s=240, min_pings=3
        ).collect()
    )
    assert got == _brute(rows, 2000.0, 240, 3)
    assert len(got) > 5  # fixture actually produces stays


def test_tie_break_column(spark):
    # same ts twice: id_col makes the order (and thus segmentation)
    # deterministic
    rows = [(9, 0, 0.0, 0.0, 1), (9, 0, 50.0, 50.0, 2), (9, 60, 0.0, 0.0, 3)]
    df = spark.createDataFrame(
        rows, "traj_id long, ts_s long, lat double, lng double, ping_id long"
    )
    out = stay_points(
        df, radius_m=1000.0, min_dwell_s=0, min_pings=1, id_col="ping_id"
    )
    segs = {r["ping_id"]: None for r in []}  # noqa: F841 (readability)
    got = sorted((r["seg"], r["n_pings"]) for r in out.collect())
    # three pings -> three segments (each jump breaks), all kept at
    # min_pings=1/min_dwell=0
    assert got == [(1, 1), (2, 1), (3, 1)]


def test_plan_native_and_single_window(spark):
    df = _df(spark, [(0, 0, 1.0, 1.0), (0, 60, 1.0, 1.0)])
    plan = (
        stay_points(df, 500.0)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # two Window nodes (lags, running break-sum) sharing ONE
    # partitioning and sort: the trajectory shuffle happens once
    assert plan.count("Window [") == 2
    assert plan.count("Sort [") == 1
