"""spacetime_join differential tests: the banded (cell, bucket)
equi-join must equal a numpy all-pairs oracle on every fixture,
including cube-corner clusters (asymmetric neighbor wrap) and
antimeridian/pole geometry."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.regions import chord2_from_angle
from geo_spark.operators.spacetime import spacetime_join, spacetime_level


def _oracle(lat, lng, ts_us, radius_rad, window_s):
    x, y, z = ck.latlng_to_xyz(lat, lng)
    p = np.stack([x, y, z], axis=1)
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
    dt = np.abs(ts_us[:, None] - ts_us[None, :])
    limit2 = chord2_from_angle(radius_rad)
    w_us = int(round(window_s * 1_000_000))
    hit = (d2 <= limit2) & (dt <= w_us)
    out = set()
    n = len(lat)
    for i in range(n):
        for j in range(i + 1, n):
            if hit[i, j]:
                out.add((i, j, int(ts_us[j] - ts_us[i])))
    return out


def _run(spark, lat, lng, ts_us, radius_rad, window_s, level=None):
    rows = [
        (int(i), float(lat[i]), float(lng[i]), int(ts_us[i]))
        for i in range(len(lat))
    ]
    df = spark.createDataFrame(
        rows, "event_id long, lat double, lng double, ts_us long"
    )
    got = {
        (r["a"], r["b"], r["dt_us"])
        for r in spacetime_join(
            df, radius_rad, window_s, key="event_id", ts_col="ts_us",
            level=level,
        ).collect()
    }
    return got


def test_uniform_sphere(spark):
    rng = np.random.default_rng(5)
    n = 400
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    ts = rng.integers(0, 86400_000_000, n)
    want = _oracle(lat, lng, ts, 0.2, 3600.0)
    assert len(want) > 0
    assert _run(spark, lat, lng, ts, 0.2, 3600.0) == want


def test_cube_corner_cluster(spark):
    # tight cluster across the (1,1,1) corner where faces 0/1/2 meet —
    # the clamped neighbor wrap is asymmetric there; the canonical
    # dedup must still produce each pair exactly once
    rng = np.random.default_rng(7)
    n = 250
    corner_lat = np.degrees(np.arctan(1.0 / np.sqrt(2.0)))
    lat = corner_lat + rng.uniform(-1.5, 1.5, n)
    lng = 45.0 + rng.uniform(-1.5, 1.5, n)
    ts = rng.integers(0, 7200_000_000, n)
    radius = 0.01
    want = _oracle(lat, lng, ts, radius, 900.0)
    assert len(want) > 0
    # force a finer level than the auto rule would dare
    got = _run(spark, lat, lng, ts, radius, 900.0,
               level=spacetime_level(radius))
    assert got == want


def test_antimeridian_and_poles(spark):
    rng = np.random.default_rng(9)
    n = 200
    lat = np.concatenate([
        rng.uniform(-5, 5, n // 2),        # antimeridian band
        rng.uniform(83, 90, n - n // 2),   # pole cap
    ])
    lng = np.concatenate([
        np.where(rng.random(n // 2) < 0.5, -180 + rng.uniform(0, 2, n // 2),
                 180 - rng.uniform(0, 2, n // 2)),
        rng.uniform(-180, 180, n - n // 2),
    ])
    ts = rng.integers(0, 86400_000_000, n)
    want = _oracle(lat, lng, ts, 0.05, 7200.0)
    assert len(want) > 0
    assert _run(spark, lat, lng, ts, 0.05, 7200.0) == want


def test_window_boundary_exact(spark):
    # pairs exactly AT the window boundary are included (<=), one
    # microsecond past are not
    lat = np.array([0.0, 0.0, 0.0])
    lng = np.array([0.0, 0.1, 0.2])
    ts = np.array([0, 60_000_000, 120_000_001])
    got = _run(spark, lat, lng, ts, 0.1, 60.0)
    assert (0, 1, 60_000_000) in got
    assert not any(a == 1 and b == 2 for a, b, _ in got)


def test_no_nested_loop_in_plan(spark):
    rng = np.random.default_rng(3)
    n = 50
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    ts = rng.integers(0, 86400_000_000, n)
    rows = [(int(i), float(lat[i]), float(lng[i]), int(ts[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "event_id long, lat double, lng double, ts_us long"
    )
    out = spacetime_join(df, 0.1, 3600.0, key="event_id", ts_col="ts_us")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


try:
    from hypothesis import given, settings, strategies as hst

    @settings(max_examples=12, deadline=None)
    @given(
        hst.floats(0.02, 0.5),
        hst.floats(300.0, 14400.0),
        hst.integers(0, 10),
    )
    def _fuzz_banding(radius, window_s, seed):
        spark = _fuzz_banding._spark
        rng = np.random.default_rng(seed)
        n = 150
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
        lng = rng.uniform(-180, 180, n)
        ts = rng.integers(0, 86400_000_000, n)
        want = _oracle(lat, lng, ts, radius, window_s)
        assert _run(spark, lat, lng, ts, radius, window_s) == want

    def test_fuzz_banding(spark):
        _fuzz_banding._spark = spark
        _fuzz_banding()
except ImportError:  # pragma: no cover
    pass
