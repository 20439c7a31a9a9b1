"""geo_sessionize differential vs a sequential numpy replay, plus the
one-shuffle plan contract (the session aggregate must reuse the lag
window's user partitioning)."""

from __future__ import annotations

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.regions import chord2_from_angle
from geo_spark.operators.sessionize import geo_sessionize


def _numpy_sessions(users, ts_us, lat, lng, gap_s, jump_rad):
    x, y, z = ck.latlng_to_xyz(lat, lng)
    p = np.stack([x, y, z], axis=1)
    gap_us = int(round(gap_s * 1_000_000))
    jump2 = chord2_from_angle(jump_rad)
    out = {}
    for u in np.unique(users):
        idx = np.nonzero(users == u)[0]
        idx = idx[np.lexsort((idx, ts_us[idx]))]
        sid = 0
        cur = None
        for k, i in enumerate(idx):
            brk = True
            hop = 0.0
            if k > 0:
                j = idx[k - 1]
                h2 = float(((p[i] - p[j]) ** 2).sum())
                brk = (ts_us[i] - ts_us[j] > gap_us) or (h2 > jump2)
                hop = 0.0 if brk else 2.0 * np.arcsin(np.sqrt(h2) / 2.0)
            if brk:
                sid += 1
                cur = out.setdefault(
                    (int(u), sid),
                    {"n": 0, "start": np.inf, "end": -np.inf, "travel": 0.0},
                )
            cur["n"] += 1
            cur["start"] = min(cur["start"], int(ts_us[i]))
            cur["end"] = max(cur["end"], int(ts_us[i]))
            cur["travel"] += hop
    return {
        k: (v["n"], int(v["start"]), int(v["end"]), round(v["travel"], 6))
        for k, v in out.items()
    }


def test_matches_numpy(spark):
    rng = np.random.default_rng(19)
    n = 1200
    users = rng.integers(0, 15, n)
    ts = np.sort(rng.integers(0, 40 * 86400_000_000, n))
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    rows = [
        (int(i), int(users[i]), int(ts[i]), float(lat[i]), float(lng[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, lat double, lng double"
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["start_us"],
            r["end_us"],
            round(r["travel"], 6),
        )
        for r in geo_sessionize(
            df, 6 * 3600.0, 2.5, tiebreak_col="event_id"
        ).collect()
    }
    want = _numpy_sessions(users, ts, lat, lng, 6 * 3600.0, 2.5)
    assert got == want
    assert len(want) > 100  # non-trivial segmentation


def test_single_shuffle_plan(spark):
    rows = [(int(i), int(i % 3), int(i) * 1000, 0.0, float(i)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, lat double, lng double"
    )
    out = geo_sessionize(df, 3600.0, 2.5, tiebreak_col="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # one hash exchange (the window's, reused by the aggregate) and no
    # Python eval node anywhere
    assert final.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in final and "MapInArrow" not in final
