"""Polyline chord-fraction resampling: python replay differential,
endpoint/degenerate pins, unit-sphere invariant."""

import math

import numpy as np
import pytest

from geo_spark.operators.resample import resample_polylines


def _replay(verts: list[tuple], m: int):
    """The documented left-fold / locate / clamp rule in plain python."""
    v = [np.array(p, float) for p in verts]
    seglen, cum = [], [0.0]
    for a, b in zip(v, v[1:]):
        d = b - a
        seglen.append(math.sqrt((d[0] * d[0] + d[1] * d[1]) + d[2] * d[2]))
        cum.append(cum[-1] + seglen[-1])
    total = cum[-1]
    out = []
    for j in range(m):
        t = (j * total) / (m - 1)
        s = next((i for i in range(len(seglen)) if cum[i + 1] >= t),
                 len(seglen) - 1)
        alpha = min((t - cum[s]) / seglen[s], 1.0) if seglen[s] > 0 else 0.0
        p = v[s] + alpha * (v[s + 1] - v[s])
        n = math.sqrt((p[0] * p[0] + p[1] * p[1]) + p[2] * p[2])
        out.append((j, s, p[0] / n, p[1] / n, p[2] / n))
    return out


def _df(spark, chains):
    rows = [
        (gid, i, float(p[0]), float(p[1]), float(p[2]))
        for gid, vs in chains.items()
        for i, p in enumerate(vs)
    ]
    return spark.createDataFrame(
        rows, "geom_id long, seq long, x double, y double, z double"
    )


def test_resample_matches_python_replay(spark):
    rng = np.random.default_rng(20260820)
    chains = {}
    for g in range(6):
        raw = rng.uniform(-1, 1, (4 + g % 3, 3))
        chains[g] = [tuple(p / np.linalg.norm(p)) for p in raw]
    got = {
        (r["geom_id"], r["j"]): (r["seg"], r["x"], r["y"], r["z"])
        for r in resample_polylines(_df(spark, chains), 9).collect()
    }
    for g, vs in chains.items():
        for j, s, x, y, z in _replay(vs, 9):
            assert got[(g, j)] == (s, x, y, z), (g, j)


def test_resample_endpoints_are_vertices(spark):
    chains = {0: [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]}
    got = sorted(
        resample_polylines(_df(spark, chains), 5).collect(),
        key=lambda r: r["j"],
    )
    assert (got[0]["x"], got[0]["y"], got[0]["z"]) == (1.0, 0.0, 0.0)
    assert (got[-1]["x"], got[-1]["y"], got[-1]["z"]) == (0.0, 0.0, 1.0)
    for r in got:
        assert r["x"] ** 2 + r["y"] ** 2 + r["z"] ** 2 == pytest.approx(1.0)


def test_resample_degenerate_segment_and_short_chain(spark):
    chains = {
        0: [(1.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
        1: [(0.0, 0.0, 1.0)],  # single vertex: no output
    }
    got = resample_polylines(_df(spark, chains), 3).collect()
    assert {r["geom_id"] for r in got} == {0}
    assert len(got) == 3
    by_j = {r["j"]: r for r in got}
    assert (by_j[0]["x"], by_j[0]["seg"]) == (1.0, 0)  # alpha-0 on len-0 seg


def test_resample_m_validation(spark):
    df = _df(spark, {0: [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0)]})
    with pytest.raises(ValueError):
        resample_polylines(df, 1)
    got = resample_polylines(df, 2).collect()
    assert sorted((r["j"], r["x"]) for r in got) == [(0, 1.0), (1, 0.0)]
