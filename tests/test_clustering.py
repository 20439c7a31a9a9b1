"""geo_dbscan differential: the distributed banded-join + CC pipeline
must match a brute-force replay of the deterministic DBSCAN definition
(core = degree >= min_pts - 1, clusters = CC of core-core eps-graph
keyed by min core id, border = min-rep core neighbor, noise omitted)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_spark.kernel.cellid import latlng_to_xyz
from geo_spark.operators.clustering import geo_dbscan, within_distance_pairs


def _brute_dbscan(ids, lats, lngs, eps_rad, min_pts):
    x, y, z = latlng_to_xyz(lats, lngs)
    p = np.stack([x, y, z], axis=1)
    limit2 = (2.0 * math.sin(eps_rad / 2.0)) ** 2
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
    adj = (d2 <= limit2) & ~np.eye(len(p), dtype=bool)
    deg = adj.sum(axis=1)
    core = deg >= min_pts - 1
    # CC over core-core edges by repeated min-label propagation
    lbl = {int(ids[i]): int(ids[i]) for i in range(len(p)) if core[i]}
    for _ in range(len(p)):
        changed = False
        for i in range(len(p)):
            if not core[i]:
                continue
            for j in np.nonzero(adj[i] & core)[0]:
                m = min(lbl[int(ids[i])], lbl[int(ids[j])])
                if lbl[int(ids[i])] != m or lbl[int(ids[j])] != m:
                    lbl[int(ids[i])] = lbl[int(ids[j])] = m
                    changed = True
        if not changed:
            break
    out = {k: (v, "core") for k, v in lbl.items()}
    for i in range(len(p)):
        if core[i]:
            continue
        reps = [lbl[int(ids[j])] for j in np.nonzero(adj[i] & core)[0]]
        if reps:
            out[int(ids[i])] = (min(reps), "border")
    return out


def _mk_points(n, seed):
    rng = np.random.default_rng(seed)
    # three dense blobs + uniform background: all three roles appear
    blob_c = [(0.0, 0.0), (1.5, 1.5), (-1.2, 0.8)]
    lats, lngs = [], []
    for bl, bg in blob_c:
        lats.extend(bl + 0.08 * rng.standard_normal(n // 5))
        lngs.extend(bg + 0.08 * rng.standard_normal(n // 5))
    lats.extend(rng.uniform(-3, 3, n - 3 * (n // 5)))
    lngs.extend(rng.uniform(-3, 3, n - 3 * (n // 5)))
    return np.arange(len(lats), dtype=np.int64), np.array(lats), np.array(lngs)


@pytest.mark.parametrize("min_pts", [3, 5])
def test_dbscan_matches_brute(spark, min_pts):
    ids, lats, lngs = _mk_points(150, seed=5)
    eps = math.radians(0.12)
    df = spark.createDataFrame(
        list(zip(ids.tolist(), lats.tolist(), lngs.tolist())),
        "event_id long, lat double, lng double",
    )
    got = {
        int(r["event_id"]): (int(r["cluster"]), r["role"])
        for r in geo_dbscan(df, eps, min_pts, key="event_id").collect()
    }
    want = _brute_dbscan(ids, lats, lngs, eps, min_pts)
    assert got == want
    # sanity: the fixture exercises every branch
    roles = {v[1] for v in want.values()}
    assert roles == {"core", "border"}
    assert len(want) < len(ids)  # noise exists
    assert len({v[0] for v in want.values() if v[1] == "core"}) >= 2


def test_within_distance_pairs_matches_brute(spark):
    ids, lats, lngs = _mk_points(120, seed=9)
    eps = math.radians(0.15)
    df = spark.createDataFrame(
        list(zip(ids.tolist(), lats.tolist(), lngs.tolist())),
        "event_id long, lat double, lng double",
    )
    got = {
        (int(r["a"]), int(r["b"]))
        for r in within_distance_pairs(df, eps, key="event_id").collect()
    }
    x, y, z = latlng_to_xyz(lats, lngs)
    p = np.stack([x, y, z], axis=1)
    limit2 = (2.0 * math.sin(eps / 2.0)) ** 2
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(p))
        for j in range(i + 1, len(p))
        if d2[i, j] <= limit2
    }
    assert got == want
