"""kNN differential tests: ring expansion must equal the brute path, and
the brute path must equal a numpy all-pairs oracle."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.operators.knn import _knn_brute, _knn_ring


def _mk_points(spark, n, seed):
    rng = np.random.default_rng(seed)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    rows = [(int(i), float(lat[i]), float(lng[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, "pid long, lat double, lng double"),
        lat,
        lng,
    )


def _numpy_oracle(plat, plng, tlat, tlng, k):
    px, py, pz = ck.latlng_to_xyz(plat, plng)
    tx, ty, tz = ck.latlng_to_xyz(tlat, tlng)
    p = np.stack([px, py, pz], axis=1)
    t = np.stack([tx, ty, tz], axis=1)
    d = p[:, None, :] - t[None, :, :]
    chord2 = np.minimum((d * d).sum(axis=2), 4.0)
    tids = np.arange(len(tlat))
    order = np.lexsort((np.broadcast_to(tids, chord2.shape), chord2), axis=1)
    out = set()
    for pid in range(len(plat)):
        for rank, tix in enumerate(order[pid, :k], 1):
            out.add((pid, int(tix), rank))
    return out


@pytest.mark.parametrize("k", [1, 3])
def test_brute_matches_numpy(spark, k):
    pts, plat, plng = _mk_points(spark, 500, 1)
    tg, tlat, tlng = _mk_points(spark, 40, 2)
    tg = tg.withColumnRenamed("pid", "tid")
    got = {
        (r["pid"], r["tid"], r["rank"])
        for r in _knn_brute(
            pts, tg, k, "pid", "tid", ("lat", "lng"), ("lat", "lng")
        ).collect()
    }
    assert got == _numpy_oracle(plat, plng, tlat, tlng, k)


def test_ring_matches_brute(spark):
    k = 3
    pts, plat, plng = _mk_points(spark, 300, 3)
    tg, tlat, tlng = _mk_points(spark, 250, 4)
    tg = tg.withColumnRenamed("pid", "tid")
    brute = _numpy_oracle(plat, plng, tlat, tlng, k)
    ring = {
        (r["pid"], r["tid"], r["rank"])
        for r in _knn_ring(
            pts,
            tg,
            k,
            "pid",
            "tid",
            ("lat", "lng"),
            ("lat", "lng"),
            level=3,
            max_rounds=24,
        ).collect()
    }
    assert ring == brute
