"""Spark surface of the DTW alignment operators: batch results must equal
the kernel run locally, and the medoid groupBy must match brute force."""

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.alignment import exact_alignment_cost
from geo_spark.operators.alignment_ops import dtw_medoid_per_group, dtw_pair_costs


def _chain(rng, n):
    lat0 = rng.uniform(-60, 60)
    lng0 = rng.uniform(-170, 170)
    lat = lat0 + rng.normal(scale=0.05, size=n).cumsum()
    lng = lng0 + rng.normal(scale=0.05, size=n).cumsum()
    x, y, z = ck.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1), lat, lng


def test_dtw_pair_costs_matches_kernel(spark):
    rng = np.random.default_rng(3)
    chains = {}
    for gid in range(6):
        chains[gid], _, _ = _chain(rng, int(rng.integers(5, 40)))
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pdf = spark.createDataFrame(pairs, "aid long, bid long")
    got = {
        (r["aid"], r["bid"]): r["dtw_cost"]
        for r in dtw_pair_costs(pdf, chains).collect()
    }
    assert len(got) == len(pairs)
    for a, b in pairs:
        want = exact_alignment_cost(chains[a], chains[b])
        assert got[(a, b)] == pytest.approx(want, abs=1e-12)


def test_dtw_medoid_per_group(spark):
    rng = np.random.default_rng(7)
    rows = []
    want = {}
    for grp in ("ga", "gb"):
        base, lat, lng = _chain(rng, 24)
        chains = []
        for tid in range(4):
            dlat = lat + rng.normal(scale=0.01 * (tid + 1), size=len(lat))
            dlng = lng + rng.normal(scale=0.01 * (tid + 1), size=len(lng))
            x, y, z = ck.latlng_to_xyz(dlat, dlng)
            chains.append(np.stack([x, y, z], axis=1))
            for seq, (la, ln) in enumerate(zip(dlat, dlng)):
                rows.append((grp, tid, seq, float(la), float(ln)))
        # brute-force expected medoid with the exact kernel
        k = len(chains)
        totals = np.zeros(k)
        for i in range(k):
            for j in range(i + 1, k):
                c = exact_alignment_cost(chains[i], chains[j])
                totals[i] += c
                totals[j] += c
        want[grp] = int(np.argmin(totals))
    df = spark.createDataFrame(
        rows, "group string, traj_id long, seq long, lat double, lng double"
    )
    got = {
        r["group"]: r["medoid_traj_id"]
        for r in dtw_medoid_per_group(df, radius=None).collect()
    }
    assert got == want
