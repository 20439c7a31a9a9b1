"""Equi-depth curve layout tests: pandas replay differential, balance
and disjoint-range invariants, Hilbert-cell-id path, count safety."""

import numpy as np
import pandas as pd

from geo_spark.kernel import cellid as ck
from geo_spark.operators.layout import equidepth_layout, layout_manifest


def _replay(keys: list[int], p: int) -> dict[int, int]:
    """key -> part_id via the documented rule, in pandas."""
    s = pd.Series(keys).value_counts().sort_index()
    before = s.cumsum().shift(fill_value=0)
    total = int(s.sum())
    return {int(k): int(before[k] * p) // total for k in s.index}


def test_layout_matches_pandas_replay(spark):
    rng = np.random.default_rng(20260820)
    keys = rng.integers(0, 50, 1000).tolist()  # heavy duplication
    df = spark.createDataFrame(
        [(i, int(k)) for i, k in enumerate(keys)], "rid long, k long"
    )
    got = {
        r["rid"]: r["part_id"]
        for r in equidepth_layout(df, "k", 7).collect()
    }
    want = _replay(keys, 7)
    assert len(got) == 1000  # every row assigned exactly once
    for i, k in enumerate(keys):
        assert got[i] == want[k], (i, k)


def test_manifest_ranges_disjoint_and_balanced(spark):
    rng = np.random.default_rng(7)
    # one hot key holding ~20% of rows: equi-depth must absorb it
    keys = np.concatenate(
        [rng.integers(0, 10_000, 4000), np.full(1000, 5_000)]
    )
    df = spark.createDataFrame(
        [(int(i), int(k)) for i, k in enumerate(keys)], "rid long, k long"
    )
    assigned = equidepth_layout(df, "k", 8)
    man = sorted(
        layout_manifest(assigned, "k").collect(), key=lambda r: r["part_id"]
    )
    assert sum(r["n_rows"] for r in man) == 5000
    max_mult = 1000 + int((keys == 5000).sum() - 1000)
    for a, b in zip(man, man[1:]):
        assert a["max_key"] < b["min_key"]  # disjoint, ordered ranges
    for r in man:
        assert r["n_rows"] <= 5000 // 8 + max_mult  # depth + hot-key bound
        # every partition except a hot-key one is near target
    near = [r for r in man if r["n_rows"] <= 5000 // 8 + 64]
    assert len(near) >= 6


def test_layout_on_hilbert_cell_ids(spark):
    """S2 leaf cell ids are Hilbert-curve positions, so the layout is
    spatially contiguous: partition ranges must be disjoint and every
    point's part id monotone in its cell id."""
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 500)
    lng = rng.uniform(-180, 180, 500)
    cells = [
        int(ck.to_signed(ck.cellid_from_latlng(lat[i], lng[i])))
        for i in range(500)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cells)], "rid long, cell long"
    )
    rows = equidepth_layout(df, "cell", 5).collect()
    by_cell = sorted((r["cell"], r["part_id"]) for r in rows)
    pids = [p for _, p in by_cell]
    assert pids == sorted(pids)  # monotone along the curve
    assert set(pids) == set(range(5))


def test_single_partition_and_errors(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "rid long, k long")
    got = equidepth_layout(df, "k", 1).collect()
    assert {r["part_id"] for r in got} == {0}
    import pytest

    with pytest.raises(ValueError):
        equidepth_layout(df, "k", 0)
