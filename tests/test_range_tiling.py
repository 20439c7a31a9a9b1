"""Hilbert traversal + range tiling: Next/Prev/Advance, MaxTile,
CellUnionFromRange — property-tested per s2/cellunion_test.go semantics,
and the native SQL twins differentially against the kernel."""

from __future__ import annotations

import numpy as np
import pytest

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu


def _rand_leaves(n, seed):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-85, 85, n)
    lng = rng.uniform(-180, 180, n)
    return ck.cellid_from_latlng(lat, lng)


def test_advance_next_prev_consistency():
    ids = ck.parent(_rand_leaves(200, 1), 12)
    assert np.array_equal(ck.advance(ids, 1), ck.next_cell(ids))
    assert np.array_equal(ck.advance(ids, -1), ck.prev_cell(ids))
    assert np.array_equal(ck.advance(ck.advance(ids, 9), -9), ids)
    assert np.array_equal(ck.level(ck.advance(ids, 3)), ck.level(ids))


def test_advance_clamps_at_curve_ends():
    first = ck.parent(
        ck.cellid_from_face_ij(np.array([0]), np.array([0]), np.array([0])), 0
    )
    assert int(ck.advance(first, -100)[0]) == int(first[0])
    last = ck.parent(
        ck.cellid_from_face_ij(
            np.array([5]), np.array([2**30 - 1]), np.array([2**30 - 1])
        ),
        0,
    )
    # clamps to the one-past-the-end sentinel (wrapOffset + lsb)
    end = (6 << 61) + (1 << 60)
    assert int(ck.advance(last, 10**15)[0]) == end


def _check_range(a: int, b: int):
    tiles = cu.cellunion_from_range(a, b)
    cur = a
    for t in tiles:
        arr = np.array([t], dtype=np.uint64)
        assert int(ck.range_min(arr)[0]) == cur
        cur = int(ck.range_max(arr)[0]) + 2  # leaf ids step by 2
        lvl = int(ck.level(arr)[0])
        if lvl > 0:
            p = np.array([int(ck.parent(arr, lvl - 1)[0])], dtype=np.uint64)
            # maximality: the parent would overrun the range
            assert (
                int(ck.range_min(p)[0]) != int(ck.range_min(arr)[0])
                or int(ck.range_max(p)[0]) >= b
            )
    assert cur == b


def test_cellunion_from_range_tiles_exactly():
    leaves = _rand_leaves(60, 7)
    for i in range(0, 60, 2):
        a, b = sorted((int(leaves[i]), int(leaves[i + 1])))
        _check_range(a, int(ck.next_cell(b)[0]))


def test_cellunion_from_range_whole_cell():
    # the range of one cell must tile back to exactly that cell
    for lvl in (0, 3, 11):
        c = np.array([int(ck.parent(_rand_leaves(1, lvl + 13), lvl)[0])], dtype=np.uint64)
        a = int(ck.range_min(c)[0])
        b = int(ck.range_max(c)[0]) + 2
        assert cu.cellunion_from_range(a, b) == [int(c[0])]


def test_empty_and_degenerate_ranges():
    leaf = int(_rand_leaves(1, 99)[0])
    assert cu.cellunion_from_range(leaf, leaf) == []
    nxt = int(ck.next_cell(leaf)[0])
    assert cu.cellunion_from_range(leaf, nxt) == [leaf]


def test_sql_traversal_matches_kernel(spark):
    from pyspark.sql import functions as F

    from geo_spark.functions import sql as s2sql

    ids_u = ck.parent(_rand_leaves(500, 21), 9)
    ids_s = [int(x) for x in ck.to_signed(ids_u)]
    df = spark.createDataFrame([(i,) for i in ids_s], "cid long").select(
        "cid",
        s2sql.next_cell(F.col("cid")).alias("nxt"),
        s2sql.prev_cell(F.col("cid")).alias("prv"),
        s2sql.advance(F.col("cid"), F.lit(17)).alias("adv"),
    )
    rows = {r["cid"]: r for r in df.collect()}
    exp_n = ck.to_signed(ck.next_cell(ids_u))
    exp_p = ck.to_signed(ck.prev_cell(ids_u))
    exp_a = ck.to_signed(ck.advance(ids_u, 17))
    for k, s in enumerate(ids_s):
        assert rows[s]["nxt"] == int(exp_n[k])
        assert rows[s]["prv"] == int(exp_p[k])
        assert rows[s]["adv"] == int(exp_a[k])
