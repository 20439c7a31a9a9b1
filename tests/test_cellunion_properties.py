"""Property-based CellUnion algebra: normalize/union/intersection/
difference compared against brute-force leaf-set semantics (hypothesis
over random small cell sets)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu

# Universe: cells on face 0 at levels 0..4, identified by their leaf-range
# at granularity level G.
G = 4
FACE0 = 0 << 61 | 1 << 60


def _cells_strategy():
    def make_cell(seed: int, lvl: int) -> int:
        # pick a deterministic descendant of face 0 at the level
        begin = cu._range_min(FACE0)
        size = 1 << (2 * (30 - lvl))
        count = 4**lvl
        idx = seed % count
        leaf = begin + idx * size
        return cu._parent(leaf, lvl)

    cell = st.builds(
        make_cell, st.integers(min_value=0, max_value=255), st.integers(0, G)
    )
    return st.lists(cell, min_size=0, max_size=8)


def _leaves(cells: list[int]) -> set[int]:
    """Granularity-G descendant set of the union."""
    out: set[int] = set()
    for c in cells:
        lvl = cu._level(c)
        if lvl > G:
            c = cu._parent(c, G)
            lvl = G
        for d in cu.denormalize([c], G, 1):
            out.add(d)
    return out


@settings(max_examples=200, deadline=None)
@given(_cells_strategy())
def test_normalize_preserves_leafset(cells):
    norm = cu.normalize(cells)
    assert _leaves(norm) == _leaves(cells)
    # normalized: sorted, disjoint, no 4 siblings
    assert norm == sorted(norm)
    for i in range(len(norm) - 1):
        assert cu._range_max(norm[i]) < cu._range_min(norm[i + 1])
    for i in range(len(norm) - 3):
        assert not cu.are_siblings(norm[i], norm[i + 1], norm[i + 2], norm[i + 3])


@settings(max_examples=200, deadline=None)
@given(_cells_strategy(), _cells_strategy())
def test_setops_match_leafsets(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert _leaves(cu.union(a, b)) == la | lb
    assert _leaves(cu.intersection(cu.normalize(a), cu.normalize(b))) == la & lb
    assert _leaves(cu.difference(a, b)) == la - lb


@settings(max_examples=100, deadline=None)
@given(_cells_strategy())
def test_contains_intersects_cellid(cells):
    norm = cu.normalize(cells)
    leaves = _leaves(cells)
    for seed in (0, 7, 63, 200):
        probe = cu._parent(cu._range_min(FACE0) + seed * (1 << (2 * (30 - G))), G)
        assert cu.contains_cellid(norm, probe) == (probe in leaves)
        assert cu.intersects_cellid(norm, probe) == (probe in leaves)
