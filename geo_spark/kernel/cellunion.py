"""CellUnion operations over plain Python int lists of uint64 cell ids.

Re-derived from s2/cellunion.go: Normalize (sort, drop contained, merge 4
siblings, :196-238), Denormalize (:272-293), set ops (:52-147), range
containment (:241-265), ExpandAtLevel (:456-501).  These run per-geometry
inside applyInPandas; the bulk join path uses the exploded table form
instead (operators/spatial_join.py).
"""

from __future__ import annotations

from geo_spark.kernel import cellid as ck

MAX_LEVEL = ck.MAX_LEVEL
_MASK64 = (1 << 64) - 1


def _lsb(cid: int) -> int:
    return cid & (-cid & _MASK64)


def _level(cid: int) -> int:
    lsb = _lsb(cid)
    return MAX_LEVEL - (lsb.bit_length() - 1) // 2


def _parent(cid: int, level: int) -> int:
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return (cid & (-lsb & _MASK64)) | lsb


def _range_min(cid: int) -> int:
    return cid - (_lsb(cid) - 1)


def _range_max(cid: int) -> int:
    return cid + (_lsb(cid) - 1)


def _is_face(cid: int) -> bool:
    return _lsb(cid) == 1 << 60


def _contains(a: int, b: int) -> bool:
    return _range_min(a) <= b <= _range_max(a)


def are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """Whether the four cells are the children of one parent;
    s2/cellunion.go:373-391 (xor + high-bits-mask trick)."""
    if (a ^ b ^ c) != d:
        return False
    mask = (_lsb(d) << 1) & _MASK64
    mask = ~(mask + (mask << 1)) & _MASK64
    id_masked = d & mask
    return (
        (a & mask) == id_masked
        and (b & mask) == id_masked
        and (c & mask) == id_masked
        and not _is_face(d)
    )


def normalize(cells: list[int]) -> list[int]:
    """Sorted, minimal, sibling-merged form; s2/cellunion.go:196-238."""
    out: list[int] = []
    for ci in sorted(cells):
        if out and _contains(out[-1], ci):
            continue
        while out and _contains(ci, out[-1]):
            out.pop()
        while len(out) >= 3 and are_siblings(out[-3], out[-2], out[-1], ci):
            out = out[:-3]
            ci = _parent(ci, _level(ci) - 1)
        out.append(ci)
    return out


def denormalize(cells: list[int], min_level: int, level_mod: int) -> list[int]:
    """Subdivide so every cell level >= min_level and == min_level mod
    level_mod; s2/cellunion.go:272-293."""
    out: list[int] = []
    for ci in cells:
        lvl = _level(ci)
        new_level = max(lvl, min_level)
        if level_mod > 1:
            new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(new_level, MAX_LEVEL)
        if new_level == lvl:
            out.append(ci)
        else:
            step = 2 << (2 * (MAX_LEVEL - new_level))
            begin = ci - _lsb(ci) + (1 << (2 * (MAX_LEVEL - new_level)))
            end = ci + _lsb(ci) + (1 << (2 * (MAX_LEVEL - new_level)))
            out.extend(range(begin, end, step))
    return out


def contains_cellid(cells: list[int], cid: int) -> bool:
    """Binary search in the normalized union; s2/cellunion.go:241-250."""
    import bisect

    i = bisect.bisect_right(cells, cid)
    if i < len(cells) and _range_min(cells[i]) <= cid:
        return True
    return i != 0 and _range_max(cells[i - 1]) >= cid


def intersects_cellid(cells: list[int], cid: int) -> bool:
    import bisect

    i = bisect.bisect_right(cells, cid)
    if i != 0 and _range_max(cells[i - 1]) >= _range_min(cid):
        return True
    return i != len(cells) and _range_min(cells[i]) <= _range_max(cid)


def union(a: list[int], b: list[int]) -> list[int]:
    return normalize(list(a) + list(b))


def intersection(a: list[int], b: list[int]) -> list[int]:
    """Sorted-merge intersection; s2/cellunion.go:62-111 semantics."""
    out: list[int] = []
    i = j = 0
    a = normalize(a)
    b = normalize(b)
    # Two cells either nest or are disjoint, so containment is the only
    # overlap case; advance whichever range ends first.
    while i < len(a) and j < len(b):
        ai, bj = a[i], b[j]
        if _range_min(ai) > _range_max(bj):
            j += 1
        elif _range_min(bj) > _range_max(ai):
            i += 1
        elif _contains(ai, bj):
            out.append(bj)
            j += 1
        else:
            out.append(ai)
            i += 1
    return normalize(out)


def difference(a: list[int], b: list[int]) -> list[int]:
    """Cells of a not in b, by recursive subdivision; s2/cellunion.go:124-147.
    (contains/intersects binary searches require b normalized.)"""
    b = normalize(b)
    out: list[int] = []

    def emit(ci: int) -> None:
        if not intersects_cellid(b, ci):
            out.append(ci)
            return
        if contains_cellid(b, ci):
            return
        lvl = _level(ci)
        step = 2 << (2 * (MAX_LEVEL - lvl - 1))
        begin = ci - _lsb(ci) + (1 << (2 * (MAX_LEVEL - lvl - 1)))
        for child in range(begin, begin + 4 * step, step):
            emit(child)

    for ci in sorted(a):
        emit(ci)
    return normalize(out)


def expand_at_level(cells: list[int], level: int) -> list[int]:
    """Add all edge/corner neighbors at the given level (one buffer ring
    of full level-`level` width); s2/cellunion.go:456-480.  Cells finer
    than the level are promoted to their level-`level` parent first —
    the promoted parent plus its ring still covers the original cell's
    radius-MinWidth(level) buffer."""
    output: list[int] = []
    for ci in cells:
        if _level(ci) > level:
            ci = _parent(ci, level)
        output.append(ci)
        for nb in ck.all_neighbors(ci, level):
            output.append(int(nb))
    return normalize(output)


def leaf_cells_covered(cells: list[int]) -> int:
    """Number of level-30 leaves covered; s2/cellunion.go:361-369."""
    return sum(_lsb(ci) << 1 for ci in cells) >> 1


def expand_by_radius(cells: list[int], min_radius_rad: float, max_level_diff: int = 3) -> list[int]:
    """Buffer the union by at least min_radius: expand at the level whose
    MinWidth is >= the radius (s2/cellunion.go:482-501)."""
    from geo_spark.kernel import metric

    if not cells:
        return []
    min_level = min(_level(c) for c in cells)
    radius_level = metric.MIN_WIDTH.max_level(min_radius_rad)
    if radius_level == 0 and min_radius_rad > metric.MIN_WIDTH.value(0):
        cells = expand_at_level(cells, 0)
    return expand_at_level(cells, min(min_level + max_level_diff, radius_level))


def cellunion_from_range(begin: int, end: int) -> list[int]:
    """Minimal ordered cell set exactly tiling the leaf range
    [begin, end); begin/end must be leaf ids (end exclusive, may be one
    past the last face).  Greedy MaxTile walk; s2/cellunion.go:41-49."""
    out: list[int] = []
    if begin >= end:
        return out
    cid = ck.max_tile(begin, end)
    while cid != end:
        out.append(cid)
        nxt = int(ck.next_cell(cid)[0])
        cid = ck.max_tile(nxt, end)
    return out
