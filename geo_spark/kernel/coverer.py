"""RegionCoverer: approximate a region by a bounded set of cells.

Faithful re-derivation of the reference's priority-queue subdivision
(s2/regioncoverer.go:75-402): seed with a fast covering of the bounding
cap, refine largest/least-divided candidates first under the MaxCells
budget, then Normalize + Denormalize.  Runs per-geometry inside
``applyInPandas`` — coverings are embarrassingly parallel across
polygons, which is exactly how the layer-prep job distributes them.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

from geo_spark.kernel import cellunion as cu
from geo_spark.kernel.cell import Cell
from geo_spark.kernel.regions import Region

MAX_LEVEL = 30
FACE_CELLS = [(f << 61) | (1 << 60) for f in range(6)]


@dataclass
class _Candidate:
    cell: Cell
    terminal: bool
    children: list["_Candidate"] = field(default_factory=list)


@dataclass
class RegionCoverer:
    """Params per s2/regioncoverer.go:75-90 (defaults 0/30/1/8)."""

    min_level: int = 0
    max_level: int = MAX_LEVEL
    level_mod: int = 1
    max_cells: int = 8

    # -- public API --------------------------------------------------------

    def covering(self, region: Region) -> list[int]:
        """Exterior covering (cells jointly contain the region);
        s2/regioncoverer.go:347-351."""
        return self._covering_internal(region, interior=False)

    def interior_covering(self, region: Region) -> list[int]:
        """Cells entirely contained in the region; s2/regioncoverer.go:354-358."""
        return self._covering_internal(region, interior=True)

    def fast_covering(self, region: Region) -> list[int]:
        """CellUnionBound normalized to the params, no refinement;
        s2/regioncoverer.go:397-402."""
        cells = list(region.cell_union_bound())
        self._normalize_covering(cells)
        return cells

    # -- internals ---------------------------------------------------------

    def _adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _new_candidate(self, region: Region, interior: bool, cell: Cell):
        """s2/regioncoverer.go:143-171."""
        if not region.may_intersect_cell(cell):
            return None
        return self._candidate_from_relate(
            interior, cell, lambda: region.contains_cell(cell)
        )

    def _candidate_from_relate(self, interior: bool, cell: Cell, contains):
        """Terminality rules of _new_candidate given a known may_intersect
        == True; ``contains`` is a thunk so the scalar path keeps its
        short-circuit (batch callers pass an already-computed bool)."""
        is_terminal = cell.level >= self.max_level
        if not is_terminal:
            if interior:
                if contains():
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            elif cell.level + self.level_mod > self.max_level or contains():
                is_terminal = True
        return _Candidate(cell, is_terminal)

    def _expand_children(
        self, region: Region, interior: bool, cand: _Candidate, cell: Cell, num_levels: int
    ) -> int:
        """s2/regioncoverer.go:175-196: descend level_mod levels, collecting
        leaf candidates of the expansion; returns the terminal count.

        Leaf level (num_levels == 1) evaluates all four children in one
        relate_cells batch when the region provides a vectorized
        override — the coverer's hot loop."""
        num_levels -= 1
        num_terminals = 0
        children = cell.children()
        if num_levels == 0 and type(region).relate_cells is not Region.relate_cells:
            cont, may = region.relate_cells(children)
            for child_cell, c_ok, m_ok in zip(children, cont, may):
                if not m_ok:
                    continue
                child = self._candidate_from_relate(
                    interior, child_cell, lambda v=bool(c_ok): v
                )
                if child is not None:
                    cand.children.append(child)
                    if child.terminal:
                        num_terminals += 1
            return num_terminals
        for child_cell in children:
            if num_levels > 0:
                if region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(
                        region, interior, cand, child_cell, num_levels
                    )
                continue
            child = self._new_candidate(region, interior, child_cell)
            if child is not None:
                cand.children.append(child)
                if child.terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(
        self,
        region: Region,
        interior: bool,
        cand,
        result: list[int],
        pq: list,
        counter: list[int],
    ) -> None:
        """s2/regioncoverer.go:198-229 including the all-terminal-children
        parent collapse and the largest-first priority formula."""
        if cand is None:
            return
        if cand.terminal:
            result.append(cand.cell.id)
            return
        num_levels = self.level_mod
        level = cand.cell.level
        if level < self.min_level:
            num_levels = 1
        num_terminals = self._expand_children(region, interior, cand, cand.cell, num_levels)
        max_children_shift = 2 * self.level_mod
        if not cand.children:
            return
        if (
            not interior
            and num_terminals == 1 << max_children_shift
            and level >= self.min_level
        ):
            cand.terminal = True
            self._add_candidate(region, interior, cand, result, pq, counter)
        else:
            priority = -(
                ((level << max_children_shift) + len(cand.children))
                << max_children_shift
            ) - num_terminals
            counter[0] += 1
            heapq.heappush(pq, (priority, counter[0], cand))

    def _initial_candidates(
        self, region: Region, interior: bool, result: list[int], pq: list, counter: list[int]
    ) -> None:
        """Seed from a small fast covering of the bounding cap;
        s2/regioncoverer.go:269-278."""
        temp = RegionCoverer(
            min_level=0,
            max_level=self.max_level,
            level_mod=1,
            max_cells=min(4, self.max_cells),
        )
        cells = temp.fast_covering(region)
        self._adjust_cell_levels(cells)
        for ci in cells:
            self._add_candidate(
                region,
                interior,
                self._new_candidate(region, interior, Cell.from_id(ci)),
                result,
                pq,
                counter,
            )

    def _adjust_cell_levels(self, cells: list[int]) -> None:
        """s2/regioncoverer.go:243-266."""
        if self.level_mod == 1:
            return
        out = 0
        for ci in cells:
            level = cu._level(ci)
            new_level = self._adjust_level(level)
            if new_level != level:
                ci = cu._parent(ci, new_level)
            if out > 0 and cu._contains(cells[out - 1], ci):
                continue
            while out > 0 and cu._contains(ci, cells[out - 1]):
                out -= 1
            cells[out] = ci
            out += 1
        del cells[out:]

    def _normalize_covering(self, covering: list[int]) -> None:
        """s2/regioncoverer.go:430-499: clamp levels, normalize, then merge
        adjacent cells via common ancestors until within max_cells."""
        if self.max_level < MAX_LEVEL or self.level_mod > 1:
            for idx, ci in enumerate(covering):
                level = cu._level(ci)
                new_level = self._adjust_level(min(level, self.max_level))
                if new_level != level:
                    covering[idx] = cu._parent(ci, new_level)
        covering[:] = cu.normalize(covering)
        while len(covering) > self.max_cells:
            best_index = -1
            best_level = -1
            for i in range(len(covering) - 1):
                level = _common_ancestor_level(covering[i], covering[i + 1])
                if level < 0:
                    continue
                level = self._adjust_level(level)
                if level > best_level:
                    best_level = level
                    best_index = i
            if best_level < self.min_level:
                break
            covering[best_index] = cu._parent(covering[best_index], best_level)
            covering[:] = cu.normalize(covering)
        if self.min_level > 0 or self.level_mod > 1:
            covering[:] = cu.denormalize(covering, self.min_level, self.level_mod)

    def _covering_internal(self, region: Region, interior: bool) -> list[int]:
        """s2/regioncoverer.go:294-334."""
        result: list[int] = []
        pq: list = []
        counter = [0]
        self._initial_candidates(region, interior, result, pq, counter)
        while pq and (not interior or len(result) < self.max_cells):
            _, _, cand = heapq.heappop(pq)
            # For exterior coverings the budget check decides whether to
            # keep subdividing or emit the parent whole.
            if (
                interior
                or cand.cell.level < self.min_level
                or len(cand.children) == 1
                or len(result) + len(pq) + len(cand.children) <= self.max_cells
            ):
                for child in cand.children:
                    if not interior or len(result) < self.max_cells:
                        self._add_candidate(region, interior, child, result, pq, counter)
            else:
                cand.terminal = True
                self._add_candidate(region, interior, cand, result, pq, counter)

        result[:] = cu.normalize(result)
        if self.min_level > 0 or self.level_mod > 1:
            result[:] = cu.denormalize(result, self.min_level, self.level_mod)
        return result


def _common_ancestor_level(a: int, b: int) -> int:
    bits = max(a ^ b, max(cu._lsb(a), cu._lsb(b)))
    msb = bits.bit_length() - 1
    if msb > 60:
        return -1
    return (60 - msb) >> 1


def flood_fill_region_covering(region, start_cell: int) -> list[int]:
    """All same-level cells intersecting the region, reachable from the
    start cell by 4-neighbor steps — SimpleRegionCovering /
    FloodFillRegionCovering (s2/regioncoverer.go:587-615).  Exact for
    connected regions; the uniform level comes from the start cell."""
    import numpy as np

    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.cell import Cell

    lvl = int(ck.level(np.array([start_cell], dtype=np.uint64))[0])
    seen = {int(start_cell)}
    frontier = [int(start_cell)]
    out = []
    while frontier:
        c = frontier.pop()
        if not region.may_intersect_cell(Cell.from_id(c)):
            continue
        out.append(c)
        for nb in ck.edge_neighbors(np.array([c], dtype=np.uint64))[0]:
            n = int(nb)
            if n not in seen:
                seen.add(n)
                frontier.append(n)
    return sorted(out)


def simple_region_covering(region, start_point_latlng: tuple, level: int) -> list[int]:
    """Flood fill from the cell containing a point of the region;
    s2/regioncoverer.go:587-597."""
    import numpy as np

    from geo_spark.kernel import cellid as ck

    lat, lng = start_point_latlng
    leaf = ck.cellid_from_latlng(np.array([lat]), np.array([lng]))
    start = int(ck.parent(leaf, level)[0])
    return flood_fill_region_covering(region, start)
