"""Raster <-> vector bridging on the S2 grid.

- :func:`rasterize` — region -> uniform-level cell mask (the covering
  denormalized to one level, with interior/boundary flags): polygons
  become rasters at any tile resolution.
- :func:`vectorize_cells` — uniform-level cell mask -> boundary rings
  (vector polygons whose vertices are cell corners): the inverse
  operation, a boundary trace in face (i,j) space (cells of one face
  stitch exactly; cross-face masks emit per-face rings, which is the
  standard tiled-vectorization contract).

Together these close the north rule's raster<->vector loop:
raster tiles of any layer can be vectorized back into polygon layers
whose PIP join reproduces the mask (round-trip tested).
"""

from __future__ import annotations

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel import cellunion as cu
from geo_spark.kernel.cell import Cell
from geo_spark.kernel.coverer import RegionCoverer
from geo_spark.kernel.regions import Region


def rasterize(
    region: Region, level: int, max_cells: int = 64
) -> list[tuple[int, bool]]:
    """(cell_id, is_interior) at the uniform level; the mask covers the
    region (conservative superset, exact interior flags)."""
    coverer = RegionCoverer(min_level=level, max_level=level, max_cells=max_cells)
    cells = coverer.covering(region)
    out = []
    for c in cells:
        out.append((c, region.contains_cell(Cell.from_id(c))))
    return out


def vectorize_cells(cells: list[int]) -> list[np.ndarray]:
    """Uniform-level cell mask -> list of closed CCW boundary rings
    ((K,3) unit-vector arrays).  Holes come out as separate rings
    (XOR-parity convention, consistent with kernel/booleans.py)."""
    if len(cells) == 0:  # accepts list or ndarray masks
        return []
    levels = {cu._level(c) for c in cells}
    if len(levels) != 1:
        raise ValueError("vectorize_cells requires a uniform-level mask")
    (level,) = levels
    size = 1 << (30 - level)

    # Group by face; trace each face's mask in (i,j) lattice units.
    arr = np.array(sorted(set(cells)), dtype=np.uint64)
    f, i, j, _ = ck.face_ij_orientation(arr)
    i = (i // size).astype(np.int64)
    j = (j // size).astype(np.int64)

    rings_out: list[np.ndarray] = []
    for face in np.unique(f):
        m = f == face
        occupied = set(zip(i[m].tolist(), j[m].tolist()))
        # Boundary half-edges, oriented CCW around the mask (interior on
        # the left): for each cell, emit edges whose neighbor is absent.
        # Corners in lattice coords: (i,j) cell spans [i,i+1]x[j,j+1].
        # Two diagonally-touching cells share a corner, so a corner can
        # carry TWO outgoing half-edges: key by corner -> list, and at
        # ambiguous corners take the sharpest left turn relative to the
        # incoming direction so the pinched rings stay separate.
        edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

        def _add(a: tuple[int, int], b: tuple[int, int]) -> None:
            edges.setdefault(a, []).append(b)

        for ci, cj in occupied:
            if (ci, cj - 1) not in occupied:  # bottom: left->right
                _add((ci, cj), (ci + 1, cj))
            if (ci + 1, cj) not in occupied:  # right: bottom->top
                _add((ci + 1, cj), (ci + 1, cj + 1))
            if (ci, cj + 1) not in occupied:  # top: right->left
                _add((ci + 1, cj + 1), (ci, cj + 1))
            if (ci - 1, cj) not in occupied:  # left: top->bottom
                _add((ci, cj + 1), (ci, cj))

        def _pop_next(
            corner: tuple[int, int], incoming: tuple[int, int] | None
        ) -> tuple[int, int]:
            outs = edges[corner]
            if len(outs) == 1 or incoming is None:
                end = outs[-1]
            else:
                di, dj = incoming
                # left turn, straight, right turn (interior stays on the left)
                end = None
                for pd in ((-dj, di), (di, dj), (dj, -di)):
                    want = (corner[0] + pd[0], corner[1] + pd[1])
                    if want in outs:
                        end = want
                        break
                if end is None:  # pragma: no cover - defensive
                    end = outs[-1]
            outs.remove(end)
            if not outs:
                del edges[corner]
            return end

        # Stitch half-edges into rings.
        while edges:
            start = next(iter(edges))
            ring = [start]
            cur = _pop_next(start, None)
            while cur != start:
                ring.append(cur)
                prev = ring[-2]
                cur = _pop_next(cur, (cur[0] - prev[0], cur[1] - prev[1]))
            # lattice corners -> (s,t) -> xyz
            pts = []
            for (li, lj) in ring:
                s = ck.st_to_uv(ck.ij_to_st_min(np.array([li * size]))[0])
                t = ck.st_to_uv(ck.ij_to_st_min(np.array([lj * size]))[0])
                x, y, z = ck.face_uv_to_xyz(np.int64(face), s, t)
                v = np.array([float(x), float(y), float(z)])
                pts.append(v / np.linalg.norm(v))
            rings_out.append(_simplify_collinear(np.array(pts)))
    return rings_out


def _simplify_collinear(ring: np.ndarray) -> np.ndarray:
    """Drop lattice vertices that continue straight along the same cell
    row/column (they are exactly on the great arc of the merged edge)."""
    n = len(ring)
    keep = []
    for k in range(n):
        a, b, c = ring[(k - 1) % n], ring[k], ring[(k + 1) % n]
        cr = np.cross(a, c)
        norm = float(np.sqrt(cr @ cr))
        # Relative test: lattice corners along one u/v-line are exactly
        # co-planar; float residue is ~eps*|a x c|, a true corner turn is
        # ~cell_size*|a x c| — orders of magnitude apart.
        if norm < 1e-24 or abs(float(cr @ b)) > 1e-9 * norm:
            keep.append(k)
    return ring[keep] if len(keep) >= 3 else ring
