"""Polyline vertex alignment (dynamic timewarp).

Contract follows the reference's alignment module
(s2/polyline_alignment.go:24-508): the cost of a warp path is the summed
*chordal* distance |a_i - b_j| over matched vertex pairs (the module doc
says "squared" but the implementation uses the plain norm,
s2/polyline_alignment.go:396-399 — we match the code); the optimal
alignment minimizes that cost with steps (i+1,j+1), (i+1,j), (i,j+1) and
the standard tie-break preferring the diagonal, then up, then left
(s2/polyline_alignment.go:442-501).

Three surfaces:

* ``exact_alignment_cost`` — cost only, vectorized over antidiagonals of
  the DP table (every cell of diagonal k depends only on diagonals k-1
  and k-2, so numpy sweeps whole diagonals at once; the Go rolling-array
  loop is inherently sequential per cell).
* ``exact_alignment`` — cost + warp path (full table + walk-back with the
  reference's tie-break order).
* ``approx_alignment_cost`` — the C++ ``ApproxVertexAlignment`` recursion
  the Go port lists as TODO (s2/polyline_alignment.go:505-508): recurse
  on half-resolution polylines (even-index vertices,
  s2/polyline_alignment.go:306-313), upsample the coarse warp path into a
  search window, dilate by ``radius`` (square structuring element,
  s2/polyline_alignment.go:263-286), and run windowed DTW.  O(n*radius)
  per pair instead of O(n^2) — the scale path for trajectory-pair joins.

Inputs are (N,3) unit-vector arrays; per-pair scalar work is meant to run
inside ``mapInPandas`` batches (operators/alignment_ops.py).
"""

from __future__ import annotations

import numpy as np

_INF = np.inf


def pairwise_chordal(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,M) chordal distance matrix |a_i - b_j|."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    # |a-b|^2 = 2 - 2 a.b for unit vectors, but stay general (cell edge
    # normals etc. may be unnormalized): expand explicitly.
    d2 = (
        (a * a).sum(axis=1)[:, None]
        + (b * b).sum(axis=1)[None, :]
        - 2.0 * (a @ b.T)
    )
    return np.sqrt(np.maximum(d2, 0.0))


def exact_alignment_cost(a: np.ndarray, b: np.ndarray) -> float:
    """Optimal alignment cost, O(N*M) time / O(min) space
    (s2/polyline_alignment.go:385-403), computed by antidiagonal sweeps.
    """
    c = pairwise_chordal(a, b)
    n, m = c.shape
    prev2: np.ndarray | None = None  # diagonal k-2
    prev: np.ndarray | None = None  # diagonal k-1
    for k in range(n + m - 1):
        i_lo = max(0, k - m + 1)
        i_hi = min(n - 1, k)
        i = np.arange(i_lo, i_hi + 1)
        j = k - i
        cur = c[i, j].copy()
        if k == 0:
            pass  # table[0,0] = cost[0,0]
        else:
            best = np.full(len(i), _INF)
            # previous diagonal holds rows [max(0,k-m), min(n-1,k-1)]
            p_lo = max(0, k - m)
            # up: (i-1, j) on diagonal k-1 at offset (i-1) - p_lo, needs i>0
            up = np.full(len(i), _INF)
            mask = i > 0
            up[mask] = prev[(i[mask] - 1) - p_lo]
            # left: (i, j-1) on diagonal k-1 at offset i - p_lo, needs j>0
            left = np.full(len(i), _INF)
            mask = j > 0
            left[mask] = prev[i[mask] - p_lo]
            best = np.minimum(up, left)
            if k >= 2:
                # diag: (i-1, j-1) on diagonal k-2 (rows from max(0,k-1-m))
                pp_lo = max(0, k - 1 - m)
                diag = np.full(len(i), _INF)
                mask = (i > 0) & (j > 0)
                diag[mask] = prev2[(i[mask] - 1) - pp_lo]
                best = np.minimum(best, diag)
            elif k == 1:
                # (0,0) is both "diag" ancestor and on diagonal 0
                pass  # already covered: prev diagonal 0 holds (0,0) as up/left
            cur = cur + best
        prev2, prev = prev, cur
    return float(prev[-1])


def _full_table(c: np.ndarray, strides: np.ndarray | None = None) -> np.ndarray:
    """DP table; cells outside the per-row [start,end) strides are +inf.
    Row-sequential (used for walk-back and windowed DTW where windows are
    narrow)."""
    n, m = c.shape
    t = np.full((n, m), _INF)
    if strides is None:
        strides = np.stack([np.zeros(n, dtype=np.int64), np.full(n, m, dtype=np.int64)], axis=1)
    for row in range(n):
        s, e = int(strides[row][0]), int(strides[row][1])
        if row == 0:
            t[0, s:e] = np.cumsum(c[0, s:e]) if s == 0 else _INF
            continue
        prev = t[row - 1]
        # up and diag come from the previous row (vectorized); left is a
        # sequential prefix recurrence within the row
        up = prev[s:e]
        diag = np.empty(e - s)
        diag[0] = prev[s - 1] if s > 0 else _INF
        diag[1:] = prev[s : e - 1]
        base = np.minimum(up, diag)
        run = _INF
        for idx in range(e - s):
            run = min(base[idx], run)  # run carries left-neighbor cost
            run = c[row, s + idx] + run
            t[row, s + idx] = run
    return t


def exact_alignment(a: np.ndarray, b: np.ndarray) -> tuple[float, list[tuple[int, int]]]:
    """Optimal cost and forward warp path, reference tie-break order:
    diagonal, then up, then left (s2/polyline_alignment.go:480-499)."""
    c = pairwise_chordal(a, b)
    t = _full_table(c)
    n, m = c.shape
    path = []
    row, col = n - 1, m - 1
    while row >= 0 and col >= 0:
        path.append((row, col))
        d = t[row - 1, col - 1] if row > 0 and col > 0 else _INF
        u = t[row - 1, col] if row > 0 else _INF
        l = t[row, col - 1] if col > 0 else _INF
        if row == 0 and col == 0:
            break
        if d <= u and d <= l:
            row -= 1
            col -= 1
        elif u <= l:
            row -= 1
        else:
            col -= 1
    path.reverse()
    return float(t[n - 1, m - 1]), path


def half_resolution(a: np.ndarray) -> np.ndarray:
    """Even-index vertices (s2/polyline_alignment.go:306-313)."""
    return np.asarray(a)[::2]


def _window_from_warp_path(path: list[tuple[int, int]], rows: int, cols: int) -> np.ndarray:
    """Per-row [start, end) strides covering the warp path."""
    strides = np.zeros((rows, 2), dtype=np.int64)
    strides[:, 0] = cols  # start = min col seen
    for i, j in path:
        strides[i, 0] = min(strides[i, 0], j)
        strides[i, 1] = max(strides[i, 1], j + 1)
    return strides


def _upsample(strides: np.ndarray, new_rows: int, new_cols: int) -> np.ndarray:
    """Scale a stride window to a larger table
    (s2/polyline_alignment.go:241-261)."""
    rows = len(strides)
    cols = int(strides[-1][1])
    row_scale = new_rows / rows
    col_scale = new_cols / cols
    src = ((np.arange(new_rows) + 0.5) / row_scale).astype(np.int64)
    out = np.empty((new_rows, 2), dtype=np.int64)
    out[:, 0] = (col_scale * strides[src, 0] + 0.5).astype(np.int64)
    out[:, 1] = (col_scale * strides[src, 1] + 0.5).astype(np.int64)
    return out


def _dilate(strides: np.ndarray, radius: int, cols: int) -> np.ndarray:
    """Square morphological dilation of the window
    (s2/polyline_alignment.go:263-286)."""
    rows = len(strides)
    out = np.empty_like(strides)
    for row in range(rows):
        prev_row = max(0, row - radius)
        next_row = min(row + radius, rows - 1)
        out[row, 0] = max(0, strides[prev_row][0] - radius)
        out[row, 1] = min(strides[next_row][1] + radius, cols)
    # enforce window validity (monotone starts/ends)
    np.maximum.accumulate(out[:, 0], out=out[:, 0])
    np.maximum.accumulate(out[:, 1], out=out[:, 1])
    out[-1, 1] = cols
    out[0, 0] = 0
    return out


_APPROX_BASE = 16


def approx_alignment(
    a: np.ndarray, b: np.ndarray, radius: int = 4
) -> tuple[float, list[tuple[int, int]]]:
    """Windowed approximate alignment per the C++ algorithm the Go port
    stubs (s2/polyline_alignment.go:505-508): recurse at half resolution,
    upsample + dilate the coarse path's window, then windowed DTW.  Cost
    is >= the exact cost and converges to it as ``radius`` grows."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if n <= _APPROX_BASE or m <= _APPROX_BASE or n <= radius or m <= radius:
        return exact_alignment(a, b)
    _, coarse = approx_alignment(half_resolution(a), half_resolution(b), radius)
    strides = _window_from_warp_path(coarse, (n + 1) // 2, (m + 1) // 2)
    strides = _upsample(strides, n, m)
    strides = _dilate(strides, radius, m)
    c = pairwise_chordal(a, b)
    t = _full_table(c, strides)
    # walk back within the window
    path = []
    row, col = n - 1, m - 1
    while row >= 0 and col >= 0:
        path.append((row, col))
        if row == 0 and col == 0:
            break
        d = t[row - 1, col - 1] if row > 0 and col > 0 else _INF
        u = t[row - 1, col] if row > 0 else _INF
        l = t[row, col - 1] if col > 0 else _INF
        if d <= u and d <= l:
            row -= 1
            col -= 1
        elif u <= l:
            row -= 1
        else:
            col -= 1
    path.reverse()
    return float(t[n - 1, m - 1]), path


def approx_alignment_cost(a: np.ndarray, b: np.ndarray, radius: int = 4) -> float:
    return approx_alignment(a, b, radius)[0]


def medoid_index(chains: list[np.ndarray], approx_radius: int | None = None) -> int:
    """Index of the chain minimizing summed alignment cost to all others
    (GetMedoidPolyline semantics, s2/polyline_alignment.go:80-83)."""
    k = len(chains)
    totals = np.zeros(k)
    for i in range(k):
        for j in range(i + 1, k):
            if approx_radius is None:
                cost = exact_alignment_cost(chains[i], chains[j])
            else:
                cost = approx_alignment_cost(chains[i], chains[j], approx_radius)
            totals[i] += cost
            totals[j] += cost
    return int(np.argmin(totals))


def frechet_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Discrete Fréchet distance (the min over couplings of the MAX
    pair distance — the dog-leash metric), by the same antidiagonal
    sweep as :func:`exact_alignment_cost` with (+, min) replaced by
    (max, min): F(i,j) = max(c[i,j], min(F(i-1,j), F(i,j-1),
    F(i-1,j-1))).  O(N*M) time, O(min diagonal) space.

    Relation pinned in tests: frechet <= dtw cost for the same pair
    (a min-sum over a path dominates the min-max)."""
    c = pairwise_chordal(a, b)
    n, m = c.shape
    prev2: np.ndarray | None = None
    prev: np.ndarray | None = None
    for k in range(n + m - 1):
        i_lo = max(0, k - m + 1)
        i_hi = min(n - 1, k)
        i = np.arange(i_lo, i_hi + 1)
        j = k - i
        cur = c[i, j].copy()
        if k > 0:
            p_lo = max(0, k - m)
            up = np.full(len(i), _INF)
            mask = i > 0
            up[mask] = prev[(i[mask] - 1) - p_lo]
            left = np.full(len(i), _INF)
            mask = j > 0
            left[mask] = prev[i[mask] - p_lo]
            best = np.minimum(up, left)
            if k >= 2:
                pp_lo = max(0, k - 1 - m)
                diag = np.full(len(i), _INF)
                mask = (i > 0) & (j > 0)
                diag[mask] = prev2[(i[mask] - 1) - pp_lo]
                best = np.minimum(best, diag)
            cur = np.maximum(cur, best)
        prev2, prev = prev, cur
    return float(prev[-1])
