"""Polyline resampling: m points at equal chord-length fractions.

The distributed composition of the reference's polyline interpolation
surface (s2/polyline.go Interpolate / s2/edge_tessellator.go:187-291):
every chain emits ``m`` points at fractions j/(m-1) of its cumulative
CHORD length (straight 3-D segment lengths — for road/trail-scale
segments chord == arc to ~1e-9, and chord parameterization keeps the
whole operator inside IEEE +,-,*,/,sqrt so an exact SQL oracle can
replay every output coordinate bit-for-bit; great-circle arc-length
parameterization would pull asin into the compared columns).

Determinism contract (replayed verbatim by the oracle):
  * cumulative lengths are a LEFT FOLD (numpy cumsum order);
  * target t_j = (j * total) / (m - 1) in that literal op order;
  * segment s = first segment whose cum end >= t_j, clamped to the
    last segment (float roundoff can push t_{m-1} a ulp past total);
  * alpha = (t_j - cum[s]) / len[s], 0 for degenerate segments,
    clamped to 1;
  * p = a + alpha * (b - a), then normalized to the unit sphere
    (norm = sqrt((px*px + py*py) + pz*pz) in that association).

Spark shape: ONE groupBy(key) assembles each chain as a sorted vertex
array (groups are chain-sized), then a batch-local mapInPandas emits
the m rows per chain — no second shuffle, no per-point state.  Chains
with < 2 vertices emit nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample_polylines(
    verts: DataFrame,
    m: int,
    key: str = "geom_id",
    seq_col: str = "seq",
    xyz: tuple[str, str, str] = ("x", "y", "z"),
) -> DataFrame:
    """(key, j, seg, x, y, z): ``m`` unit-sphere points per chain at
    equal chord-length fractions.  ``verts`` holds one row per chain
    vertex; ``seq_col`` orders vertices within a chain (must be unique
    per chain)."""
    if m < 2:
        raise ValueError("m must be >= 2")
    chains = verts.groupBy(key).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(seq_col).alias("q"), *xyz))
        ).alias("_ch")
    )
    key_type = verts.schema[key].dataType.simpleString()
    schema = (
        f"{key} {key_type}, j long, seg long, "
        "x double, y double, z double"
    )
    xn, yn, zn = xyz

    def fn(batches):
        for pdf in batches:
            out_k, out_j, out_s = [], [], []
            out_x, out_y, out_z = [], [], []
            for k, ch in zip(pdf[key], pdf["_ch"]):
                n = len(ch)
                if n < 2:
                    continue
                v = np.empty((n, 3))
                for i, row in enumerate(ch):
                    v[i, 0] = row[xn]
                    v[i, 1] = row[yn]
                    v[i, 2] = row[zn]
                d = v[1:] - v[:-1]
                seglen = np.sqrt(
                    (d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1])
                    + d[:, 2] * d[:, 2]
                )
                cum = np.concatenate([[0.0], np.cumsum(seglen)])
                total = cum[-1]
                for j in range(m):
                    t = (j * total) / (m - 1)
                    s = int(np.searchsorted(cum[1:], t, side="left"))
                    s = min(s, n - 2)
                    if seglen[s] > 0.0:
                        alpha = min((t - cum[s]) / seglen[s], 1.0)
                    else:
                        alpha = 0.0
                    p = v[s] + alpha * (v[s + 1] - v[s])
                    norm = np.sqrt((p[0] * p[0] + p[1] * p[1]) + p[2] * p[2])
                    out_k.append(k)
                    out_j.append(j)
                    out_s.append(s)
                    out_x.append(p[0] / norm)
                    out_y.append(p[1] / norm)
                    out_z.append(p[2] / norm)
            yield pd.DataFrame(
                {
                    key: out_k,
                    "j": out_j,
                    "seg": out_s,
                    "x": out_x,
                    "y": out_y,
                    "z": out_z,
                }
            )

    return chains.mapInPandas(fn, schema)
