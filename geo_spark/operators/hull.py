"""Spherical convex hull per geometry group (applyInPandas).

Monotone chain with the robust sign predicate, re-derived from the
reference's ConvexHullQuery semantics (s2/convex_hull_query.go:60-235).
The gnomonic projection about an interior direction maps great circles
to straight lines and preserves orientation (the planar turn sign of
projected points equals sign((a x b) . c)), so sorting by projected
coordinates and running Andrew's monotone chain with the *spherical*
RobustSign turn test yields the exact spherical hull.  (An earlier
angle-sorted rotating Graham scan could leave non-hull prefix vertices;
caught by the q_city_hulls DuckDB oracle.)  Valid for point sets within
an open hemisphere (the reference has the same restriction via its
cap-bound origin); callers with wider spreads get the full-sphere
marker (empty hull)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geo_spark.kernel import predicates as pred


def convex_hull_points(pts: np.ndarray) -> np.ndarray:
    """(N,3) unit vectors -> (H,3) CCW hull vertices (loop order)."""
    pts = np.unique(np.atleast_2d(np.asarray(pts, dtype=np.float64)), axis=0)
    if len(pts) <= 2:
        return pts
    center = pts.mean(axis=0)
    norm = math.sqrt(center @ center)
    if norm < 1e-12:
        return np.empty((0, 3))  # antipodal spread: no hemisphere hull
    center /= norm
    w = pts @ center
    if (w <= 1e-12).any():
        return np.empty((0, 3))  # beyond the open hemisphere of the mean
    # Gnomonic coordinates about the interior direction; the sort only
    # needs a consistent total order, the turn tests stay exact on xyz.
    ref = pred.ortho(center)
    ref2 = np.cross(center, ref)
    px = (pts @ ref) / w
    py = (pts @ ref2) / w
    order = np.lexsort((py, px))
    sp = pts[order]

    def chain(seq) -> list[np.ndarray]:
        h: list[np.ndarray] = []
        for p in seq:
            while len(h) >= 2 and int(
                pred.robust_sign(h[-2], h[-1], p)[0]
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = chain(sp)
    upper = chain(sp[::-1])
    return np.array(lower[:-1] + upper[:-1])


def group_convex_hulls(
    df: DataFrame,
    group_col: str,
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """(group, hull array<struct<lat,lng>>, n_hull) per group."""
    from geo_spark.kernel import cellid as ck

    schema = T.StructType(
        [
            df.schema[group_col],
            T.StructField(
                "hull",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("lat", T.DoubleType()),
                            T.StructField("lng", T.DoubleType()),
                        ]
                    )
                ),
            ),
            T.StructField("n_hull", T.IntegerType()),
        ]
    )

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y, z = ck.latlng_to_xyz(
            pdf[lat_col].to_numpy(np.float64), pdf[lng_col].to_numpy(np.float64)
        )
        hull = convex_hull_points(np.stack([x, y, z], axis=1))
        if len(hull):
            la, ln = ck.xyz_to_latlng(hull[:, 0], hull[:, 1], hull[:, 2])
            ring = [{"lat": float(a), "lng": float(b)} for a, b in zip(la, ln)]
        else:
            ring = []
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "hull": [ring],
                "n_hull": [len(ring)],
            }
        )

    return df.groupBy(group_col).applyInPandas(one, schema)
