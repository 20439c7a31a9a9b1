"""Spherical convex hull per geometry group (applyInPandas).

Graham scan with the robust sign predicate, re-derived from the
reference's ConvexHullQuery (s2/convex_hull_query.go:60-235: sort CCW
around an interior direction, scan keeping left turns).  Valid for point
sets within an open hemisphere (the reference has the same restriction
via its cap-bound origin); callers with wider spreads get the full-
sphere marker (empty hull)."""

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
    # Tangent-plane angles around the interior direction.
    ref = pred.ortho(center)
    ref2 = np.cross(center, ref)
    ang = np.arctan2(pts @ ref2, pts @ ref)
    order = np.argsort(ang, kind="stable")
    sorted_pts = pts[order]

    hull: list[np.ndarray] = []
    # Two passes so the scan closes the ring (rotating-start Graham scan).
    for p in np.concatenate([sorted_pts, sorted_pts]):
        while len(hull) >= 2 and int(
            pred.robust_sign(hull[-2], hull[-1], p)[0]
        ) <= 0:
            hull.pop()
        hull.append(p)
    # Second pass may duplicate the prefix; cut to one cycle.
    seen = set()
    out = []
    for p in hull:
        key = (float(p[0]), float(p[1]), float(p[2]))
        if key in seen:
            break
        seen.add(key)
        out.append(p)
    return np.array(out)


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
