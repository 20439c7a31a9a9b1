"""Map matching (nearest-edge assignment): snap each point to the
closest segment of the closest polyline within a radius.

The per-point analog of the reference's ClosestEdgeQuery
(s2/edge_query.go:30-230 + s2/min_distance_targets.go:140-213): for a
layer of polylines ("roads"/trails), each point gets the (polyline,
segment index, distance) of its globally nearest edge, provided that
edge is within ``radius_rad``.  This is the primitive under GPS-trace
map matching, snapping noisy geotags to a road network, and
trajectory-to-route attribution.

Spark shape (the 100 TB plan):
  1. candidates — the buffered-covering (level, ancestor) equi-join of
     ``distance_join`` (ExpandByRadius semantics guarantee every
     polyline within r of a point is a candidate; broadcast when the
     covering is small).
  2. refine — one Arrow pass per candidate batch; per (point, polyline)
     the vectorized segment sweep returns (min chord2, argmin segment),
     strict-< so exact ties take the lowest segment index.
  3. argmin — ``min(struct(chord2, geom_id, seg_idx))`` per point: a
     single partial-aggregatable shuffle (map-side combine halves the
     exchange), no window, no sort.
Ties across polylines resolve lexicographically by (chord2, geom_id,
seg_idx) — bit-deterministic, so an exact SQL oracle can replay the
selection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.edges import (
    point_segment_chord2,
    point_to_edges_chord2_argmin,
)
from geo_spark.kernel.regions import PolylineRegion, chord2_from_angle
from geo_spark.operators.spatial_join import (
    Layer,
    _cached_region,
    _candidates,
    _ensure_parallelism,
    _geoms_for_join,
)


def refine_candidates(
    points: DataFrame,
    layer: Layer,
    radius_rad: float,
    point_key: str,
    cell_col: str = "cell_id",
    latlng: tuple[str, str] = ("lat", "lng"),
) -> DataFrame:
    """(point_key, geom_id, seg_idx, chord2) candidate rows — the
    covering join + per-(point, polyline) argmin-segment refine, before
    the global per-point argmin.  Stateless, so it runs unchanged on a
    streaming points DataFrame (stream-static join + mapInPandas).

    Layers above Layer.MAX_CLOSURE_GEOMS (real road networks are
    millions of segments; the reference's EdgeQuery has no index-size
    ceiling, s2/edge_query.go:177-763) refine through the distributed
    blob-join tier: the polyline blobs ride the candidate rows
    (broadcast join for <= BROADCAST_MAX_GEOM_ROWS geometries, AQE
    shuffle join above), the grouping stays batch-local, and the
    per-point argmin shuffle downstream is unchanged."""
    pts = points.select(point_key, cell_col, *latlng)
    cand = _ensure_parallelism(_candidates(pts, layer, cell_col))
    limit2 = chord2_from_angle(radius_rad)
    regions = layer.regions
    if regions is None:
        cand = cand.join(_geoms_for_join(layer), "geom_id")

    key_type = pts.schema[point_key].dataType.simpleString()
    schema = f"{point_key} {key_type}, geom_id long, seg_idx long, chord2 double"

    # Above this many vertices the padded per-row gather would waste
    # memory (one giant trail pads every row in the batch) — long
    # chains take the per-geometry sweep, short road segments (the
    # network case, where candidate rows vastly outnumber geometries)
    # take the batch-vectorized path.
    max_pad_verts = 64

    def fn(batches):
        cache: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            x, y, z = ck.latlng_to_xyz(
                pdf[latlng[0]].to_numpy(np.float64),
                pdf[latlng[1]].to_numpy(np.float64),
            )
            p3 = np.stack([x, y, z], axis=1)
            gids = pdf["geom_id"].to_numpy(np.int64)
            uniq, first, inv = np.unique(
                gids, return_index=True, return_inverse=True
            )
            if regions is not None:
                regs = [regions[int(g)] for g in uniq]
            else:
                blobs = pdf["blob"]
                regs = [
                    _cached_region(cache, int(g), blobs.iloc[int(i)])
                    for g, i in zip(uniq, first)
                ]
            for rg in regs:
                if not isinstance(rg, PolylineRegion):
                    raise TypeError("map_match layers must hold PolylineRegions")
            max_v = max(len(rg.verts) for rg in regs)
            if max_v <= max_pad_verts:
                # ONE vectorized chord2 sweep per segment slot across
                # the whole batch: rows gather their chain's vertices
                # from the NaN-padded (n_uniq, max_v, 3) table; padded
                # segments yield NaN and never win the strict-< update
                # (so ties still take the lowest segment index, exactly
                # like point_to_edges_chord2_argmin).
                V = np.full((len(regs), max_v, 3), np.nan)
                for i, rg in enumerate(regs):
                    V[i, : len(rg.verts)] = rg.verts
                rowv = V[inv]  # (n, max_v, 3)
                d = np.full(len(pdf), 4.0)
                seg = np.zeros(len(pdf), dtype=np.int64)
                with np.errstate(invalid="ignore"):
                    for s in range(max_v - 1):
                        ds = point_segment_chord2(
                            p3, rowv[:, s], rowv[:, s + 1]
                        )
                        m = ds < d
                        d[m] = ds[m]
                        seg[m] = s
            else:
                d = np.full(len(pdf), np.inf)
                seg = np.zeros(len(pdf), dtype=np.int64)
                for i, gid in enumerate(uniq):
                    m = inv == i
                    d[m], seg[m] = point_to_edges_chord2_argmin(
                        p3[m], regs[i].verts
                    )
            keep = d <= limit2
            yield pd.DataFrame(
                {
                    point_key: pdf[point_key].to_numpy()[keep],
                    "geom_id": gids[keep],
                    "seg_idx": seg[keep],
                    "chord2": d[keep],
                }
            )

    return cand.mapInPandas(fn, schema)


def map_match(
    points: DataFrame,
    layer: Layer,
    radius_rad: float,
    point_key: str,
    cell_col: str = "cell_id",
    latlng: tuple[str, str] = ("lat", "lng"),
) -> DataFrame:
    """(point_key, geom_id, seg_idx, chord2): the nearest polyline
    segment within the radius, one row per matched point.  ``layer``
    must be a buffered distance layer over PolylineRegions (see
    distance_join.build_distance_layer)."""
    refined = refine_candidates(points, layer, radius_rad, point_key, cell_col, latlng)
    # Global nearest (edge within radius) per point: one aggregation,
    # partial on the map side, lexicographic (chord2, geom_id, seg_idx).
    best = refined.groupBy(point_key).agg(
        F.min(F.struct("chord2", "geom_id", "seg_idx")).alias("_b")
    )
    return best.select(
        point_key,
        F.col("_b.geom_id").alias("geom_id"),
        F.col("_b.seg_idx").alias("seg_idx"),
        F.col("_b.chord2").alias("chord2"),
    )
