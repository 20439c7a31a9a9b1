"""Geometry <-> geometry join (polygon/polygon relations).

Candidates: Hilbert-range overlap between the two layers' covering
cells — the engine's **range join** primitive (the table form of
CellUnion.Intersects, s2/cellunion.go:253-265): covering cell ranges
[RangeMin, RangeMax] overlap iff the regions *may* intersect.  Refine:
pairwise loop relations (kernel/relations.py) on the candidate pairs
only, geometries shipped in the closure (layers are dimension tables).

For two small layers Spark plans the range join as broadcast-NL — the
right call; for two huge layers the same code becomes a shuffle range
join where Iceberg/parquet sort order on the biased cell id provides
data skipping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql
from geo_spark.kernel.regions import LoopRegion
from geo_spark.kernel.relations import loop_relation
from geo_spark.operators.spatial_join import Layer


def _ranges(layer: Layer, prefix: str) -> DataFrame:
    return layer.covering.select(
        F.col("geom_id").alias(f"{prefix}id"),
        s2sql.range_min(F.col("cell")).alias(f"{prefix}lo"),
        s2sql.range_max(F.col("cell")).alias(f"{prefix}hi"),
    )


def polygon_polygon_join(a: Layer, b: Layer) -> DataFrame:
    """(aid, bid, contains, intersects) for candidate pairs whose
    coverings overlap; non-candidates are provably disjoint."""
    if a.regions is None or b.regions is None:
        raise ValueError("polygon_polygon_join requires closure-size layers")
    ra = _ranges(a, "a")
    rb = _ranges(b, "b")
    cands = (
        ra.join(rb, (ra["alo"] <= rb["bhi"]) & (rb["blo"] <= ra["ahi"]))
        .select("aid", "bid")
        .distinct()
    )

    a_regions = a.regions
    b_regions = b.regions

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, bid in zip(pdf["aid"].to_numpy(), pdf["bid"].to_numpy()):
                la = a_regions[int(aid)]
                lb = b_regions[int(bid)]
                if not isinstance(la, LoopRegion) or not isinstance(lb, LoopRegion):
                    raise TypeError("polygon_polygon_join refine expects LoopRegion")
                contains, intersects = loop_relation(
                    la.verts, la.origin_inside, lb.verts, lb.origin_inside
                )
                rows.append((int(aid), int(bid), contains, intersects))
            yield pd.DataFrame(
                rows, columns=["aid", "bid", "contains", "intersects"]
            )

    out = cands.mapInPandas(
        fn, "aid long, bid long, contains boolean, intersects boolean"
    )
    return out.where(F.col("intersects"))


def _chain_of(region) -> tuple[np.ndarray, bool]:
    from geo_spark.kernel.regions import PolylineRegion

    if isinstance(region, LoopRegion):
        return region.verts, True
    if isinstance(region, PolylineRegion):
        return region.verts, False
    raise TypeError(f"crossing join needs chains, got {type(region).__name__}")


def crossing_edge_join(a: Layer, b: Layer) -> DataFrame:
    """CrossingEdgeQuery analog (s2/crossing_edge_query.go:31-390):
    (aid, bid, n_crossings) for chain pairs with at least one interior
    edge crossing.  Candidates come from Hilbert-range overlap of the two
    covering tables (a polyline's covering contains every cell its edges
    meet, so any crossing pair shares overlapping ranges); the refine
    counts robust interior crossings (kernel/relations.chain_crossings)
    on candidate pairs only.  A-side chains are typically open
    trajectories (PolylineRegion), B-side closed region boundaries
    (LoopRegion) — both directions work."""
    from geo_spark.kernel.relations import chain_crossings

    if a.regions is None or b.regions is None:
        raise ValueError("crossing_edge_join requires closure-size layers")
    ra = _ranges(a, "a")
    rb = _ranges(b, "b")
    cands = (
        ra.join(rb, (ra["alo"] <= rb["bhi"]) & (rb["blo"] <= ra["ahi"]))
        .select("aid", "bid")
        .distinct()
    )

    a_regions = a.regions
    b_regions = b.regions

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, bid in zip(pdf["aid"].to_numpy(), pdf["bid"].to_numpy()):
                av, ac = _chain_of(a_regions[int(aid)])
                bv, bc = _chain_of(b_regions[int(bid)])
                n = chain_crossings(av, bv, a_closed=ac, b_closed=bc)
                if n:
                    rows.append((int(aid), int(bid), n))
            yield pd.DataFrame(rows, columns=["aid", "bid", "n_crossings"])

    return cands.mapInPandas(fn, "aid long, bid long, n_crossings int")


def polyline_distance_join(
    a_buffered: Layer, b: Layer, radius_rad: float
) -> DataFrame:
    """Trajectory <-> trajectory within-distance join: (aid, bid, crossed,
    within).  ``a_buffered`` must be built with
    ``distance_join.build_distance_layer`` (coverings expanded by the
    radius) so every chain within the radius overlaps the buffered
    ranges; the refine computes the exact chain-pair squared chord
    (kernel/edges.chain_pair_chord2: zero on crossing, else vertex-to-
    opposite-chain minima — the edge-pair distance property of
    s2/edge_distances.go:334-419)."""
    from geo_spark.kernel.edges import chain_pair_chord2
    from geo_spark.kernel.regions import chord2_from_angle

    if a_buffered.regions is None or b.regions is None:
        raise ValueError("polyline_distance_join requires closure-size layers")
    thr = chord2_from_angle(radius_rad)
    ra = _ranges(a_buffered, "a")
    rb = _ranges(b, "b")
    cands = (
        ra.join(rb, (ra["alo"] <= rb["bhi"]) & (rb["blo"] <= ra["ahi"]))
        .select("aid", "bid")
        .distinct()
    )
    a_regions = a_buffered.regions
    b_regions = b.regions

    def fn(batches):
        for pdf in batches:
            rows = []
            for aid, bid in zip(pdf["aid"].to_numpy(), pdf["bid"].to_numpy()):
                av, _ = _chain_of(a_regions[int(aid)])
                bv, _ = _chain_of(b_regions[int(bid)])
                c2 = chain_pair_chord2(av, bv)
                if c2 <= thr:
                    rows.append((int(aid), int(bid), c2 == 0.0, True))
            yield pd.DataFrame(
                rows, columns=["aid", "bid", "crossed", "within"]
            )

    return cands.mapInPandas(fn, "aid long, bid long, crossed boolean, within boolean")
