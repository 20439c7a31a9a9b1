"""Geometry <-> geometry join (polygon/polygon relations).

Candidates: covering-term **equi-join** between the two layers — the
region x region form of the RegionTermIndexer scheme
(s2/region_term_indexer.go:158-261): two coverings overlap iff one
covering cell is an ancestor of (or equal to) a cell on the other side,
so each side emits its covering cells plus their ancestors at the other
side's levels and the join is a plain hash join on the cell key.  This
is the shape that scales: hash-partitioned, AQE-optimizable,
broadcastable when one side is small — no cartesian range comparison.
Refine: pairwise loop relations (kernel/relations.py) on the candidate
pairs only, geometries shipped in the closure (layers are dimension
tables).
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


def _term_keys(
    layer: Layer, other_levels: list[int], prefix: str, cov_ch: int, anc_ch: int
) -> DataFrame:
    """One row per (geom, (channel, cell)) term.  Channels make the
    candidate set EXACT (no sibling false positives): a raw covering
    cell on channel ``cov_ch`` only ever matches the other side's
    ancestor emissions on the same channel, so a match certifies true
    ancestor/descendant (or equal) overlap, never two distinct cells
    sharing a coarser ancestor."""
    cov = layer.covering
    terms = F.array_distinct(
        F.array(
            F.struct(
                F.lit(cov_ch).alias("ch"), F.col("cell").alias("c")
            ),
            *[
                F.struct(
                    F.lit(anc_ch).alias("ch"),
                    F.when(
                        F.lit(l) <= F.col("level"), s2sql.parent(F.col("cell"), l)
                    )
                    .otherwise(F.col("cell"))
                    .alias("c"),
                )
                for l in other_levels
            ],
        )
    )
    return cov.select(
        F.col("geom_id").alias(f"{prefix}id"), F.explode(terms).alias("_term")
    )


def _pair_candidates(a: Layer, b: Layer) -> DataFrame:
    """(aid, bid) pairs whose coverings overlap — hash equi-join on
    (channel, cell) terms; the candidate set equals the full
    range-overlap comparison, without the cartesian."""
    ta = _term_keys(a, b.levels, "a", cov_ch=0, anc_ch=1)
    tb = _term_keys(b, a.levels, "b", cov_ch=1, anc_ch=0)
    return ta.join(tb, "_term").select("aid", "bid").distinct()


def polygon_polygon_join(a: Layer, b: Layer) -> DataFrame:
    """(aid, bid, contains, intersects) for candidate pairs whose
    coverings overlap; non-candidates are provably disjoint."""
    if a.regions is None or b.regions is None:
        raise ValueError("polygon_polygon_join requires closure-size layers")
    cands = _pair_candidates(a, b)

    a_regions = a.regions
    b_regions = b.regions

    def fn(batches):
        from geo_spark.kernel.regions import PolygonRegion
        from geo_spark.kernel.relations import polygon_relation

        def loops_of(region):
            if isinstance(region, LoopRegion):
                return [(region.verts, region.origin_inside)]
            if isinstance(region, PolygonRegion):
                return [(lp.verts, lp.origin_inside) for lp in region.loops]
            raise TypeError(
                "polygon_polygon_join refine expects Loop/PolygonRegion, "
                f"got {type(region).__name__}"
            )

        for pdf in batches:
            rows = []
            for aid, bid in zip(pdf["aid"].to_numpy(), pdf["bid"].to_numpy()):
                la = a_regions[int(aid)]
                lb = b_regions[int(bid)]
                if isinstance(la, LoopRegion) and isinstance(lb, LoopRegion):
                    contains, intersects = loop_relation(
                        la.verts, la.origin_inside, lb.verts, lb.origin_inside
                    )
                else:
                    contains, intersects = polygon_relation(
                        loops_of(la), loops_of(lb)
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
    edge crossing.  Candidates come from the covering-term equi-join (a
    polyline's covering contains every cell its edges meet, so any
    crossing pair shares overlapping covering cells); the refine
    counts robust interior crossings (kernel/relations.chain_crossings)
    on candidate pairs only.  A-side chains are typically open
    trajectories (PolylineRegion), B-side closed region boundaries
    (LoopRegion) — both directions work."""
    if a.regions is None or b.regions is None:
        raise ValueError("crossing_edge_join requires closure-size layers")
    cands = _pair_candidates(a, b)

    a_regions = a.regions
    b_regions = b.regions

    def fn(batches):
        # closed chains pre-closed (first vertex appended) so the batch
        # kernel treats everything as open; one vectorized call per
        # batch (kernel/relations.chain_pairs_crossings_indexed)
        from geo_spark.kernel.edges import pad_chain_table
        from geo_spark.kernel.relations import chain_pairs_crossings_indexed

        def closed_chains(regions):
            ids = sorted(regions)
            chains = []
            for g in ids:
                v, c = _chain_of(regions[g])
                chains.append(np.vstack([v, v[:1]]) if c else v)
            return ids, chains

        a_ids, a_chains = closed_chains(a_regions)
        b_ids, b_chains = closed_chains(b_regions)
        a_pos = {g: i for i, g in enumerate(a_ids)}
        b_pos = {g: i for i, g in enumerate(b_ids)}
        A, lenA = pad_chain_table(a_chains)
        B, lenB = pad_chain_table(b_chains)
        for pdf in batches:
            if not len(pdf):
                continue
            aid = pdf["aid"].to_numpy(np.int64)
            bid = pdf["bid"].to_numpy(np.int64)
            ai = np.array([a_pos[int(g)] for g in aid], dtype=np.int64)
            bi = np.array([b_pos[int(g)] for g in bid], dtype=np.int64)
            cnt = chain_pairs_crossings_indexed(A, lenA, B, lenB, ai, bi)
            keep = cnt > 0
            yield pd.DataFrame(
                {
                    "aid": aid[keep],
                    "bid": bid[keep],
                    "n_crossings": cnt[keep].astype(np.int32),
                }
            )

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
    from geo_spark.kernel.edges import (
        chain_pairs_chord2_indexed,
        pad_chain_table,
    )
    from geo_spark.kernel.regions import chord2_from_angle

    if a_buffered.regions is None or b.regions is None:
        raise ValueError("polyline_distance_join requires closure-size layers")
    thr = chord2_from_angle(radius_rad)
    cands = _pair_candidates(a_buffered, b)
    a_regions = a_buffered.regions
    b_regions = b.regions

    def fn(batches):
        # padded chain tables built once per task from the closure
        # layers; per batch the refine is ONE vectorized kernel call
        # over index arrays (the per-pair Python loop it replaced cost
        # ~500s at 1M pairs — kernel/edges.chain_pairs_chord2_indexed)
        a_ids = sorted(a_regions)
        b_ids = sorted(b_regions)
        a_pos = {g: i for i, g in enumerate(a_ids)}
        b_pos = {g: i for i, g in enumerate(b_ids)}
        A, lenA = pad_chain_table([_chain_of(a_regions[g])[0] for g in a_ids])
        B, lenB = pad_chain_table([_chain_of(b_regions[g])[0] for g in b_ids])
        for pdf in batches:
            if not len(pdf):
                continue
            aid = pdf["aid"].to_numpy(np.int64)
            bid = pdf["bid"].to_numpy(np.int64)
            ai = np.array([a_pos[int(g)] for g in aid], dtype=np.int64)
            bi = np.array([b_pos[int(g)] for g in bid], dtype=np.int64)
            c2 = chain_pairs_chord2_indexed(A, lenA, B, lenB, ai, bi)
            keep = c2 <= thr
            yield pd.DataFrame(
                {
                    "aid": aid[keep],
                    "bid": bid[keep],
                    "crossed": c2[keep] == 0.0,
                    "within": np.ones(int(keep.sum()), dtype=bool),
                }
            )

    return cands.mapInPandas(fn, "aid long, bid long, crossed boolean, within boolean")
