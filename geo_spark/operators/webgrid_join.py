"""Spatial joins over the interoperable web grids (geohash terms) —
the RegionTermIndexer pattern (s2/region_term_indexer.go:118-183)
transplanted onto the geohash lattice, with one property the S2 path
can't offer: the ENTIRE join is native SQL.  Point tokens are codegen
projections (`functions/webgrid.geohash_col`), rect coverings are exact
cross products of quantized index ranges (axis-aligned cells), and the
refine is a closed-interval comparison — zero Python anywhere, zero
Arrow hops, one broadcast hash join.

Scale shape (the 100 TB argument):
* rect side: tiny dim table → literal term rows built driver-side →
  `BroadcastExchange`; the page/event side never shuffles.
* multi-precision terms: each rect covers at its own adaptive precision
  (coarse for big rects, fine for small ones); the point side emits one
  prefix per precision IN USE (an `explode` of 1-3 substrings, still
  codegen) — the ancestor-terms trick, so a fat rect never forces fine
  tokens on every point.
* refine: closed lat/lng interval test with antimeridian wrap, inlined
  into the post-join filter — candidates never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_spark.functions.webgrid import geohash_col
from geo_spark.kernel.webgrid import geohash_cover_adaptive


def build_geohash_rect_layer(
    spark: SparkSession,
    rects: list[tuple[int, float, float, float, float]],
    max_cells: int = 64,
    max_precision: int = 7,
) -> DataFrame:
    """Covering-term table for a rect layer: one row per (geom_id,
    term) with the rect bounds carried for the refine.  rects =
    [(geom_id, lat_lo, lng_lo, lat_hi, lng_hi)]; lng_lo > lng_hi wraps
    the antimeridian."""
    rows = []
    for geom_id, la0, ln0, la1, ln1 in rects:
        p, cells = geohash_cover_adaptive(
            la0, la1, ln0, ln1, max_cells=max_cells, max_precision=max_precision
        )
        for c in cells:
            rows.append((geom_id, str(c), int(p), la0, ln0, la1, ln1))
    return spark.createDataFrame(
        rows, "geom_id long, term string, precision int, la0 double, "
        "ln0 double, la1 double, ln1 double"
    )


def geohash_rect_join(
    points: DataFrame,
    layer: DataFrame,
    point_key: str,
    latlng: tuple[str, str] = ("lat", "lng"),
) -> DataFrame:
    """Inner join of points to rects: broadcast term join on geohash
    prefixes + exact closed-interval refine.  Returns the point rows
    with geom_id attached (a point inside k rects appears k times)."""
    lat, lng = (F.col(latlng[0]), F.col(latlng[1]))
    precisions = sorted(
        r["precision"] for r in layer.select("precision").distinct().collect()
    )
    pmax = precisions[-1]
    gh = geohash_col(lat, lng, pmax)
    pts = points.withColumn(
        "term", F.explode(F.array(*[F.substring(gh, 1, p) for p in precisions]))
    )
    joined = pts.join(F.broadcast(layer), "term")
    in_lat = (lat >= F.col("la0")) & (lat <= F.col("la1"))
    in_lng = F.when(
        F.col("ln0") <= F.col("ln1"), (lng >= F.col("ln0")) & (lng <= F.col("ln1"))
    ).otherwise((lng >= F.col("ln0")) | (lng <= F.col("ln1")))
    return joined.where(in_lat & in_lng).drop(
        "term", "precision", "la0", "ln0", "la1", "ln1"
    )
