"""Tile assignment: leaf cell encode (vectorized UDF) + native-SQL parents.

The flagship P1 pipeline (SURVEY.md §7 P1): pages -> geotags -> level-30 leaf
cell (one pandas-UDF pass) -> tile columns Parent(cell, l) as pure JVM bit
math -> per-tile aggregates.  Parent() is s2/cellid.go:177-180; grouping by
the level-l parent is *identical* to grouping by the (face, i>>k, j>>k)
quadtree prefix, which is what the DuckDB oracles verify independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql
from geo_spark.functions.s2 import s2_cellid


def with_cell_id(
    df: DataFrame, lat_col: str = "lat", lng_col: str = "lng", out: str = "cell_id"
) -> DataFrame:
    """Adds the biased-int64 level-30 leaf cell id."""
    return df.withColumn(out, s2_cellid(F.col(lat_col), F.col(lng_col)))


def with_tiles(df: DataFrame, levels: tuple[int, ...] = (10, 16), cell_col: str = "cell_id") -> DataFrame:
    """Adds tile_l{level} columns — native bit math, whole-stage codegen."""
    for lvl in levels:
        df = df.withColumn(f"tile_l{lvl}", s2sql.parent(F.col(cell_col), lvl))
    return df


def tile_counts(
    df: DataFrame, level: int, cell_col: str = "cell_id", sort: bool = True
) -> DataFrame:
    """Pages per tile at a level.  Map-side partial aggregation is free
    (hash agg); with ``sort=True`` output is ordered by tile id = Hilbert
    order, the locality-preserving write order for downstream consumers
    (skip it when the consumer repartitions anyway — the global sort is
    an extra full shuffle)."""
    # Null cells are filtered AFTER the aggregation (one group) — a
    # pre-agg filter on the UDF output gets pushed below the projection and
    # duplicates the ArrowEvalPython node, running the UDF twice per row.
    tile = s2sql.parent(F.col(cell_col), level).alias("tile")
    out = (
        df.groupBy(tile)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("tile").isNotNull())
    )
    return out.orderBy("tile") if sort else out


def quadkey_pyramid(
    df: DataFrame,
    zoom: int,
    latlng: tuple[str, str] = ("lat", "lng"),
) -> DataFrame:
    """Full web-map aggregation pyramid: per-tile counts at EVERY zoom
    0..zoom, in two shuffles total regardless of depth.

    Shape for the 10^12-row table: the raw rows first collapse to
    base-zoom tiles (<= 4^zoom groups, map-side combined — the only
    shuffle that touches full data), then the pyramid is built by
    exploding each base tile's zoom+1 quadkey prefixes and re-summing —
    the explode multiplies the *tile* table (bounded, tiny next to the
    input), never the input.  The naive per-zoom loop would rescan or
    reshuffle the input `zoom` times; the naive explode-first plan
    multiplies the input by zoom+1 before any combine.

    Output: (zoom, qk, cnt) with qk = '' at zoom 0."""
    from geo_spark.functions.webgrid import quadkey_from_latlng

    base = (
        df.select(
            quadkey_from_latlng(F.col(latlng[0]), F.col(latlng[1]), zoom).alias("qk")
        )
        .groupBy("qk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pre = F.posexplode(
        F.array(*[F.substring(F.col("qk"), 1, z) for z in range(zoom + 1)])
    )
    return (
        base.select(pre.alias("zoom", "qk_pre"), "cnt")
        .groupBy("zoom", "qk_pre")
        .agg(F.sum("cnt").alias("cnt"))
        .select(F.col("zoom").cast("int").alias("zoom"), F.col("qk_pre").alias("qk"), "cnt")
    )
