"""Spatial-autocorrelation analytics over web-mercator tile lattices.

Getis-Ord Gi* hot-spot scores and global Moran's I — the standard
"where are the statistically dense tiles" layer a web-scale geotagged
corpus needs on top of plain tile rollups (tile counts alone cannot
separate a one-tile spike from a spatially coherent hot region).

Scale design
------------
Everything is native DataFrame SQL — no UDFs, no collects beyond a
single-row global-moment aggregate that is broadcast back:

* ``tile_counts``: ONE map-side-combinable groupBy of the corpus down
  to the occupied-tile table (bounded by 4**zoom rows, corpus-sized
  input never reappears downstream).
* neighbor structure: the occupied-tile table exploded by the 9 (Gi*)
  or 8 (Moran) literal offsets, equi-joined back to itself on the
  shifted (x, y) key — a shuffle of the TILE table only.  Longitude
  wraps (x is mod 2**zoom); latitude clamps (no y wrap — mercator
  tiles do not wrap across the poles).
* global moments (N, Σv, Σv²[, ΣΣ pair terms]) are EXACT BIGINT sums
  of integer tile values, reduced to one row and recombined in a fixed
  double-precision expression tree — every division/multiply/sqrt is
  IEEE-determined by the exact integer inputs, so Spark and DuckDB
  agree bitwise and the z-scores can be compared at fine fixed-point
  buckets (the q_rect_distance_buckets convention, belt and braces).

Study-region semantics: the lattice is the OCCUPIED tiles (tiles with
at least one point).  Empty tiles are not zero-valued members of the
region — the common choice for sparse planet-scale data where the
alternative (materializing all 4**zoom cells) is mostly ocean.  Stated
here because Gi*/Moran moments depend on it.

Reference basis: Getis & Ord (1992) Gi*; Moran (1950) I; binary
contiguity weights (queen/8-neighbor), self included for Gi* (the
"star" variant), excluded for Moran's I.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "tile_counts",
    "tile_counts_daily",
    "gi_star",
    "gi_star_daily",
    "emerging_hotspots",
    "morans_i",
    "GI_Z_SQL",
    "MORAN_I_SQL",
]


# Final scalar combines, shared verbatim between the Spark plan and the
# DuckDB oracle so both engines evaluate the IDENTICAL double-precision
# expression tree over exact integer inputs (the LAT_SQL convention).
# Placeholders are integer-typed column names.
# NULLIF guards the degenerate lattice where one tile's neighborhood is
# the whole study region (Gi* undefined there) — NULL in both engines,
# instead of Spark's ANSI divide-by-zero error vs DuckDB's inf.
GI_Z_SQL = (
    "((CAST({sumwx} AS DOUBLE)"
    " - (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE)) * CAST({sumw} AS DOUBLE))"
    " / NULLIF("
    "SQRT(CAST({s2} AS DOUBLE) / CAST({n} AS DOUBLE)"
    " - (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE))"
    " * (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE)))"
    " * SQRT((CAST({n} AS DOUBLE) * CAST({sumw} AS DOUBLE)"
    " - CAST({sumw} AS DOUBLE) * CAST({sumw} AS DOUBLE))"
    " / (CAST({n} AS DOUBLE) - 1.0))"
    ", 0.0))"
)

MORAN_I_SQL = (
    "((CAST({n} AS DOUBLE) / CAST({w} AS DOUBLE))"
    " * ((CAST({p} AS DOUBLE)"
    "     - (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE)) * CAST({q} AS DOUBLE)"
    "     + (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE))"
    "       * (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE))"
    "       * CAST({w} AS DOUBLE))"
    "    / (CAST({s2} AS DOUBLE)"
    "       - CAST({n} AS DOUBLE)"
    "         * (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE))"
    "         * (CAST({s1} AS DOUBLE) / CAST({n} AS DOUBLE)))))"
)


def tile_counts(
    points: DataFrame,
    zoom: int,
    lat_col: str = "lat",
    lng_col: str = "lng",
    value_col: str | None = None,
) -> DataFrame:
    """Corpus -> occupied-tile table ``(x, y, v)`` at the zoom.

    ``v`` is the point count, or the exact BIGINT sum of ``value_col``
    (which must be integer-typed: the moments downstream rely on exact
    reductions).  One partial-aggregatable shuffle keyed on at most
    4**zoom tiles.
    """
    from geo_spark.functions.webgrid import mercator_xy_cols

    x, y = mercator_xy_cols(F.col(lat_col), F.col(lng_col), zoom)
    base = points.select(x.alias("x"), y.alias("y"))
    if value_col is None:
        return base.groupBy("x", "y").agg(F.count("*").alias("v"))
    base = points.select(
        x.alias("x"), y.alias("y"), F.col(value_col).cast("long").alias("_v")
    )
    return base.groupBy("x", "y").agg(F.sum("_v").alias("v"))


def _neighbor_sums(
    tiles: DataFrame, zoom: int, include_self: bool
) -> DataFrame:
    """Per occupied tile: ``sumw`` (occupied neighbors, binary weights)
    and ``sumwx`` (sum of their v), via explode-by-offset + self
    equi-join on the tile key.  x wraps mod 2**zoom, y clamps."""
    n_tiles = 1 << zoom
    offsets = [
        (dx, dy)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        if include_self or (dx, dy) != (0, 0)
    ]
    off = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets]
    )
    # "probe" rows: for each tile, the 8/9 lattice positions whose
    # occupant (if any) contributes to this tile's neighborhood.
    probes = (
        tiles.select("x", "y", F.explode(off).alias("o"))
        .select(
            "x",
            "y",
            F.pmod(F.col("x") + F.col("o.dx"), F.lit(n_tiles)).alias("nx"),
            (F.col("y") + F.col("o.dy")).alias("ny"),
        )
        .where((F.col("ny") >= 0) & (F.col("ny") < n_tiles))
    )
    hits = probes.join(
        tiles.select(F.col("x").alias("nx"), F.col("y").alias("ny"), "v"),
        ["nx", "ny"],
    )
    return hits.groupBy("x", "y").agg(
        F.count("*").alias("sumw"), F.sum("v").alias("sumwx")
    )


def gi_star(tiles: DataFrame, zoom: int) -> DataFrame:
    """Getis-Ord Gi* z-score per occupied tile (binary queen weights,
    self included).  Input is a ``tile_counts`` table; output adds
    ``sumw``, ``sumwx`` and the double ``z``.

    The global moments (n, Σv, Σv²) reduce to one row and ride a
    broadcast cross join; the z expression is the shared
    :data:`GI_Z_SQL` tree over exact integers.
    """
    nb = _neighbor_sums(tiles, zoom, include_self=True)
    moments = tiles.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    z = GI_Z_SQL.format(n="n", s1="s1", s2="s2", sumw="sumw", sumwx="sumwx")
    return (
        tiles.join(nb, ["x", "y"])
        .crossJoin(F.broadcast(moments))
        .select("x", "y", "v", "sumw", "sumwx", F.expr(z).alias("z"))
    )


def morans_i(tiles: DataFrame, zoom: int) -> DataFrame:
    """Global Moran's I over the occupied-tile lattice (binary queen
    weights, self excluded) as a ONE-ROW DataFrame
    ``(n, w, i)`` — n tiles, w directed neighbor pairs, the statistic.

    Decomposed into exact BIGINT pair sums so the float combine is a
    fixed tree:  Σw_ij(v_i-m)(v_j-m) = P - m·Q + m²·W with
    P = Σ v_i·v_j, Q = Σ (v_i+v_j), W = pair count — every term an
    exact integer reduction over the neighbor join.
    """
    n_tiles = 1 << zoom
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    off = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets]
    )
    probes = (
        tiles.select("x", "y", "v", F.explode(off).alias("o"))
        .select(
            F.col("v").alias("vi"),
            F.pmod(F.col("x") + F.col("o.dx"), F.lit(n_tiles)).alias("nx"),
            (F.col("y") + F.col("o.dy")).alias("ny"),
        )
        .where((F.col("ny") >= 0) & (F.col("ny") < n_tiles))
    )
    pairs = probes.join(
        tiles.select(F.col("x").alias("nx"), F.col("y").alias("ny"), F.col("v").alias("vj")),
        ["nx", "ny"],
    )
    pair_moments = pairs.agg(
        F.count("*").alias("w"),
        F.sum(F.col("vi") * F.col("vj")).alias("p"),
        F.sum(F.col("vi") + F.col("vj")).alias("q"),
    )
    moments = tiles.agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    i = MORAN_I_SQL.format(n="n", w="w", p="p", q="q", s1="s1", s2="s2")
    return (
        moments.crossJoin(F.broadcast(pair_moments))
        .select("n", "w", F.expr(i).alias("i"))
    )


def tile_counts_daily(
    points: DataFrame,
    zoom: int,
    ts_us_col: str = "ts_us",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """(x, y, day, v): the space-time cube — per-tile DAILY counts,
    the slice-wise input of :func:`gi_star_daily`.  One map-side-
    combined shuffle keyed on (tile, epoch-day)."""
    from geo_spark.functions.webgrid import mercator_xy_cols

    x, y = mercator_xy_cols(F.col(lat_col), F.col(lng_col), zoom)
    day = F.expr(f"{ts_us_col} div 86400000000")
    return (
        points.select(x.alias("x"), y.alias("y"), day.alias("day"))
        .groupBy("x", "y", "day")
        .agg(F.count("*").alias("v"))
    )


def gi_star_daily(daily: DataFrame, zoom: int) -> DataFrame:
    """Getis-Ord Gi* per occupied tile PER DAY — :func:`gi_star`
    sliced along time: each day's z uses that day's occupied-tile
    neighbor sums and that day's global moments, so a tile is "hot on
    Tuesday" relative to Tuesday's surface, not the whole period's.

    Scale shape: the 9-offset probe explode and the neighbor equi-join
    carry ``day`` in the key (still an equi-join, never cartesian);
    the per-day moments table is days-sized and broadcast.  Days where
    the variance degenerates (all tiles equal) or a neighborhood spans
    every occupied tile yield NULL z via the shared GI_Z_SQL NULLIF
    guards — callers filter them.
    """
    n_tiles = 1 << zoom
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    off = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in offsets
        ]
    )
    probes = (
        daily.select("x", "y", "day", F.explode(off).alias("o"))
        .select(
            "x",
            "y",
            "day",
            F.pmod(F.col("x") + F.col("o.dx"), F.lit(n_tiles)).alias("nx"),
            (F.col("y") + F.col("o.dy")).alias("ny"),
        )
        .where((F.col("ny") >= 0) & (F.col("ny") < n_tiles))
    )
    hits = probes.join(
        daily.select(
            F.col("x").alias("nx"),
            F.col("y").alias("ny"),
            F.col("day").alias("day"),
            "v",
        ),
        ["nx", "ny", "day"],
    )
    nb = hits.groupBy("x", "y", "day").agg(
        F.count("*").alias("sumw"), F.sum("v").alias("sumwx")
    )
    moments = daily.groupBy("day").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    z = GI_Z_SQL.format(n="n", s1="s1", s2="s2", sumw="sumw", sumwx="sumwx")
    return (
        daily.join(nb, ["x", "y", "day"])
        .join(F.broadcast(moments), "day")
        .select("x", "y", "day", "v", "sumw", "sumwx", F.expr(z).alias("z"))
    )


def emerging_hotspots(
    points: DataFrame,
    zoom: int,
    ts_us_col: str = "ts_us",
    lat_col: str = "lat",
    lng_col: str = "lng",
    z_mu: int = 1960,
    hot_z: float = 1.96,
) -> DataFrame:
    """Space-time emerging-hotspot classification (the ESRI-style
    composition, re-specified exactly): per-day Gi* z-scores per tile,
    then a Mann-Kendall trend test over each tile's z SERIES, then a
    categorical read-out.

    Engine-portability argument: each day's z is the shared GI_Z_SQL
    double tree over exact integers (bit-identical on Spark and
    DuckDB), so pair-sign comparisons, exact-equality tie groups, and
    the hot threshold all see identical doubles; the MK machinery
    (S statistic, tie-corrected variance, portable isqrt C, the
    continuity-corrected integer decision) is the
    operators/tiling.tile_mann_kendall spec verbatim.  NULL-z days
    (degenerate variance / whole-region neighborhoods) are dropped
    from the series in both engines before anything else.

    Classification over (hot_now = z at the tile's LATEST non-null
    day > hot_z, n_hot = its count of hot days, trend in {-1,0,1}),
    first match wins:

      hot_now & trend=+1  -> 'intensifying'
      hot_now & trend=-1  -> 'waning'
      hot_now             -> 'persistent'
      n_hot > 0           -> 'former'
      trend=+1            -> 'emerging'
      else                -> 'none'

    Output: (x, y, n_days, s_stat, c_alpha, trend, n_hot, hot_now,
    class); tiles with fewer than 2 non-null-z days are excluded
    (no trend is defined).
    """
    from geo_spark.operators.tiling import with_kendall_c_alpha

    gz = (
        gi_star_daily(
            tile_counts_daily(points, zoom, ts_us_col, lat_col, lng_col),
            zoom,
        )
        .where(F.col("z").isNotNull())
        .select("x", "y", "day", "z")
    )
    a = gz.select("x", "y", F.col("day").alias("d1"), F.col("z").alias("z1"))
    b = gz.select("x", "y", F.col("day").alias("d2"), F.col("z").alias("z2"))
    s = (
        a.join(b, ["x", "y"])
        .where(F.col("d2") > F.col("d1"))
        .groupBy("x", "y")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN z2 > z1 THEN 1 WHEN z2 < z1 THEN -1 "
                    "ELSE 0 END"
                )
            ).alias("s_stat")
        )
    )
    ties = (
        gz.groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("x", "y")
        .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("tie_term"))
    )
    hotness = gz.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            F.when(F.col("z") > F.lit(hot_z), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_hot"),
        F.max(F.struct(F.col("day"), F.col("z"))).alias("_last"),
    )
    meta = with_kendall_c_alpha(
        hotness.where(F.col("n_days") >= 2).join(ties, ["x", "y"]),
        "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term",
        z_mu,
    )
    return (
        meta.join(s, ["x", "y"])
        .select(
            "x",
            "y",
            "n_days",
            "s_stat",
            "c_alpha",
            F.expr(
                "CAST(CASE WHEN s_stat > 0 AND s_stat - 1 > c_alpha THEN 1 "
                "          WHEN s_stat < 0 AND -s_stat - 1 > c_alpha THEN -1 "
                "          ELSE 0 END AS BIGINT)"
            ).alias("trend"),
            F.col("n_hot").cast("long").alias("n_hot"),
            (F.col("_last.z") > F.lit(hot_z)).alias("hot_now"),
        )
        .select(
            "*",
            F.expr(
                "CASE WHEN hot_now AND trend = 1 THEN 'intensifying' "
                "     WHEN hot_now AND trend = -1 THEN 'waning' "
                "     WHEN hot_now THEN 'persistent' "
                "     WHEN n_hot > 0 THEN 'former' "
                "     WHEN trend = 1 THEN 'emerging' "
                "     ELSE 'none' END"
            ).alias("class"),
        )
    )
