"""Tile-center inverse mercator: the center of a point's tile must map
back to the same tile (round-trip through the explicit-exp formula used
by q_zonal_stats on both engines)."""

import numpy as np
from pyspark.sql import functions as F

from geo_spark.functions.webgrid import mercator_xy_cols

ZOOM = 6


def test_tile_center_round_trip(spark):
    import __spark_entry__ as e

    rng = np.random.default_rng(3)
    lat = rng.uniform(-85.0, 85.0, 500)  # mercator validity band
    lng = rng.uniform(-180.0, 180.0, 500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lng)], "lat double, lng double"
    )
    tx, ty = mercator_xy_cols(F.col("lat"), F.col("lng"), ZOOM)
    tiles = df.select(tx.alias("tx"), ty.alias("ty"))
    lat_sql, lng_sql = e._tile_center_sqls(ZOOM)
    centers = tiles.select(
        "tx",
        "ty",
        F.expr(lat_sql.format(ty="ty")).alias("clat"),
        F.expr(lng_sql.format(tx="tx")).alias("clng"),
    )
    tx2, ty2 = mercator_xy_cols(F.col("clat"), F.col("clng"), ZOOM)
    bad = centers.select(
        ((tx2 != F.col("tx")) | (ty2 != F.col("ty"))).alias("bad")
    ).where(F.col("bad"))
    assert bad.count() == 0
