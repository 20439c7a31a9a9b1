"""Spark measure aggregates vs kernel golden values."""

from __future__ import annotations

import math

import pytest

from geo_spark.kernel import measures as M
from geo_spark.kernel.pip import latlng_text_to_xyz
from geo_spark.operators.measures_ops import polygon_areas, polyline_length_udf

from pyspark.sql import functions as F


def _loops_df(spark):
    outer = latlng_text_to_xyz("39:-76, 39:-71, 43:-71, 43:-76")
    hole = latlng_text_to_xyz("40:-74, 40:-73, 41:-73, 41:-74")
    hemi = latlng_text_to_xyz("0:-180, 0:-90, 0:0, 0:90")
    rows = [
        (1, 0, 0, [[float(c) for c in v] for v in outer]),
        (1, 1, 1, [[float(c) for c in v] for v in hole]),
        (2, 0, 0, [[float(c) for c in v] for v in hemi]),
    ]
    return spark.createDataFrame(
        rows, "polygon_id long, loop_id int, depth int, verts array<array<double>>"
    )


def test_polygon_areas(spark):
    got = {r["polygon_id"]: r for r in polygon_areas(_loops_df(spark)).collect()}
    outer = latlng_text_to_xyz("39:-76, 39:-71, 43:-71, 43:-76")
    hole = latlng_text_to_xyz("40:-74, 40:-73, 41:-73, 41:-74")
    expect1 = M.loop_area(outer) - M.loop_area(hole)
    assert got[1]["area"] == pytest.approx(expect1, rel=1e-12)
    assert got[1]["n_loops"] == 2
    assert got[2]["area"] == pytest.approx(2 * math.pi, rel=1e-12)


def test_polyline_length_udf(spark):
    pl = latlng_text_to_xyz("0:0, 0:45, 0:90, 45:90")
    df = spark.createDataFrame(
        [(1, [[float(c) for c in v] for v in pl])], "pl_id long, verts array<array<double>>"
    )
    got = df.select(polyline_length_udf(F.col("verts")).alias("len")).first()["len"]
    assert got == pytest.approx(3 * math.pi / 4, rel=1e-12)
