"""Streaming map matching == batch map_match on a drained multi-file
source (several micro-batches; zero retained state per batch)."""

from __future__ import annotations

import numpy as np

from geo_spark.kernel import cellid as ck
from geo_spark.kernel.regions import PolylineRegion
from geo_spark.operators.distance_join import build_distance_layer
from geo_spark.operators.mapmatch import map_match
from geo_spark.streaming.mapmatch import stream_map_match

RADIUS = 500_000.0 / 6_371_010.0


def _fixture(spark):
    rng = np.random.default_rng(11)
    trails = []
    for gid in range(10):
        lat = rng.uniform(-60, 60, 4)
        lng = rng.uniform(-180, 180, 4)
        x, y, z = ck.latlng_to_xyz(lat, lng)
        trails.append((gid, PolylineRegion.from_vertices(np.stack([x, y, z], 1))))
    lat = rng.uniform(-70, 70, 300)
    lng = rng.uniform(-180, 180, 300)
    rows = [
        (
            int(i),
            float(lat[i]),
            float(lng[i]),
            int(ck.to_signed(ck.cellid_from_latlng(lat[i], lng[i]))),
        )
        for i in range(300)
    ]
    pts = spark.createDataFrame(rows, "pid long, lat double, lng double, cell_id long")
    return trails, pts


def test_stream_matches_batch(spark, tmp_path):
    trails, pts = _fixture(spark)
    layer = build_distance_layer(spark, trails, RADIUS)

    src = str(tmp_path / "gps_points")
    pts.repartition(4).write.parquet(src)
    static = spark.read.parquet(src)

    want = {
        r["pid"]: (r["geom_id"], r["seg_idx"], r["chord2"])
        for r in map_match(static, layer, RADIUS, point_key="pid").collect()
    }
    assert want  # fixture produces matches

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_map_match(stream, layer, RADIUS, point_key="pid")
        .writeStream.format("memory")
        .queryName("mm_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM mm_stream").collect()
    q.stop()
    got = {r["pid"]: (r["geom_id"], r["seg_idx"], r["chord2"]) for r in rows}
    assert len(rows) == len(got)  # one emit per point (no duplicates)
    assert got == want
