"""Drained stream_tile_daily_counts == batch tile_daily_counts, and the
trend-band finisher over the drained table == tile_theil_sen_band
(the 19th batch==stream pair)."""

from __future__ import annotations

import pandas as pd

from geo_spark.operators.tiling import (
    tile_daily_counts,
    tile_theil_sen_band,
    trend_band_from_daily,
)
from geo_spark.streaming.trend import stream_tile_daily_counts

DAY = 86_400_000_000
ZOOM = 2


def _events():
    rows = []
    tiles = {
        (10.0, 10.0): {0: 5, 1: 7, 2: 9, 3: 11, 4: 40},
        (40.0, -100.0): {0: 20, 2: 14, 5: 8, 7: 30},
        (-60.0, -150.0): {1: 3},
    }
    for (la, ln), days in tiles.items():
        for d, c in days.items():
            for i in range(c):
                rows.append((float(la), float(ln), d * DAY + 11 * i))
    return pd.DataFrame(rows, columns=["lat", "lng", "ts_us"])


def _drain_daily(spark, tmp_path, frames):
    src = str(tmp_path / "events")
    schema = "lat double, lng double, ts_us long"
    for i, f in enumerate(frames):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(f, schema).coalesce(1).write.mode(mode).parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_tile_daily_counts(stream, ZOOM)
        .writeStream.format("memory")
        .queryName("trend_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    drained = spark.sql("SELECT * FROM trend_stream")
    drained = spark.createDataFrame(
        drained.toPandas(), "qk string, day long, cnt long"
    )
    q.stop()
    return static, drained


def test_drained_daily_equals_batch(spark, tmp_path):
    ev = _events()
    static, drained = _drain_daily(
        spark, tmp_path, [ev.iloc[:40], ev.iloc[40:90], ev.iloc[90:]]
    )
    got = drained.toPandas().sort_values(["qk", "day"]).reset_index(drop=True)
    want = (
        tile_daily_counts(static, ZOOM)
        .toPandas()
        .sort_values(["qk", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"day": "int64", "cnt": "int64"}),
        want.astype({"day": "int64", "cnt": "int64"}),
    )


def test_band_over_drained_equals_batch(spark, tmp_path):
    ev = _events()
    static, drained = _drain_daily(
        spark, tmp_path, [ev.iloc[:60], ev.iloc[60:]]
    )
    got = (
        trend_band_from_daily(drained)
        .toPandas()
        .sort_values("qk")
        .reset_index(drop=True)
    )
    want = (
        tile_theil_sen_band(static, ZOOM)
        .toPandas()
        .sort_values("qk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_watermarked_plan_has_event_time_state(spark):
    """The continuous-deployment mode: with an event-time column the
    streaming aggregate must carry a watermark (bounded state)."""
    import pyspark.sql.functions as F

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .select(
            F.lit(1.0).alias("lat"),
            F.lit(2.0).alias("lng"),
            (F.unix_timestamp("timestamp") * 1_000_000).alias("ts_us"),
            F.col("timestamp").alias("ev_time"),
        )
    )
    out = stream_tile_daily_counts(
        src, ZOOM, event_time_col="ev_time", watermark="1 hour"
    )
    assert "watermark" in out._jdf.queryExecution().analyzed().toString().lower()
