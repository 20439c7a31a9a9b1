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


def test_watermarked_mode_evicts_state_and_matches_batch(spark, tmp_path):
    """The continuous-deployment mode must be REAL bounded state: the
    day key derives from the watermarked event-time window, so (a) an
    append-mode sink accepts the query (a watermark the grouping keys
    don't contain is rejected at analysis time — the pre-review bug),
    and (b) the flushed windows equal the batch daily counts exactly
    (UTC-epoch-day agreement between the two modes)."""
    import pyspark.sql.functions as F

    ev = _events()
    src_dir = str(tmp_path / "wm_events")
    schema = "lat double, lng double, ts_us long"
    spark.createDataFrame(ev, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    stream = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("ev_time", F.expr("timestamp_micros(ts_us)"))
    )
    out = stream_tile_daily_counts(
        stream, ZOOM, event_time_col="ev_time", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wm_trend")
        .outputMode("append")  # only legal with a true watermarked window agg
        .option("checkpointLocation", str(tmp_path / "wm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM wm_trend").toPandas()
    q.stop()
    # append mode flushes every window whose end <= max event time - 1h:
    # the fixture's last day stays open, everything earlier must match
    # the batch daily table exactly
    static = spark.createDataFrame(ev, schema)
    want = tile_daily_counts(static, ZOOM).toPandas()
    wm_us = int(ev["ts_us"].max()) - 3_600_000_000  # max event - 1h
    want = want[(want["day"] + 1) * DAY <= wm_us]
    got = got.sort_values(["qk", "day"]).reset_index(drop=True)
    want = want.sort_values(["qk", "day"]).reset_index(drop=True)
    assert len(got) == len(want) and len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"day": "int64", "cnt": "int64"}),
        want.astype({"day": "int64", "cnt": "int64"}),
    )


def test_changepoint_over_drained_equals_batch(spark, tmp_path):
    """The changepoint finisher is a deterministic function of the
    same streamed daily table the trend family consumes — pin the
    full chain: drained counts -> changepoint == batch operator."""
    from geo_spark.operators.tiling import (
        changepoint_from_daily,
        tile_changepoint,
    )

    ev = _events()
    static, drained = _drain_daily(
        spark, tmp_path, [ev.iloc[:50], ev.iloc[50:]]
    )
    got = (
        changepoint_from_daily(drained)
        .toPandas()
        .sort_values("qk")
        .reset_index(drop=True)
    )
    want = (
        tile_changepoint(static, ZOOM)
        .toPandas()
        .sort_values("qk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
