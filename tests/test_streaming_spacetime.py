"""Streaming spacetime join == batch spacetime join (availableNow over
parquet with a generous watermark drops nothing, so the stream-stream
banded join must reproduce the batch pair set exactly)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.spacetime import spacetime_join
from geo_spark.streaming.spacetime import stream_spacetime_join

RADIUS = 0.15
WINDOW_S = 1800.0


def _fixture(n=800, seed=21):
    rng = np.random.default_rng(seed)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        rng.integers(0, 86400, n), unit="s"
    )
    return pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "warc_ts": ts,
         "lat": lat, "lng": lng}
    )


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "st_events")
    pdf = _fixture()
    spark.createDataFrame(pdf).repartition(4).write.parquet(src)

    static = spark.read.parquet(src)
    want = {
        (r["a"], r["b"])
        for r in spacetime_join(
            static, RADIUS, WINDOW_S, key="event_id", ts_col="warc_ts"
        ).collect()
    }
    assert len(want) > 0

    stream = spark.readStream.schema(static.schema).parquet(src)
    out = stream_spacetime_join(
        stream, RADIUS, WINDOW_S, key="event_id", ts_col="warc_ts",
        watermark="10 days",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("st_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["a"], r["b"])
        for r in spark.sql("SELECT a, b FROM st_pairs").collect()
    }
    q.stop()
    assert got == want
