"""decayed_tile_counts is ONE additive groupBy aggregate, so the SAME
operator runs unchanged as a native structured-streaming aggregation
(no custom state needed — the use-the-built-in rule): drained-source
output must equal the batch run row-for-row."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.tiling import decayed_tile_counts


def _fixture(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    day = 86_400_000_000
    return pd.DataFrame(
        {
            "lat": rng.uniform(-80, 80, n),
            "lng": rng.uniform(-180, 180, n),
            "ts_us": rng.integers(0, 30 * day, n).astype(np.int64),
        }
    )


def test_stream_decayed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "trend_src")
    spark.createDataFrame(_fixture()).repartition(6).write.parquet(src)
    static = spark.read.parquet(src)
    want = {
        r["qk"]: (r["n_events"], r["score_x2w"])
        for r in decayed_tile_counts(static, zoom=3, half_life_days=2).collect()
    }

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        decayed_tile_counts(stream, zoom=3, half_life_days=2)
        .writeStream.format("memory")
        .queryName("trend_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "trend_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM trend_stream").collect()
    q.stop()
    got = {r["qk"]: (r["n_events"], r["score_x2w"]) for r in rows}
    assert got == want
