"""Drained streaming skyline == batch skyline2d: multi-file parquet
source with availableNow (several micro-batches, so the state-merge
and eviction paths run), final snapshot per group identified by the
monotone n_seen marker, compared as distinct frontier pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.skyline import skyline2d
from geo_spark.streaming.skyline import stream_skyline2d


def _fixture(n=3000, seed=17):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "grp": rng.integers(0, 5, n).astype(np.int64),
            "x": np.round(rng.uniform(0, 100, n), 2),
            "y": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    # plant duplicates and a late-arriving dominating point per group:
    # the last file absorbed must evict earlier frontier members
    extra = pd.DataFrame(
        {"grp": np.arange(5, dtype=np.int64), "x": 0.01, "y": 0.01}
    )
    return pd.concat([pdf, pdf.head(40), extra], ignore_index=True)


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sky_pts")
    pdf = _fixture()
    spark.createDataFrame(pdf).repartition(8).write.parquet(src)

    static = spark.read.parquet(src)
    want = {
        (r["grp"], r["x"], r["y"])
        for r in skyline2d(static, "x", "y", by=["grp"]).collect()
    }

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream_skyline2d(stream)
        .writeStream.format("memory")
        .queryName("sky_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM sky_stream").toPandas()
    q.stop()
    got = set()
    for grp, g in rows.groupby("grp"):
        final = g[g["n_seen"] == g["n_seen"].max()]
        got |= {(int(grp), r["x"], r["y"]) for _, r in final.iterrows()}
    assert got == want


def test_eviction_mid_stream(spark, tmp_path):
    """A later batch's dominating point must shrink the frontier: the
    final snapshot is exactly the one planted point per group."""
    early = pd.DataFrame(
        {
            "grp": np.zeros(6, dtype=np.int64),
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
            "y": [6.0, 5.0, 4.0, 3.0, 2.0, 1.0],
        }
    )
    late = pd.DataFrame({"grp": [0], "x": [0.5], "y": [0.5]})
    src = str(tmp_path / "sky_evict")
    spark.createDataFrame(early).coalesce(1).write.parquet(src)
    spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(src)

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_skyline2d(stream)
        .writeStream.format("memory")
        .queryName("sky_evict")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM sky_evict").toPandas()
    q.stop()
    final = rows[rows["n_seen"] == rows["n_seen"].max()]
    assert {(r["x"], r["y"]) for _, r in final.iterrows()} == {(0.5, 0.5)}
