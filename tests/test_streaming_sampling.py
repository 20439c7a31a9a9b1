"""Streaming weighted reservoir == batch weighted_sample: drain a
multi-file parquet source (several micro-batches so the state-merge
path runs) and compare the final reservoir per stratum against the
batch operator on the same static data."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.sampling import weighted_sample
from geo_spark.streaming.sampling import stream_weighted_reservoir

QUOTA = 7


def _fixture(n=3000, seed=29):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "stratum": rng.integers(0, 5, n).astype(np.int64),
            "doc_id": np.arange(n, dtype=np.int64),
            "w": rng.uniform(0.5, 20.0, n),
        }
    )


def test_reservoir_matches_batch(spark, tmp_path):
    src = str(tmp_path / "res_docs")
    spark.createDataFrame(_fixture()).repartition(5).write.parquet(src)

    static = spark.read.parquet(src)
    want = {}
    for r in weighted_sample(static, "stratum", QUOTA, weight_col="w").collect():
        want.setdefault(r["stratum"], []).append((r["rank"], r["doc_id"]))
    for v in want.values():
        v.sort()

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_weighted_reservoir(stream, "stratum", QUOTA, weight_col="w")
        .writeStream.format("memory")
        .queryName("res_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM res_stream").toPandas()
    q.stop()

    got = {}
    for stratum, grp in rows.groupby("stratum"):
        final = grp[grp["seen"] == grp["seen"].max()].sort_values("rank")
        got[int(stratum)] = [
            (int(r["rank"]), int(r["doc_id"])) for _, r in final.iterrows()
        ]
    assert got == want
