"""Geofence crossings: batch spec + streaming drained-equivalence on an
in-order multi-chunk source (state-carry across micro-batches)."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from geo_spark.operators.sessionize import zone_crossings
from geo_spark.streaming.geofence import stream_zone_crossings


def test_zone_crossings_spec(spark):
    rows = [
        (1, 1, 0, 21), (1, 2, 1, 21), (1, 3, 2, 22),  # 21 -> 22 at id 3
        (1, 4, 3, 21),                                # 22 -> 21 at id 4
        (2, 5, 0, 23),                                # single zone: none
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, zone long"
    )
    got = [
        (r["user_id"], r["event_id"], r["from_zone"], r["to_zone"])
        for r in zone_crossings(ev, order_cols=("ts", "event_id"))
        .orderBy("user_id", "event_id")
        .collect()
    ]
    assert got == [(1, 3, 21, 22), (1, 4, 22, 21)]


def _fixture(seed=29, n=2000, n_users=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts_us": rng.choice(np.arange(1, 100_000), n, replace=False).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "zone": rng.integers(0, 4, n).astype(np.int64),
        }
    )


def _write_ordered_chunks(df, path, n_chunks=4):
    os.makedirs(path, exist_ok=True)
    df = df.sort_values("ts_us").reset_index(drop=True)
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    t0 = time.time() - 1000
    for i in range(n_chunks):
        chunk = df.iloc[bounds[i]: bounds[i + 1]].sample(
            frac=1.0, random_state=i
        )
        fp = os.path.join(path, f"chunk-{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), fp)
        os.utime(fp, (t0 + 60 * i, t0 + 60 * i))


def test_stream_zone_crossings_matches_batch(spark, tmp_path):
    df = _fixture()
    src = str(tmp_path / "gf_src")
    _write_ordered_chunks(df, src)
    static = spark.read.parquet(src)
    want = {
        (r["user_id"], r["event_id"]): (r["from_zone"], r["to_zone"])
        for r in zone_crossings(
            static, order_cols=("ts_us", "event_id")
        ).collect()
    }
    assert len(want) > 500  # the fixture really crosses

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_zone_crossings(stream)
        .writeStream.format("memory")
        .queryName("gf_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "gf_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM gf_stream").collect()
    q.stop()
    got = {
        (r["user_id"], r["event_id"]): (r["from_zone"], r["to_zone"])
        for r in rows
    }
    assert got == want
