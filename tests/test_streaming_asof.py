"""Streaming as-of enrichment == batch asof_join on a drained,
in-order source (several micro-batches so the cross-batch state-carry
path runs; within-batch arrival order is shuffled on purpose)."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from geo_spark.operators.asof import asof_join
from geo_spark.streaming.asof import stream_asof_enrich


def _fixture(seed=17, n=1200, n_keys=9):
    rng = np.random.default_rng(seed)
    side = rng.random(n) < 0.35  # ~35% dimension updates
    df = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n).astype(np.int64),
            "ts": rng.choice(np.arange(1, 50_000), n, replace=False).astype(
                np.int64
            ),
            "rid": np.arange(n, dtype=np.int64),
            "val": rng.integers(0, 10_000, n).astype(np.int64),
            "is_dim": side,
        }
    )
    return df


def _write_ordered_chunks(df, path, n_chunks=4):
    """Chunk by global ts order (the in-order contract), shuffle rows
    WITHIN each chunk, and pin strictly increasing mtimes so the file
    source drains the chunks in event-time order."""
    os.makedirs(path, exist_ok=True)
    df = df.sort_values("ts").reset_index(drop=True)
    bounds = np.linspace(0, len(df), n_chunks + 1).astype(int)
    t0 = time.time() - 1000
    for i in range(n_chunks):
        chunk = df.iloc[bounds[i] : bounds[i + 1]].sample(
            frac=1.0, random_state=i
        )
        fp = os.path.join(path, f"chunk-{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(chunk, preserve_index=False), fp)
        os.utime(fp, (t0 + 60 * i, t0 + 60 * i))


def test_stream_asof_matches_batch(spark, tmp_path):
    df = _fixture()
    src = str(tmp_path / "asof_src")
    _write_ordered_chunks(df, src)

    static = spark.read.parquet(src)
    facts_b = static.where("NOT is_dim").select("k", "ts", "rid")
    dims_b = static.where("is_dim").select(
        "k", "ts", "rid", "val"
    )
    want_df = asof_join(
        facts_b,
        dims_b,
        keys=["k"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["val"],
        tolerance=8_000,
        right_tiebreak="val",
    ).toPandas()
    want = {
        int(r["rid"]): (
            None if pd.isna(r["r_ts"]) else int(r["r_ts"]),
            None if pd.isna(r["r_val"]) else int(r["r_val"]),
        )
        for _, r in want_df.iterrows()
    }

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    facts_s = stream.where("NOT is_dim")
    dims_s = stream.where("is_dim")
    q = (
        stream_asof_enrich(
            facts_s,
            dims_s,
            key="k",
            fact_id="rid",
            fact_ts="ts",
            dim_ts="ts",
            dim_val="val",
            tolerance=8_000,
        )
        .writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM asof_stream").toPandas()
    q.stop()

    assert len(rows) == len(want)  # each fact emitted exactly once
    got = {
        int(r["fact_id"]): (
            None if pd.isna(r["r_ts"]) else int(r["r_ts"]),
            None if pd.isna(r["r_val"]) else int(r["r_val"]),
        )
        for _, r in rows.iterrows()
    }
    assert got == want


def test_stream_asof_state_survives_dimless_batches(spark, tmp_path):
    """A key whose dimension row arrives only in the first chunk must
    still enrich facts in later chunks (state carry)."""
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1],
            "ts": [10, 20, 30_000, 40_000],
            "rid": [0, 1, 2, 3],
            "val": [111, 0, 0, 0],
            "is_dim": [True, False, False, False],
        }
    )
    src = str(tmp_path / "asof_carry")
    _write_ordered_chunks(df, src, n_chunks=4)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_asof_enrich(
            stream.where("NOT is_dim"),
            stream.where("is_dim"),
            key="k",
            fact_id="rid",
            fact_ts="ts",
            dim_ts="ts",
            dim_val="val",
        )
        .writeStream.format("memory")
        .queryName("asof_carry")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = (
        spark.sql("SELECT * FROM asof_carry")
        .toPandas()
        .sort_values("fact_id")
    )
    q.stop()
    assert list(rows["r_val"]) == [111, 111, 111]
