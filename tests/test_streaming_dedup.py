"""Streaming exact dedup (streaming/dedup.py, built on
dropDuplicatesWithinWatermark — in the engine since round 2; this adds
the batch-equivalence contract): drained output has exactly one row
per distinct content digest, the digest set equals batch exact_dedup's,
and every surviving key belongs to its digest's group."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.dedup import exact_dedup
from geo_spark.streaming.dedup import stream_exact_dedup


def test_stream_exact_dedup_matches_batch_digests(spark, tmp_path):
    rng = np.random.default_rng(41)
    n = 2000
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc body {int(v)}" for v in rng.integers(0, 400, n)],
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
        }
    )
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(pdf).repartition(5).write.parquet(src)
    static = spark.read.parquet(src)

    batch = {
        r["text_md5"]: r["keep_id"]
        for r in exact_dedup(static).collect()
    }
    import hashlib

    grp: dict[str, set[int]] = {}
    for i, t in zip(pdf["doc_id"], pdf["text"]):
        grp.setdefault(hashlib.md5(t.encode()).hexdigest(), set()).add(int(i))

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream, ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dd_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM dd_stream").collect()
    q.stop()
    got = {r["text_md5"]: r["doc_id"] for r in rows}
    assert len(rows) == len(got)  # one row per digest
    assert set(got) == set(batch)  # same surviving content set
    for digest, kid in got.items():  # survivor from the right group
        assert kid in grp[digest]
