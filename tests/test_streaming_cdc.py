"""Drained streaming CDC == batch cdc_apply on the same change log."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.cdc import cdc_apply
from geo_spark.streaming.cdc import stream_cdc_apply


def test_stream_cdc_matches_batch(spark, tmp_path):
    rng = np.random.default_rng(21)
    base = {int(k): f"p{k}" for k in range(30)}
    seen = set()
    changes = []
    for _ in range(150):
        k = int(rng.integers(0, 45))
        ts = int(rng.integers(1, 40))
        op = "D" if rng.random() < 0.3 else "U"
        if (k, ts, op) in seen:
            continue
        seen.add((k, ts, op))
        changes.append((k, ts, op, f"v{k}_{ts}"))

    # the stream sees the base as ts=0 upserts, then the change log
    src = str(tmp_path / "cdc")
    base_pdf = pd.DataFrame(
        [(k, 0, "U", v) for k, v in base.items()],
        columns=["id", "ts", "op", "v"],
    )
    chg_pdf = pd.DataFrame(changes, columns=["id", "ts", "op", "v"])
    spark.createDataFrame(base_pdf).coalesce(1).write.parquet(src)
    spark.createDataFrame(chg_pdf).coalesce(2).write.mode("append").parquet(
        src
    )
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_cdc_apply(stream)
        .writeStream.format("memory")
        .queryName("cdc_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM cdc_stream").toPandas()
    q.stop()
    # final emission per key = highest version_ts row (update mode may
    # emit a key several times across batches)
    final = {}
    for _, r in rows.sort_values(["version_ts"]).iterrows():
        final[r["id"]] = (r["version_ts"], r["v"], r["deleted"])
    got = {
        k: (v, ts) for k, (ts, v, dele) in final.items() if not dele
    }

    bdf = spark.createDataFrame(
        list(base.items()), "id long, v string"
    )
    cdf = spark.createDataFrame(
        changes, "id long, ts long, op string, v string"
    )
    want = {
        r["id"]: (r["v"], r["version_ts"])
        for r in cdc_apply(bdf, cdf, "id", ["v"]).collect()
    }
    assert got == want


def test_null_payload_matches_batch(spark, tmp_path):
    # NULL payloads (deletes carrying no value, upserts clearing a
    # field) must stay NULL in stream state — str(None) would emit the
    # literal 'None' and break drained == batch equivalence.
    changes = [
        (1, 1, "U", "a"),
        (1, 2, "U", None),  # upsert clearing the value
        (2, 1, "U", "b"),
        (2, 2, "D", None),  # delete with no payload
        (3, 1, "U", None),  # only ever null
    ]
    chg_pdf = pd.DataFrame(changes, columns=["id", "ts", "op", "v"])
    src = str(tmp_path / "cdcnull")
    spark.createDataFrame(
        chg_pdf, "id long, ts long, op string, v string"
    ).coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        stream_cdc_apply(stream)
        .writeStream.format("memory")
        .queryName("cdc_null")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM cdc_null").toPandas()
    q.stop()
    final = {}
    for _, r in rows.sort_values(["version_ts"]).iterrows():
        final[r["id"]] = (r["version_ts"], r["v"], r["deleted"])
    got = {k: (v, ts) for k, (ts, v, dele) in final.items() if not dele}

    bdf = spark.createDataFrame([], "id long, v string")
    cdf = spark.createDataFrame(changes, "id long, ts long, op string, v string")
    want = {
        r["id"]: (r["v"], r["version_ts"])
        for r in cdc_apply(bdf, cdf, "id", ["v"]).collect()
    }
    assert got == want
    assert got[1] == (None, 2)  # NULL preserved, not 'None'
    assert got[3] == (None, 1)
