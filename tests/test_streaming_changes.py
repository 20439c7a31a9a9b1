"""Drained streaming change detection == batch snapshot_diff on the
same two snapshots (minus 'removed', unobservable in a fetch stream),
plus the within-batch re-fetch collapse rule."""

from __future__ import annotations

import pandas as pd

from geo_spark.operators.webcorpus import snapshot_diff
from geo_spark.streaming.changes import stream_change_detect


def _snapshots():
    # snapshot 1 (ts=1): urls a..e ; snapshot 2 (ts=2): b unchanged,
    # c changed, f added, a/e removed (absent)
    s1 = pd.DataFrame(
        {
            "url": list("abcde"),
            "ts_us": 1,
            "fp": ["h1", "h2", "h3", "h4", "h5"],
        }
    )
    s2 = pd.DataFrame(
        {
            "url": ["b", "c", "d", "f"],
            "ts_us": 2,
            "fp": ["h2", "hX", "h4", "h6"],
        }
    )
    return s1, s2


def test_stream_matches_batch_diff(spark, tmp_path):
    s1, s2 = _snapshots()
    src = str(tmp_path / "fetches")
    spark.createDataFrame(s1).coalesce(1).write.parquet(src)
    spark.createDataFrame(s2).coalesce(1).write.mode("append").parquet(src)
    static = spark.read.parquet(src)

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_change_detect(stream)
        .writeStream.format("memory")
        .queryName("chg_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM chg_stream").toPandas()
    q.stop()

    got2 = {
        r["url"]: r["status"]
        for _, r in rows[rows["ts_us"] == 2].iterrows()
    }
    old = spark.createDataFrame(s1).select("url", "fp")
    new = spark.createDataFrame(s2).select("url", "fp")
    want = {
        r["url"]: r["status"]
        for r in snapshot_diff(old, new).collect()
        if r["status"] != "removed"
    }
    assert got2 == want
    # snapshot 1 is all first sightings
    got1 = {
        r["url"]: r["status"]
        for _, r in rows[rows["ts_us"] == 1].iterrows()
    }
    assert got1 == {u: "added" for u in "abcde"}


def test_within_batch_refetch_sequence(spark, tmp_path):
    # three fetches of one url inside a single micro-batch: each gets
    # a status against the RUNNING fingerprint
    pdf = pd.DataFrame(
        {
            "url": ["u", "u", "u"],
            "ts_us": [1, 2, 3],
            "fp": ["h1", "h1", "h2"],
        }
    )
    src = str(tmp_path / "one")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)
    stream = spark.readStream.schema(static.schema).parquet(src)
    q = (
        stream_change_detect(stream)
        .writeStream.format("memory")
        .queryName("chg_one")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = (
        spark.sql("SELECT * FROM chg_one")
        .toPandas()
        .sort_values("ts_us")
    )
    q.stop()
    assert rows["status"].tolist() == ["added", "unchanged", "changed"]


def test_bigint_fingerprint_cross_batch(spark, tmp_path):
    # BIGINT fingerprints (e.g. xxhash64) must compare equal against
    # the persisted string state: an unchanged re-fetch in a LATER
    # micro-batch is 'unchanged', not 'changed' forever.
    b1 = pd.DataFrame({"url": ["u", "w"], "ts_us": [1, 1], "fp": [12345678901234, 7]})
    b2 = pd.DataFrame({"url": ["u", "w"], "ts_us": [2, 2], "fp": [12345678901234, 8]})
    src = str(tmp_path / "bigfp")
    spark.createDataFrame(b1).coalesce(1).write.parquet(src)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_change_detect(stream)
        .writeStream.format("memory")
        .queryName("chg_bigfp")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM chg_bigfp").toPandas()
    q.stop()
    got = {
        (r["url"], r["ts_us"]): r["status"] for _, r in rows.iterrows()
    }
    assert got == {
        ("u", 1): "added",
        ("w", 1): "added",
        ("u", 2): "unchanged",
        ("w", 2): "changed",
    }
