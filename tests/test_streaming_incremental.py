"""Streaming incremental near-dup == batch incremental_minhash_pairs
restricted to new-vs-indexed pairs, on a drained multi-file source."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from geo_spark.operators.dedup import incremental_minhash_pairs, minhash_index
from geo_spark.streaming.incremental import stream_incremental_dedup

BASE = "the quick brown fox jumps over the lazy dog again and again"


def _corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE + " twin"),
        (3, "completely different words live here with no overlap at all"),
        (4, "yet another unrelated corpus document body"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_matches_batch_new_vs_indexed(spark, tmp_path):
    corpus = _corpus(spark)
    buckets, sets = minhash_index(corpus, n=8)
    buckets.cache().count()
    sets.cache().count()

    t0 = datetime.datetime(2026, 1, 1)
    new_rows = [
        (10, BASE + "!", t0),
        (11, BASE + "!!", t0 + datetime.timedelta(minutes=1)),
        (12, "nothing like anything indexed whatsoever", t0),
        (13, "completely different words live here with no overlap at all?",
         t0 + datetime.timedelta(minutes=2)),
    ]
    new_docs = spark.createDataFrame(
        new_rows, "doc_id long, text string, warc_ts timestamp"
    )
    src = str(tmp_path / "newdocs")
    new_docs.repartition(3).write.parquet(src)
    static_new = spark.read.parquet(src)

    want = {
        (r["db"], r["da"]): round(r["jaccard"], 12)
        for r in incremental_minhash_pairs(
            buckets, sets, static_new.drop("warc_ts"), n=8, threshold=0.3
        ).collect()
        # batch emits canonical (da<db) incl. new-vs-new; keep only
        # new-vs-indexed, re-keyed as (new_id, old_id)
        if r["da"] < 10
    }
    assert want, "fixture must produce new-vs-indexed pairs"

    stream = (
        spark.readStream.schema(static_new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_incremental_dedup(buckets, sets, stream, n=8, threshold=0.3)
        .writeStream.format("memory")
        .queryName("inc_dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM inc_dedup_stream").collect()
    q.stop()

    got = {
        (r["new_id"], r["old_id"]): round(r["jaccard"], 12) for r in rows
    }
    assert len(rows) == len(got)  # band collisions deduped: one emit/pair
    assert got == want
    # ts rides through for downstream routing
    ts = {r["new_id"]: r["ts"] for r in rows}
    assert ts[10] == t0 and ts[11] == t0 + datetime.timedelta(minutes=1)
