"""Streaming contamination score == batch contamination_score on a
drained multi-file source (stateless stream-static stage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_spark.operators.dedup import contamination_score
from geo_spark.streaming.contamination import stream_contamination_score


def test_stream_matches_batch(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    probes = docs.where(F.col("doc_id") % 9 == 0)
    src = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)

    want = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["frac_e6"])
        for r in contamination_score(static, probes, n=12).collect()
    }
    assert want and any(v[1] > 0 for v in want.values())

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_contamination_score(stream, probes, n=12)
        .writeStream.format("memory")
        .queryName("contam_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM contam_stream").collect()
    q.stop()
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["frac_e6"])
        for r in rows
    }
    assert len(rows) == len(got)  # one emit per doc
    assert got == want
