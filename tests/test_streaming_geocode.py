"""Streaming toponym resolution == batch toponym_resolve on a drained
multi-file source (stateless stream-static stage, no duplicates)."""

from __future__ import annotations

from geo_spark.operators.geocode import toponym_resolve
from geo_spark.streaming.geocode import stream_toponym_resolve


def _gazetteer(spark):
    rows = [
        ("paris", 1, 2_100_000, 138_850_000, 182_350_000),
        ("paris", 2, 25_000, 123_660_000, 84_450_000),
        ("dallas", 5, 1_300_000, 122_780_000, 83_200_000),
        ("lyon", 6, 520_000, 135_760_000, 184_840_000),
        ("tietown", 7, 500, 100_000_000, 190_000_000),
        ("tietown", 8, 500, 80_000_000, 170_000_000),
    ]
    return spark.createDataFrame(
        rows, "name string, geo_id long, population long, lat_u long, lng_u long"
    )


def test_stream_matches_batch(spark, tmp_path):
    gz = _gazetteer(spark)
    texts = [
        "paris dallas and paris again",
        "paris lyon",
        "tietown only",
        "no places here",
        "dallas  dallas tietown",  # double space: " +" tokenizer pin
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    src = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)

    want = {
        (r["doc_id"], r["name"]): (
            r["n_mentions"], r["geo_id"], r["lat_u"], r["lng_u"]
        )
        for r in toponym_resolve(static, gz).collect()
    }
    assert want and (0, "paris") in want

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_toponym_resolve(stream, gz)
        .writeStream.format("memory")
        .queryName("topo_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM topo_stream").collect()
    q.stop()
    got = {
        (r["doc_id"], r["name"]): (
            r["n_mentions"], r["geo_id"], r["lat_u"], r["lng_u"]
        )
        for r in rows
    }
    assert len(rows) == len(got)  # one emit per (doc, name)
    assert got == want
