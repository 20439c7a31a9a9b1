"""Structured-streaming tile aggregation over a pages stream.

The batch flagship (pages -> geotag extract -> S2 encode -> tile counts)
re-expressed as an incremental query: ``readStream`` parquet source ->
the same fused mapInArrow extract/encode stage -> event-time windowed
counts with a watermark for late WARC records.  State is keyed by
(window, tile) — bounded by the watermark horizon x active tiles, which
is what keeps a 10^12-row backfill streamable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_spark.operators.tiling import tile_counts  # noqa: F401  (batch twin)
from geo_spark.sources.extract import extract_encode
from geo_spark.functions import sql as s2sql

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_tile_counts(
    pages: DataFrame,
    level: int = 10,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window, tile, cnt) streaming aggregate.  The extract/encode stage
    is the identical code path as batch (same Arrow kernel), so batch and
    streaming results agree row-for-row — asserted in tests."""
    enc = extract_encode(pages, keep=("url", "warc_ts"))
    tiled = enc.withColumn("tile", s2sql.parent(F.col("cell_id"), level))
    return (
        tiled.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("tile"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("tile"),
            F.col("cnt"),
        )
    )


def run_available_now(result: DataFrame, query_name: str, checkpoint: str):
    """Drain everything currently in the source and stop (the backfill /
    test harness mode); 'complete' output keeps the final counts in the
    in-memory sink table."""
    return (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_geohash_counts(
    pages: DataFrame,
    precision: int = 5,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window, geohash, cnt) streaming aggregate with ZERO Python in
    the pipeline: geotag regex extraction, geohash token derivation
    (`functions/webgrid.geohash_col`), and the windowed count are all
    native expressions — the whole incremental query runs inside the
    JVM, so the stream scales with codegen throughput, not Arrow
    round-trips.  Same state bound as the S2 twin: (window x active
    geohash cells), pruned by the watermark."""
    from geo_spark.functions.webgrid import geohash_col
    from geo_spark.sources.geotags import with_geotags

    tagged = with_geotags(pages)
    tiled = tagged.withColumn(
        "gh", geohash_col(F.col("lat"), F.col("lng"), precision)
    )
    return (
        tiled.where(F.col("gh").isNotNull())
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("gh"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("win.start").alias("window_start"), "gh", "cnt")
    )
