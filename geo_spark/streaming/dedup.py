"""Streaming exact dedup: first-seen-wins over a pages/documents stream.

``dropDuplicatesWithinWatermark`` on the content digest — unlike plain
``dropDuplicates`` (whose state is only evicted when the event-time
column is part of the key set), it evicts each digest once it falls
behind the watermark, so state stays bounded on a continuous stream:
re-crawled duplicates inside the horizon are dropped in-flight, older
re-crawls are handled by the batch fingerprint join (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    pages: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "2 hours",
) -> DataFrame:
    """Distinct-content rows (first occurrence per md5 within the
    watermark horizon)."""
    digested = pages.withColumn("text_md5", F.md5(F.col(text_col)))
    return digested.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_md5"]
    )


def run_dedup_available_now(result: DataFrame, query_name: str, checkpoint: str):
    return (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
