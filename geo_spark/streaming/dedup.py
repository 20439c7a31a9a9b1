"""Streaming exact dedup: first-seen-wins over a pages/documents stream.

``dropDuplicates`` on the content digest with an event-time watermark —
state holds one digest per distinct document inside the watermark
horizon, which is what makes continuous-crawl dedup bounded: re-crawled
duplicates inside the horizon are dropped in-flight, older re-crawls are
handled by the batch fingerprint join (operators/dedup.py).
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
    return digested.withWatermark(ts_col, watermark).dropDuplicates(["text_md5"])


def run_dedup_available_now(result: DataFrame, query_name: str, checkpoint: str):
    return (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
