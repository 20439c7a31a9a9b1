"""Checkpoint manifest: per-partition lineage + row counts, idempotent
resume (the north rule's mid-run recovery contract).

The output is hash-partitioned by a bucket column (e.g. a coarse tile);
after each successful write the manifest records, per bucket:
``rows`` and an order-insensitive content hash (sum of xxhash64 over all
columns, exact decimal accumulation).  On resume, buckets already in the
manifest are skipped — the write path filters them out *before* any
shuffle, so a 99%-complete 10^12-row job redoes only the missing 1%.
Dynamic partition overwrite keeps a half-written bucket from poisoning
the output: rewriting a bucket replaces exactly that directory.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_manifest(manifest_path: str) -> dict[str, dict]:
    if not os.path.exists(manifest_path):
        return {}
    entries: dict[str, dict] = {}
    with open(manifest_path) as f:
        for line in f:
            if line.strip():
                e = json.loads(line)
                entries[str(e["bucket"])] = e
    return entries


def _bucket_stats(df: DataFrame, bucket_col: str) -> DataFrame:
    cols = [c for c in df.columns]
    content_hash = F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).cast("string")
    return df.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("rows"), content_hash.alias("content_hash")
    )


def write_with_manifest(
    df: DataFrame,
    out_path: str,
    bucket_col: str,
    manifest_path: str,
) -> dict[str, dict]:
    """Write df partitioned by bucket_col, skipping buckets the manifest
    already records; returns the updated manifest dict."""
    spark = df.sparkSession
    done = load_manifest(manifest_path)
    if done:
        done_vals = list(done.keys())
        todo = df.where(~F.col(bucket_col).cast("string").isin(done_vals))
    else:
        todo = df

    if todo.isEmpty():
        return done

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        todo.write.mode("overwrite").partitionBy(bucket_col).parquet(out_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # Lineage pass over what was just written (reads back the committed
    # files, so the manifest describes the durable output, not the plan).
    written = spark.read.parquet(out_path).where(
        ~F.col(bucket_col).cast("string").isin(list(done.keys()))
        if done
        else F.lit(True)
    )
    stats = _bucket_stats(written, bucket_col).collect()
    with open(manifest_path, "a") as f:
        for r in stats:
            entry = {
                "bucket": str(r[bucket_col]),
                "rows": r["rows"],
                "content_hash": r["content_hash"],
            }
            done[entry["bucket"]] = entry
            f.write(json.dumps(entry) + "\n")
    return done


def verify_manifest(
    spark: SparkSession, out_path: str, bucket_col: str, manifest_path: str
) -> list[str]:
    """Audit: re-derive per-bucket stats from the output and return the
    buckets whose rows/content_hash disagree with the manifest."""
    recorded = load_manifest(manifest_path)
    actual = {
        str(r[bucket_col]): r
        for r in _bucket_stats(spark.read.parquet(out_path), bucket_col).collect()
    }
    bad = []
    for bucket, entry in recorded.items():
        a = actual.get(bucket)
        if (
            a is None
            or a["rows"] != entry["rows"]
            or a["content_hash"] != entry["content_hash"]
        ):
            bad.append(bucket)
    bad.extend(b for b in actual if b not in recorded)
    return sorted(bad)
