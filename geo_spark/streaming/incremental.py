"""Streaming incremental near-dup: admission control against a static
corpus index.

The streaming face of ``operators/dedup.py:incremental_minhash_pairs``:
documents arrive on a stream and are probed against the PERSISTED
:func:`~geo_spark.operators.dedup.minhash_index` of the corpus — the
pattern that rejects (or routes) an incoming crawl page the moment it
near-duplicates anything already held, without ever rescanning corpus
text.

Scope note (the documented streaming trade): the stream twin emits
new-vs-INDEXED pairs only.  New-vs-new pairs inside one micro-batch
would need a stream-stream self-join keyed on band buckets; the batch
operator covers them when the batch is folded into the index.  Every
stage here is stateless except one ``dropDuplicatesWithinWatermark`` on
the (new, old) pair key — the same band-collision dedup the spacetime
twin uses — so state is bounded by the watermark horizon.

Drained-stream == batch equivalence (restricted to new-vs-indexed
pairs) is asserted in tests/test_streaming_incremental.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.operators.dedup import (
    _band_bucket_expr,
    _fused_sig_sets,
    _jac_udf,
)


def stream_incremental_dedup(
    index_buckets: DataFrame,
    index_sets: DataFrame,
    new_docs: DataFrame,
    n: int = 8,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.3,
    key: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """(new_id, old_id, jaccard, ts): streaming docs whose exact
    n-gram Jaccard against an indexed doc reaches ``threshold``.

    Plan: one stateless Arrow pass fuses signature + shingle set per
    streamed doc via the SAME ``_fused_sig_sets``/``_band_bucket_expr``
    the batch operator and the persisted index use — one shingling/
    seeding/banding implementation, so the stream-static equi-join
    cannot silently desync from the index.  Band buckets equi-join the
    STATIC bucket table (no state); band collisions dedup via
    dropDuplicatesWithinWatermark on the pair key BEFORE the rerank so
    each candidate pair pays the exact-Jaccard cost once; the static
    sets table joins in only for candidate old ids.

    Cost note: the streamed doc's shingle set rides the band explode
    (``bands``x duplication in the candidate shuffle) — bounded by the
    micro-batch size, never the corpus; the dedup's state store keys
    on (new_id, old_id) + event time only, not the carried set."""
    rows = num_hashes // bands
    base = (
        _fused_sig_sets(
            new_docs, n, num_hashes, key, text_col, extra_cols=(ts_col,)
        )
        .withColumnRenamed("sh", "_sa")
        .withWatermark(ts_col, watermark)
    )
    nbuck = base.select(
        F.col(key).alias("new_id"),
        F.col(ts_col).alias("ts"),
        "_sa",
        F.explode(_band_bucket_expr(bands, rows)).alias("bb"),
    ).select(
        "new_id",
        "ts",
        "_sa",
        F.col("bb.band").alias("band"),
        F.col("bb.bh").alias("bh"),
    )
    ibuck = index_buckets.select(
        F.col(key).alias("old_id"), "band", "bh"
    )
    cands = (
        nbuck.join(ibuck, ["band", "bh"])
        .select("new_id", "old_id", "ts", "_sa")
        .dropDuplicatesWithinWatermark(["new_id", "old_id"])
    )
    osets = index_sets.select(
        F.col(key).alias("old_id"), F.col("sh").alias("_sb")
    )
    return (
        cands.join(osets, "old_id")
        .withColumn("jaccard", _jac_udf(F.col("_sa"), F.col("_sb")))
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "old_id", "jaccard", "ts")
    )
