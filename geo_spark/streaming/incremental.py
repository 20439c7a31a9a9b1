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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.operators.dedup import (
    _jac_udf,
    _shingle_hashes,
    _splitmix64,
)

import numpy as np


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
    streamed doc (the text never crosses again); band buckets explode
    and equi-join the STATIC bucket table (stream-static inner join,
    no state); band collisions dedup via dropDuplicatesWithinWatermark
    on the pair key BEFORE the rerank so each candidate pair pays the
    exact-Jaccard cost once; the static sets table joins in only for
    candidate old ids."""
    rows = num_hashes // bands
    seeds = _splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))
    ktype = new_docs.schema[key].dataType.simpleString()
    src = new_docs.select(key, text_col, ts_col)

    def fused(batches):
        for pdf in batches:
            sigs_out, shs_out = [], []
            for t in pdf[text_col]:
                h = _shingle_hashes(t or "", n)
                m = _splitmix64(h[:, None] ^ seeds[None, :]).min(axis=0)
                sigs_out.append(m.view(np.int64).tolist())
                shs_out.append(h.view(np.int64).tolist())
            yield pd.DataFrame(
                {
                    key: pdf[key],
                    ts_col: pdf[ts_col],
                    "sig": sigs_out,
                    "_sa": shs_out,
                }
            )

    base = src.mapInPandas(
        fused,
        f"{key} {ktype}, {ts_col} timestamp, sig array<long>,"
        " _sa array<long>",
    ).withWatermark(ts_col, watermark)

    # same banding as operators.dedup._band_buckets, but with the ts
    # and shingle-set payload carried through the explode
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice(F.col("sig"), b * rows + 1, rows)).alias(
                    "bh"
                ),
            )
            for b in range(bands)
        ]
    )
    nbuck = base.select(
        F.col(key).alias("new_id"),
        F.col(ts_col).alias("ts"),
        "_sa",
        F.explode(band_arr).alias("bb"),
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
