"""Streaming exact deduplication: the continuous twin of
operators/dedup.exact_dedup's survivor selection, using the engine's
OWN stateful operator (`dropDuplicatesWithinWatermark`) — the
use-the-built-in rule (streaming/sessions.py): when structured
streaming already ships the stateful primitive, wrap it, don't rebuild
it in applyInPandasWithState.

Semantics differ from batch by design and are stated here: batch
exact_dedup keeps the MIN key per content group over the whole corpus;
the streaming pass keeps the FIRST-SEEN key per content digest inside
the watermark horizon (state for a digest is dropped once the watermark
passes it — the bound that makes infinite streams feasible).  On a
drained in-order source where each duplicate group arrives within one
horizon, the set of SURVIVING digests is identical; which key survives
can differ (first-seen vs min) — both sides of that contract are
asserted in tests/test_streaming_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    docs: DataFrame,
    watermark_delay: str = "10 minutes",
    key: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """docs(key, text, ts) stream -> one row per distinct content
    digest within the watermark horizon: (text_md5, keep_id, ts)."""
    return (
        docs.select(
            F.md5(F.col(text_col)).alias("text_md5"),
            F.col(key).alias("keep_id"),
            F.col(ts_col),
        )
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
