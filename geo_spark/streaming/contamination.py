"""Streaming contamination scoring: eval-set overlap per arriving doc.

The streaming face of ``operators/dedup.py:contamination_score``: each
document on the stream gets the fraction of its distinct n-char
shingles found in the eval/probe set, the admission-control metric that
keeps benchmark text out of a training corpus at ingest time.

Every document carries its whole scoring problem in one row, so the
batch operator's explode + broadcast-join + groupBy collapses to
per-row work: ONE stateless mapInPandas with the probe shingle set in
the task closure — eval sets are dimension-sized by definition, the
same broadcast the batch path does.  No watermark, no state store, one
output row per scorable document; drained-stream == batch equivalence
is asserted in tests/test_streaming_contamination.py.

Semantics are the batch contract verbatim: distinct length-n shingles
only; documents shorter than n have no scorable shingle and emit
nothing; frac_e6 = (n_hit * 1_000_000) // n_shingles exact-integer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def stream_contamination_score(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 16,
    key: str = "doc_id",
    text_col: str = "text",
    probe_text: str = "text",
) -> DataFrame:
    """(key, n_shingles, n_hit, frac_e6) per scorable streamed doc,
    identical to the batch :func:`~geo_spark.operators.dedup.
    contamination_score`."""
    def _shingles(t: str) -> set[str]:
        # shingle_expr's SQL idiom: a too-short text yields one sub-n
        # shingle which the length filter then drops
        sh = {t[i : i + n] for i in range(max(len(t) - n + 1, 1))}
        return {s for s in sh if len(s) == n}

    pset: set[str] = set()
    for r in probes.select(probe_text).collect():
        pset |= _shingles(r[probe_text] or "")
    # sc.broadcast so the multi-MB eval shingle set ships once per
    # executor, not inside every task's pickled closure on every
    # micro-batch
    bc = docs.sparkSession.sparkContext.broadcast(pset)
    key_type = docs.schema[key].dataType.simpleString()
    schema = (
        f"{key} {key_type}, n_shingles long, n_hit long, frac_e6 long"
    )

    def fn(batches):
        probe_set = bc.value
        for pdf in batches:
            out = []
            for k, t in zip(pdf[key], pdf[text_col]):
                sh = _shingles(t or "")
                if not sh:
                    continue
                hit = len(sh & probe_set)
                out.append((k, len(sh), hit, hit * 1_000_000 // len(sh)))
            yield pd.DataFrame(
                out, columns=[key, "n_shingles", "n_hit", "frac_e6"]
            )

    return docs.mapInPandas(fn, schema)
