"""Streaming weighted reservoir sampling (A-ES) per stratum.

Efraimidis-Spirakis is a *reservoir* algorithm by construction: the
sample = the quota rows with the largest priorities ln(u)/w seen so
far, and that top-set is mergeable across micro-batches with bounded
state (quota triples per stratum).  This is the streaming twin of
operators/sampling.weighted_sample — the priority expression is shared
verbatim (AES_PRIORITY_SQL), so on a drained source the final reservoir
per stratum equals the batch sample row-for-row (asserted in tests).

State per stratum: (priorities, keys, weights, seen) — three quota-long
arrays plus a processed-row counter.  Each update emits the current
reservoir as ranked rows tagged with ``seen`` so the final state is
identifiable in an unordered sink (max seen wins; seen is strictly
increasing per stratum)."""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geo_spark.operators.sampling import AES_PRIORITY_SQL

STATE_SCHEMA = (
    "pri array<double>, ks array<long>, ws array<double>, seen long"
)


def stream_weighted_reservoir(
    stream: DataFrame,
    stratum_col: str,
    quota: int,
    weight_col: str,
    key: str = "doc_id",
) -> DataFrame:
    """stream(stratum, key, weight) -> per-stratum reservoir updates
    (stratum, key, weight, rank, seen).  ``key`` must be integral (the
    bounded state schema stores it as long)."""
    stratum_type = stream.schema[stratum_col].dataType.simpleString()
    out_schema = (
        f"{stratum_col} {stratum_type}, {key} long, weight double,"
        " rank int, seen long"
    )

    pri = F.expr(AES_PRIORITY_SQL.format(key=key, weight=weight_col))
    prepared = stream.select(
        F.col(stratum_col),
        F.col(key).cast("long").alias("_k"),
        F.col(weight_col).cast("double").alias("_w"),
        pri.alias("_p"),
    )

    def fn(
        skey: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        p = batch["_p"].to_numpy(np.float64)
        k = batch["_k"].to_numpy(np.int64)
        w = batch["_w"].to_numpy(np.float64)
        seen = len(batch)
        if state.exists:
            op, ok, ow, oseen = state.get
            p = np.concatenate([np.asarray(op, np.float64), p])
            k = np.concatenate([np.asarray(ok, np.int64), k])
            w = np.concatenate([np.asarray(ow, np.float64), w])
            seen += int(oseen)
        # top-quota by (priority DESC, key ASC) — the batch tie-break
        order = np.lexsort((k, -p))[:quota]
        p, k, w = p[order], k[order], w[order]
        state.update((p.tolist(), k.tolist(), w.tolist(), seen))
        yield pd.DataFrame(
            {
                stratum_col: np.repeat(skey[0], len(k)),
                key: k,
                "weight": w,
                "rank": np.arange(1, len(k) + 1, dtype=np.int32),
                "seen": np.full(len(k), seen, dtype=np.int64),
            }
        )

    return prepared.groupBy(stratum_col).applyInPandasWithState(
        fn,
        out_schema,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
