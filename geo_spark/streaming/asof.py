"""Streaming as-of enrichment: join a fact stream to the latest
matching row of a dimension-update stream — the continuous twin of
operators/asof.py's backward ``asof_join``.

State per key is ONE row: the latest dimension (ts, value) seen.  That
bound is exact under the in-order contract — within a key, no fact or
dimension event arrives with a timestamp below an already-processed
fact's — because a backward as-of match can only ever be the newest
dimension row at or before the probe, and probes only move forward.
Out-of-order arrivals need watermark-delayed emission (documented
non-goal here; batch asof_join is the replay path for late data, the
same batch-fallback rule streaming/spacetime.py states).  The
contract is ENFORCED, not assumed: state carries the per-key
processed-row ts high-water mark (over facts AND dims), and any row
arriving below it raises (failing the query) instead of silently
enriching against a stale dimension.  Within the allowed arrivals the
stored dim still never regresses, and the equal-ts greatest-value
tiebreak holds across batch boundaries.

Within a micro-batch, arrival order is irrelevant: both sides are
sorted by (ts, side, tiebreak) and swept with a vectorized
forward-fill, so the drained result equals the batch operator
row-for-row (asserted in tests/test_streaming_asof.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "rts long, rval long, hw long"


def stream_asof_enrich(
    facts: DataFrame,
    dims: DataFrame,
    key: str,
    fact_id: str,
    fact_ts: str,
    dim_ts: str,
    dim_val: str,
    tolerance: int | None = None,
) -> DataFrame:
    """facts(key, fact_id, fact_ts) enriched with the latest
    dims(key, dim_ts, dim_val) at or before each fact (inclusive
    ties; among equal dim ts the greatest value wins — the batch
    operator's documented tiebreak).  Output: (key, fact_id, ts,
    r_ts, r_val), one row per fact, nulls when nothing matched or the
    gap exceeds ``tolerance``.  Integral columns only (bounded state
    schema stores longs)."""
    key_type = facts.schema[key].dataType.simpleString()
    f = facts.select(
        F.col(key),
        F.col(fact_ts).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(fact_id).cast("long").alias("_id"),
        F.lit(None).cast("long").alias("_val"),
    )
    d = dims.select(
        F.col(key),
        F.col(dim_ts).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_id"),
        F.col(dim_val).cast("long").alias("_val"),
    )
    both = d.unionByName(f)
    out_schema = (
        f"{key} {key_type}, fact_id long, ts long, r_ts long, r_val long"
    )

    def fn(
        skey: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        sts = sval = hw = None
        if state.exists:
            sts, sval, hw = state.get
        first_ts = int(batch["_ts"].min())
        last_ts = int(batch["_ts"].max())
        if hw is not None and first_ts < hw:
            raise ValueError(
                f"stream_asof_enrich: out-of-order row for key "
                f"{skey[0]!r}: ts {first_ts} below the processed "
                f"high-water mark {hw} — late data must replay through "
                f"the batch asof_join"
            )
        # the stored dim enters the sweep as a VIRTUAL row: the sort
        # below then applies the batch operator's exact ordering to it
        # (incl. the equal-ts greatest-value tiebreak against in-batch
        # dims — stored ts <= batch min ts, so ties are the only
        # overlap), and the last dim in sorted order is the state to
        # carry forward (never regresses by construction)
        if sts is not None:
            batch = pd.concat(
                [
                    pd.DataFrame(
                        {
                            key: [skey[0]],
                            "_ts": [sts],
                            "_side": [0],
                            "_id": [None],
                            "_val": [sval],
                        }
                    ),
                    batch,
                ]
            )
        # total order: ts, then dims before facts, then value (so the
        # greatest tied dim value is the one carried at the probe)
        batch = batch.sort_values(
            ["_ts", "_side", "_val"], kind="mergesort"
        ).reset_index(drop=True)
        is_dim = batch["_side"].to_numpy() == 0
        rts = batch["_ts"].to_numpy(np.float64).copy()
        rval = batch["_val"].to_numpy(np.float64).copy()
        rts[~is_dim] = np.nan
        rval[~is_dim] = np.nan
        carried_ts = pd.Series(rts).ffill()
        carried_val = pd.Series(rval).ffill()
        # persist the newest dim row (state survives dim-less batches)
        if is_dim.any():
            last = np.where(is_dim)[0][-1]
            sts = int(batch["_ts"].iloc[last])
            sval = int(batch["_val"].iloc[last])
        state.update(
            (sts, sval, last_ts if hw is None else max(hw, last_ts))
        )
        facts_mask = ~is_dim
        out = pd.DataFrame(
            {
                key: batch.loc[facts_mask, key].to_numpy(),
                "fact_id": batch.loc[facts_mask, "_id"].astype("int64"),
                "ts": batch.loc[facts_mask, "_ts"].astype("int64"),
                "r_ts": carried_ts[facts_mask].to_numpy(),
                "r_val": carried_val[facts_mask].to_numpy(),
            }
        )
        if tolerance is not None:
            late = (out["ts"] - out["r_ts"]) > tolerance
            out.loc[late, ["r_ts", "r_val"]] = np.nan
        # ts values stay below 2^53, so the float carry is exact;
        # nullable Int64 round-trips the nulls through Arrow
        out["r_ts"] = out["r_ts"].astype("Int64")
        out["r_val"] = out["r_val"].astype("Int64")
        yield out

    return both.groupBy(key).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
