"""Streaming geofence crossings: the continuous twin of
operators/sessionize.zone_crossings.

Zone assignment happens UPSTREAM and stateless (stream-static PIP join
or tiling exprs, the streaming/mapmatch.py rule); this operator only
tracks the per-user last zone — ONE (ts, zone) row of state per user,
exact under the same in-order contract streaming/asof.py states
(within a user, no event arrives with a timestamp below an already
processed one; within a micro-batch, arrival order is irrelevant
because the batch is sorted before the sweep).  The contract is
ENFORCED: an event arriving below the stored last-event timestamp
raises (failing the query) instead of silently fabricating a
crossing against the wrong previous zone — late data replays through
the batch operator.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "lts long, lid long, lzone long"


def stream_zone_crossings(
    zoned: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    zone_col: str = "zone",
) -> DataFrame:
    """zoned(user, ts, id, zone) stream -> crossing rows
    (user_id, ts_us, event_id, from_zone, to_zone)."""
    src = zoned.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("long").alias("ts_us"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(zone_col).cast("long").alias("zone"),
    )
    out_schema = (
        "user_id long, ts_us long, event_id long, "
        "from_zone long, to_zone long"
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs)).sort_values(
            ["ts_us", "event_id"], kind="mergesort"
        )
        zones = batch["zone"].tolist()
        prev = [None] + zones[:-1]
        if state.exists:
            lts, _, lzone = state.get
            first_ts = int(batch["ts_us"].iloc[0])
            if first_ts < lts:
                raise ValueError(
                    f"stream_zone_crossings: out-of-order event for user "
                    f"{key[0]!r}: ts {first_ts} below the processed "
                    f"high-water mark {lts} — late data must replay "
                    f"through the batch zone_crossings"
                )
            prev[0] = lzone
        mask = [
            p is not None and p != z for p, z in zip(prev, zones)
        ]
        out = batch[mask].copy() if any(mask) else batch.iloc[0:0].copy()
        out["from_zone"] = [p for p, m in zip(prev, mask) if m]
        out = out.rename(columns={"zone": "to_zone"})
        last = batch.iloc[-1]
        state.update(
            (int(last["ts_us"]), int(last["event_id"]), int(last["zone"]))
        )
        yield out[["user_id", "ts_us", "event_id", "from_zone", "to_zone"]]

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
