"""Streaming CDC apply: the continuous twin of operators/cdc.cdc_apply.

State per key is the current winning version — (ts, del, payload),
ONE row, bounded by the key universe like the batch merge's build
side.  Each micro-batch merges its changes under the same
last-writer-wins rule (D beats U at equal ts) and emits the key's
NEW current version (op='D' emissions carry deleted=true so a
downstream materialized view can tombstone).  The drained stream's
final emission per key equals the batch cdc_apply of the same
changes — the equivalence the test pins.

The streaming twin carries a single string payload column (wrap
multi-column payloads in a struct-to-json upstream); the batch
operator is the general-schema path.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ts long, del integer, v string"


def stream_cdc_apply(
    changes: DataFrame,
    key_col: str = "id",
    ts_col: str = "ts",
    op_col: str = "op",
    val_col: str = "v",
) -> DataFrame:
    """changes(key, ts, op, v) stream -> (key, ts, v, deleted) current
    version per key per micro-batch."""
    src = changes.select(
        F.col(key_col).alias("id"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(op_col).alias("op"),
        F.col(val_col).alias("v"),
    )
    out_schema = "id long, version_ts long, v string, deleted boolean"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        cur = state.get if state.exists else None  # (ts, del, v)
        for r in batch.itertuples():
            # Preserve NULL payloads (a delete often carries none): the
            # batch cdc_apply keeps them NULL, and str(None) would break
            # the drained-stream == batch equivalence with 'None'.
            v = None if pd.isna(r.v) else str(r.v)
            cand = (int(r.ts), 1 if r.op == "D" else 0, v)
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
        state.update(cur)
        yield pd.DataFrame(
            [(key[0], cur[0], cur[2], bool(cur[1]))],
            columns=["id", "version_ts", "v", "deleted"],
        )

    return src.groupBy("id").applyInPandasWithState(
        fn,
        out_schema,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
