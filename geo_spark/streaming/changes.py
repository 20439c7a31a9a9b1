"""Streaming crawl change detection: the continuous twin of
operators/webcorpus.snapshot_diff.

State per url is the LAST SEEN content fingerprint — one short string,
so state is bounded by the url universe (the streaming analog of the
batch diff's join build side), never by fetch history.  Each arriving
fetch emits its change status against the stored fingerprint:
'added' on first sighting, then 'changed' or 'unchanged'.  'removed'
is unobservable in a fetch stream (absence is not an event) — the
batch snapshot_diff owns tombstones.

In-order contract per url (the streaming/asof.py rule): within a url,
fetches arrive with non-decreasing ts across micro-batches; order
INSIDE a micro-batch is irrelevant because the batch is sorted before
the sweep.  Re-fetches of one url within a batch each get a status
against the running fingerprint, exactly as if they had arrived in
separate batches — the property the drained-equivalence test pins.

The contract is ENFORCED, not assumed: state carries the per-url ts
high-water mark, and a fetch arriving below it raises (failing the
query) instead of silently mis-sequencing the fingerprint chain —
late data replays through the batch snapshot_diff.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "fp string, hw long"


def stream_change_detect(
    fetches: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_us",
    fp_col: str = "fp",
) -> DataFrame:
    """fetches(url, ts_us, fp) stream -> (url, ts_us, status) rows,
    status in {'added', 'changed', 'unchanged'}."""
    src = fetches.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts_us"),
        # State persists as STRING ('fp string'): cast here so in-batch
        # values and cross-batch stored state share one type — a BIGINT
        # fingerprint (e.g. xxhash64) would otherwise compare int vs str
        # and emit 'changed' on every re-fetch after the first batch.
        F.col(fp_col).cast("string").alias("fp"),
    )
    out_schema = "url string, ts_us long, status string"

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs)).sort_values(
            ["ts_us", "fp"], kind="mergesort"
        )
        prev, hw = state.get if state.exists else (None, None)
        if hw is not None and int(batch["ts_us"].iloc[0]) < hw:
            raise ValueError(
                f"stream_change_detect: out-of-order fetch for url "
                f"{key[0]!r}: ts {int(batch['ts_us'].iloc[0])} below the "
                f"processed high-water mark {hw} — late data must replay "
                f"through the batch snapshot_diff"
            )
        statuses = []
        for fp in batch["fp"]:
            if prev is None:
                statuses.append("added")
            elif fp != prev:
                statuses.append("changed")
            else:
                statuses.append("unchanged")
            prev = fp
        out = batch[["url", "ts_us"]].copy()
        out["status"] = statuses
        # fp is cast to string upstream, so prev is already str (or
        # None for a null fingerprint, which 'fp string' accepts).
        new_hw = int(batch["ts_us"].iloc[-1])
        state.update((prev, new_hw if hw is None else max(hw, new_hw)))
        yield out

    return src.groupBy("url").applyInPandasWithState(
        fn,
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
