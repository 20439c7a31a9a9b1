"""Streaming 2-D skyline per group — the stateful twin of
operators/skyline.skyline2d.

The Pareto frontier is an online-maintainable summary: a new point
either is dominated by the current frontier (state unchanged) or
enters it and evicts the points it dominates.  State per group is
therefore the frontier itself — two parallel float arrays, NOT the
point history — merged per micro-batch inside
``applyInPandasWithState``.  The per-batch merge recomputes the
frontier of (state ∪ batch) with the same strictly-preceding
running-min rule as the batch operator's exact pass, so on a drained
source the final emitted frontier equals batch ``skyline2d`` on the
same static data, distinct-pair for distinct-pair (asserted in
tests/test_streaming_skyline.py).

Every emitted row carries ``n_seen`` (cumulative rows absorbed by the
group) — monotone, so a sink can identify the final snapshot without
relying on row order.  Frontier size is data-dependent (O(log n)
expected for independent axes, worst case anti-correlated); it is the
same bound the batch operator's output carries.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "grp long, x double, y double, n_seen long"
STATE_SCHEMA = "xs array<double>, ys array<double>, n_seen long"


def _frontier(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct Pareto-minimal pairs of (xs, ys): lexicographic sort,
    keep rows whose y is strictly below the running min of all
    strictly-preceding rows (the batch operator's exact rule)."""
    pts = np.unique(np.stack([xs, ys], axis=1), axis=0)  # sorts lexicographically
    keep = np.empty(len(pts), dtype=bool)
    cm = np.inf
    for i in range(len(pts)):
        keep[i] = pts[i, 1] < cm
        cm = min(cm, pts[i, 1])
    return pts[keep, 0], pts[keep, 1]


def stream_skyline2d(
    points: DataFrame,
    grp_col: str = "grp",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """points(grp, x, y) stream -> refreshed per-group frontier rows
    ("update" semantics: every batch that touches a group re-emits
    that group's full current frontier)."""
    from pyspark.sql import functions as F

    src = points.select(
        F.col(grp_col).cast("long").alias("grp"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        xs = batch["x"].to_numpy(np.float64)
        ys = batch["y"].to_numpy(np.float64)
        n_new = len(xs)
        if state.exists:
            oxs, oys, n_seen = state.get
            xs = np.concatenate([np.asarray(oxs, np.float64), xs])
            ys = np.concatenate([np.asarray(oys, np.float64), ys])
        else:
            n_seen = 0
        fx, fy = _frontier(xs, ys)
        n_seen += n_new
        state.update((fx.tolist(), fy.tolist(), n_seen))
        yield pd.DataFrame(
            {
                "grp": np.full(len(fx), key[0], dtype=np.int64),
                "x": fx,
                "y": fy,
                "n_seen": np.full(len(fx), n_seen, dtype=np.int64),
            }
        )

    return src.groupBy("grp").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
