"""Streaming KMV distinct-count sketch per tile.

The streaming twin of operators/sketches.kmv_distinct: state per tile is
the k smallest distinct hashes seen so far (a bounded long array — the
whole point of the sketch is that streaming distinct-count state does
NOT grow with the value set), merged per micro-batch inside
``applyInPandasWithState``.  Emits the refreshed (n_kept, kth_hash,
est_distinct) row for every tile touched by the batch ("update"
semantics); the estimator is the same integer floor-division as batch,
so on a drained source the final rows equal the batch operator's output
row-for-row (asserted in tests).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geo_spark.operators.sketches import KMV_HASH_SQL, _KMV_RANGE

OUTPUT_SCHEMA = "tile long, n_kept long, kth_hash long, est_distinct long"
STATE_SCHEMA = "hashes array<long>"


def stream_tile_kmv(
    tiled: DataFrame,
    k: int = 32,
    tile_col: str = "tile",
    value_col: str = "user_id",
) -> DataFrame:
    """tiled(tile, value) stream -> per-tile KMV estimate rows.

    The input must already carry the tile key (use the same codegen
    tiling exprs as batch); the hash is applied here so batch and
    stream share one definition."""
    from pyspark.sql import functions as F

    hashed = tiled.select(
        F.col(tile_col).alias("tile"),
        F.expr(KMV_HASH_SQL.format(v=value_col)).alias("h"),
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs))
        hs = np.unique(batch["h"].to_numpy(np.int64))
        if state.exists:
            (old,) = state.get
            hs = np.union1d(np.asarray(old, dtype=np.int64), hs)
        hs = hs[:k]
        state.update((hs.tolist(),))
        n_kept = len(hs)
        kth = int(hs[-1]) if n_kept else 0
        est = (
            n_kept
            if n_kept < k
            else ((k - 1) * _KMV_RANGE) // kth
        )
        yield pd.DataFrame(
            {
                "tile": [key[0]],
                "n_kept": [n_kept],
                "kth_hash": [kth],
                "est_distinct": [est],
            }
        )

    return hashed.groupBy("tile").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
