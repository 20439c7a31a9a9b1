"""Streaming map matching: a GPS-point stream snapped continuously to a
static trail/road layer.

The candidate generation + argmin-segment refine is STATELESS on a
stream (the layer's covering is a static dimension side, the refine is
per-batch mapInPandas), and every candidate row for a given point is
produced inside the micro-batch that carried the point — so the global
per-point argmin completes within the batch.  The
``applyInPandasWithState`` pass below exists only to group a batch's
candidate rows per point; it emits the winner and immediately
``state.remove()``s, retaining ZERO cross-batch state.  Each point key
must appear in a single micro-batch (natural for an event stream; a
key re-sent later would emit a second, independent snap row).

Batch/stream equivalence on a drained source is asserted in tests.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geo_spark.operators.mapmatch import refine_candidates
from geo_spark.operators.spatial_join import Layer

STATE_SCHEMA = "n long"


def stream_map_match(
    points_stream: DataFrame,
    layer: Layer,
    radius_rad: float,
    point_key: str,
    cell_col: str = "cell_id",
    latlng: tuple[str, str] = ("lat", "lng"),
) -> DataFrame:
    """stream(point_key, cell_id, lat, lng) -> one row per matched
    point: (point_key, geom_id, seg_idx, chord2), the nearest segment
    within the radius, ties broken (chord2, geom_id, seg_idx)."""
    refined = refine_candidates(
        points_stream, layer, radius_rad, point_key, cell_col, latlng
    )
    key_type = refined.schema[point_key].dataType.simpleString()
    out_schema = (
        f"{point_key} {key_type}, geom_id long, seg_idx long, chord2 double"
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs))
        i = np.lexsort(
            (
                pdf["seg_idx"].to_numpy(np.int64),
                pdf["geom_id"].to_numpy(np.int64),
                pdf["chord2"].to_numpy(np.float64),
            )
        )[0]
        # bookkeeping write so the state channel is exercised, then drop
        # it — candidates are batch-local, nothing to carry forward
        state.update((len(pdf),))
        state.remove()
        yield pd.DataFrame(
            {
                point_key: [key[0]],
                "geom_id": [int(pdf["geom_id"].iloc[i])],
                "seg_idx": [int(pdf["seg_idx"].iloc[i])],
                "chord2": [float(pdf["chord2"].iloc[i])],
            }
        )

    return refined.groupBy(point_key).applyInPandasWithState(
        fn,
        out_schema,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
