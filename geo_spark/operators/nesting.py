"""Shell/hole nesting inference over polygon layers — the
ShapeNestingQuery analog (s2/shape_nesting_query.go:54-257) as a grouped
Spark operator: rings arrive as rows, each layer group runs the exact
wedge/PIP nesting kernel (kernel/relations.infer_loop_nesting)
executor-side in parallel across layers.

Used at ingest: raw ring soup -> (parent, depth, is_hole) so downstream
polygon tables get correct XOR-parity loop sets before any join."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from geo_spark.kernel.pip import loop_origin_inside
from geo_spark.kernel.relations import infer_loop_nesting

NEST_SCHEMA = T.StructType(
    [
        T.StructField("layer_id", T.LongType()),
        T.StructField("loop_id", T.LongType()),
        T.StructField("parent_id", T.LongType()),  # null for shells
        T.StructField("depth", T.IntegerType()),
        T.StructField("is_hole", T.BooleanType()),
    ]
)


def shape_nesting(loops_df: DataFrame) -> DataFrame:
    """Input rows: (layer_id long, loop_id long, verts array<array<double>>)
    with verts = CCW unit-vector rings.  Output: one row per ring with
    its tightest parent, nesting depth, and hole flag (odd depth)."""

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        layer = int(pdf["layer_id"].iloc[0])
        loops = []
        for lid, verts in zip(pdf["loop_id"], pdf["verts"]):
            v = np.array([list(p) for p in verts], dtype=np.float64)
            loops.append((int(lid), v, loop_origin_inside(v)))
        nested = infer_loop_nesting(loops)
        return pd.DataFrame(
            {
                "layer_id": [layer] * len(nested),
                "loop_id": [t[0] for t in nested],
                "parent_id": [t[1] for t in nested],
                "depth": [t[2] for t in nested],
                "is_hole": [t[2] % 2 == 1 for t in nested],
            }
        )

    return loops_df.groupBy("layer_id").applyInPandas(one, NEST_SCHEMA)
