"""areal_interpolate: share conservation and the three overlap regimes
(partial / contained / disjoint) against kernel ground truth."""

from __future__ import annotations

import numpy as np

from geo_spark.operators.constructive import areal_interpolate
from geo_spark.sources.layers import regular_loop_vertices


def _pairs(spark):
    a = [[float(x) for x in p] for p in regular_loop_vertices(40.0, -74.0, 0.05, 12)]
    rows = []
    # radii are RADIANS (0.05 rad ≈ 2.9 deg of arc) — offsets in degrees
    for i, (name, dla, dln, rad) in enumerate(
        [
            ("part", 2.5, 2.5, 0.03),
            ("cont", 0.0, 0.0, 0.015),
            ("far", 10.0, 10.0, 0.03),
        ]
    ):
        b = [
            [float(x) for x in p]
            for p in regular_loop_vertices(40.0 + dla, -74.0 + dln, rad, 12)
        ]
        rows.append((0, name, 1_000_000, a, b))
    return spark.createDataFrame(
        rows,
        "src_id long, tgt_id string, value_cents long, "
        "a_verts array<array<double>>, b_verts array<array<double>>",
    )


def test_areal_regimes(spark):
    from geo_spark.kernel.measures import loop_area

    out = {
        r["tgt_id"]: (r["n_src"], r["alloc"])
        for r in areal_interpolate(_pairs(spark)).collect()
    }
    assert out["far"] == (0, 0)
    # contained target: share == area(B)/area(A) exactly
    a = loop_area(
        np.array(regular_loop_vertices(40.0, -74.0, 0.05, 12))
    )
    b = loop_area(
        np.array(regular_loop_vertices(40.0, -74.0, 0.015, 12))
    )
    want = 1_000_000 * int(np.floor(b / a * 1e6)) // 1_000_000
    assert out["cont"] == (1, want)
    # partial overlap: strictly between 0 and the contained share's src
    assert 0 < out["part"][1] < 1_000_000
    # conservation: total allocation never exceeds the source value
    assert sum(v for _, v in out.values()) <= 1_000_000
