"""Loop geometry validation: distributed self-intersection detection.

The FindValidationError / FindSelfIntersection contract of the
reference (s2/loop.go Validate, s2/shapeutil edge-pair crossings):
a loop is invalid if any two NON-ADJACENT edges have an interior
crossing.  At corpus scale (millions of user-supplied polygons in a
web-pages table) this must be a join, not a per-geometry quadratic
loop in the driver.

Shape:

1. **Edge explode + per-edge covering** (mapInPandas): each loop row
   ``(geom_id, lats, lngs)`` becomes one row per (edge, covering cell)
   at ``level`` — the cell walk is the closed-form supercover DDA of
   kernel/clipping.edge_cells_at_level (a strict superset of the cells
   the edge meets, so the candidate join cannot miss a crossing: the
   intersection point lies in a cell BOTH edges cover).
2. **Candidate pairs**: self equi-join on ``(geom_id, cell)`` — the
   banded join; only same-cell edge pairs meet, never the O(E²) pair
   space.  Adjacent pairs (shared vertex, including the wrap pair
   0,n-1) are excluded: shared-vertex touches are MaybeCross, not
   Cross, per s2/edge_crossings.go:88-91.
3. **Refine** (mapInPandas): the vectorized triage + robust-cascade
   crossing kernel (kernel/relations.chain_pairs_crossings_indexed on
   2-vertex chains) — certain pairs decided by float triage, the
   indeterminate residue by the exact predicate.
4. One partial-aggregatable groupBy counts crossing pairs per loop;
   a left join restores the zero rows so every input loop reports.

Endpoints ride the edge rows (blob-in-row, no second join back to the
loop table); duplicate candidates from multi-cell co-occurrence are
cut by a (geom_id, ei, ej) dropDuplicates before the refine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["loop_self_intersections", "validate_loops"]

_EDGE_SCHEMA = (
    "geom_id long, n int, ei int, cell long, "
    "ax double, ay double, az double, bx double, by double, bz double"
)


def _edge_rows(level: int):
    def fn(batches):
        import numpy as np

        from geo_spark.kernel import cellid as ck
        from geo_spark.kernel.clipping import edge_cells_at_level

        for pdf in batches:
            out = {
                "geom_id": [], "n": [], "ei": [], "cell": [],
                "ax": [], "ay": [], "az": [],
                "bx": [], "by": [], "bz": [],
            }
            for gid, lats, lngs in zip(
                pdf["geom_id"], pdf["lats"], pdf["lngs"]
            ):
                lat = np.asarray(lats, dtype=np.float64)
                lng = np.asarray(lngs, dtype=np.float64)
                n = len(lat)
                x, y, z = ck.latlng_to_xyz(lat, lng)
                v = np.stack([x, y, z], axis=1)
                for i in range(n):
                    a, b = v[i], v[(i + 1) % n]
                    for c in edge_cells_at_level(a, b, level):
                        out["geom_id"].append(int(gid))
                        out["n"].append(n)
                        out["ei"].append(i)
                        out["cell"].append(np.int64(np.uint64(c)))
                        out["ax"].append(a[0]); out["ay"].append(a[1])
                        out["az"].append(a[2])
                        out["bx"].append(b[0]); out["by"].append(b[1])
                        out["bz"].append(b[2])
            yield pd.DataFrame(out)

    return fn


def _refine(batches):
    import numpy as np

    from geo_spark.kernel.relations import chain_pairs_crossings_indexed

    for pdf in batches:
        m = len(pdf)
        if m == 0:
            continue
        A = np.stack(
            [
                pdf[["ax", "ay", "az"]].to_numpy(np.float64),
                pdf[["bx", "by", "bz"]].to_numpy(np.float64),
            ],
            axis=1,
        )
        B = np.stack(
            [
                pdf[["cx", "cy", "cz"]].to_numpy(np.float64),
                pdf[["dx", "dy", "dz"]].to_numpy(np.float64),
            ],
            axis=1,
        )
        two = np.full(m, 2, dtype=np.int64)
        idx = np.arange(m, dtype=np.int64)
        cnt = chain_pairs_crossings_indexed(A, two, B, two, idx, idx)
        keep = cnt > 0
        yield pd.DataFrame(
            {
                "geom_id": pdf["geom_id"].to_numpy(np.int64)[keep],
                "ei": pdf["ei"].to_numpy(np.int32)[keep],
                "ej": pdf["ej"].to_numpy(np.int32)[keep],
            }
        )


def loop_self_intersections(
    loops: DataFrame, level: int = 8
) -> DataFrame:
    """``(geom_id, ei, ej)`` — one row per non-adjacent edge pair of a
    loop with an interior crossing (ei < ej).  Input schema:
    ``(geom_id long, lats array<double>, lngs array<double>)``."""
    edges = loops.select("geom_id", "lats", "lngs").mapInPandas(
        _edge_rows(level), _EDGE_SCHEMA
    )
    e1 = edges
    e2 = edges.select(
        "geom_id",
        F.col("cell").alias("cell"),
        F.col("ei").alias("ej"),
        F.col("ax").alias("cx"), F.col("ay").alias("cy"),
        F.col("az").alias("cz"),
        F.col("bx").alias("dx"), F.col("by").alias("dy"),
        F.col("bz").alias("dz"),
    )
    cand = (
        e1.join(e2, ["geom_id", "cell"])
        .where(
            (F.col("ej") > F.col("ei") + 1)
            & ~((F.col("ei") == 0) & (F.col("ej") == F.col("n") - 1))
        )
        .dropDuplicates(["geom_id", "ei", "ej"])
        .select(
            "geom_id", "ei", "ej",
            "ax", "ay", "az", "bx", "by", "bz",
            "cx", "cy", "cz", "dx", "dy", "dz",
        )
    )
    return cand.mapInPandas(_refine, "geom_id long, ei int, ej int")


def validate_loops(loops: DataFrame, level: int = 8) -> DataFrame:
    """Per input loop: ``(geom_id, n_cross_pairs, is_valid)`` — zero
    rows preserved via a left join against the loop ids."""
    hits = (
        loop_self_intersections(loops, level=level)
        .groupBy("geom_id")
        .agg(F.count("*").alias("n_cross_pairs"))
    )
    return (
        loops.select("geom_id")
        .join(hits, "geom_id", "left")
        .select(
            "geom_id",
            F.coalesce("n_cross_pairs", F.lit(0)).alias("n_cross_pairs"),
            (F.coalesce("n_cross_pairs", F.lit(0)) == 0).alias("is_valid"),
        )
    )
