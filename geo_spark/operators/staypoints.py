"""Stay-point (dwell) detection over ordered ping trajectories.

The classic trajectory-mining primitive (Li et al. 2008, "Mining user
similarity based on location history"): find maximal runs of
consecutive pings that stay within a radius and last at least a
minimum dwell time — visits, stops, home/work anchors.

Relational shape (no UDF, no per-trajectory Python):

1. ONE window pass per trajectory (shuffle keyed on the trajectory id)
   computes the spherical chord² to the previous ping and flags
   segment breaks (``chord² > radius²`` or first ping) — the
   gaps-and-islands pattern: the running sum of break flags is the
   segment id.
2. ONE partial-aggregatable groupBy (trajectory, segment) reduces each
   run to (count, t_start, t_end, exact micro-degree coordinate sums).
3. A codegen filter keeps runs with ``n >= min_pings`` and
   ``dwell >= min_dwell_s``.

Determinism at scale: the centroid is derived from EXACT BIGINT sums
of micro-degree integers (``round(lat * 1e6)``), not from a float
average whose value would depend on the distributed reduction order —
the same discipline as operators/hotspots.py.  The final
double-precision divide is the fixed expression tree
:data:`STAY_CENTROID_SQL`, shared with oracle replays.

Segmentation semantics: a break is measured ping-to-PREVIOUS-ping
(the streaming-friendly variant), not ping-to-segment-anchor; slow
drift within the radius per step therefore stays one segment.  Stated
because the two variants differ on crawling trajectories.

Ping order within a trajectory is the ``ts_col`` order; ties are
broken by ``id_col`` when given (pass one whenever timestamps can
repeat — unordered ties would make the segmentation nondeterministic).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["stay_points", "STAY_CENTROID_SQL", "EARTH_RADIUS_M"]

EARTH_RADIUS_M = 6_371_010.0  # matches kernel/metric.py earth radius

# centroid micro-degrees -> degrees, one fixed double tree over exact
# BIGINT inputs (shared verbatim with DuckDB oracle replays)
STAY_CENTROID_SQL = (
    "((CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE)) / 1000000.0)"
)


def stay_points(
    pings: DataFrame,
    radius_m: float,
    min_dwell_s: int = 300,
    min_pings: int = 4,
    traj_col: str = "traj_id",
    ts_col: str = "ts_s",
    lat_col: str = "lat",
    lng_col: str = "lng",
    id_col: str | None = None,
) -> DataFrame:
    """Detect stay points; returns one row per qualifying run:
    ``(traj, seg, n_pings, t_start, t_end, dwell_s, lat, lng)``.

    ``radius_m`` is the great-circle break distance between consecutive
    pings; ``ts_col`` must be integer seconds (dwell stays exact).
    """
    theta = min(radius_m / EARTH_RADIUS_M, math.pi)
    chord = 2.0 * math.sin(theta / 2.0)
    thresh_chord2 = chord * chord

    order = [F.col("ts")] + ([F.col("_oid")] if id_col else [])
    w = Window.partitionBy("traj").orderBy(*order)
    run = Window.partitionBy("traj").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    lat_r = F.radians(F.col(lat_col).cast("double"))
    lng_r = F.radians(F.col(lng_col).cast("double"))
    pts = pings.select(
        F.col(traj_col).alias("traj"),
        F.col(ts_col).cast("long").alias("ts"),
        *([F.col(id_col).alias("_oid")] if id_col else []),
        (F.cos(lng_r) * F.cos(lat_r)).alias("px"),
        (F.sin(lng_r) * F.cos(lat_r)).alias("py"),
        F.sin(lat_r).alias("pz"),
        F.round(F.col(lat_col).cast("double") * 1e6).cast("long").alias("ulat"),
        F.round(F.col(lng_col).cast("double") * 1e6).cast("long").alias("ulng"),
    )
    # one projection computes the three lags (a single Window pass);
    # the running break-sum below shares its partitioning and sort, so
    # the whole segmentation costs exactly one Exchange + one Sort
    lagged = pts.withColumns(
        {
            "_lx": F.lag("px").over(w),
            "_ly": F.lag("py").over(w),
            "_lz": F.lag("pz").over(w),
        }
    )
    chord2 = (
        (F.col("px") - F.col("_lx")) * (F.col("px") - F.col("_lx"))
        + (F.col("py") - F.col("_ly")) * (F.col("py") - F.col("_ly"))
        + (F.col("pz") - F.col("_lz")) * (F.col("pz") - F.col("_lz"))
    )
    brk = F.when(
        chord2.isNull() | (chord2 > F.lit(thresh_chord2)), F.lit(1)
    ).otherwise(F.lit(0))
    seg = lagged.withColumn("seg", F.sum(brk).over(run))

    lat_sql = STAY_CENTROID_SQL.format(s="_slat", n="n_pings")
    lng_sql = STAY_CENTROID_SQL.format(s="_slng", n="n_pings")
    return (
        seg.groupBy("traj", "seg")
        .agg(
            F.count("*").alias("n_pings"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            F.sum("ulat").alias("_slat"),
            F.sum("ulng").alias("_slng"),
        )
        .where(
            (F.col("n_pings") >= min_pings)
            & (F.col("t_end") - F.col("t_start") >= min_dwell_s)
        )
        .select(
            "traj",
            "seg",
            "n_pings",
            "t_start",
            "t_end",
            (F.col("t_end") - F.col("t_start")).alias("dwell_s"),
            F.expr(lat_sql).alias("lat"),
            F.expr(lng_sql).alias("lng"),
        )
    )
