"""Spatiotemporal co-occurrence join: point pairs within BOTH a radius
and a time window.

The pair analog of the within-distance join (s2/edge_query.go
IsDistanceLess family) extended with event time — the query class behind
"which geotagged pages/events were near each other around the same
time" (co-visit detection, burst localization, crawl-replay joins).

Scale shape (the part that must survive 100 TB):

- **Banded equi-join, not a range join.**  Each row gets a home key
  ``(cell, tb)`` — its level-L S2 cell and ``floor(ts / window)`` time
  bucket.  The probe side emits the 3x9 grid of (adjacent bucket x
  cell 8-neighborhood incl. self) keys; a single hash equi-join on the
  composite key then sees every true pair exactly as often as the
  (symmetric-touching) cell topology reports it, and never compares
  rows more than one bucket or one cell apart.  No theta-join, no
  per-key quadratic blowup beyond genuinely co-located candidates.
- **Level choice is the correctness proof**: L is the finest level with
  ``MinWidth(L) >= radius`` (s2/metric.go:117-146) — two points within
  the radius cannot sit in non-touching level-L cells (they would have
  to fully cross an intermediate cell, which costs at least MinWidth),
  so home-vs-9-neighborhood probing is exhaustive.  Same argument in
  time: |dt| <= W implies bucket distance <= 1.
- **Exactly-once output without trusting corner symmetry**: at cube
  corners the clamped cross-face wrap can make the *implemented*
  neighbor relation asymmetric (operators/knn.py:518-522 carries the
  same caveat), so instead of keeping ``a < b`` matches only (which
  would silently drop a pair seen only from the wrong side), both
  directions survive the refine and the canonicalized (least, greatest)
  pair is deduplicated.  The dedup exchange runs on the *result* set —
  post-refine, orders of magnitude smaller than the candidate set.
- **Refine is pure codegen**: squared chord distance and |dt| are
  native column arithmetic on the joined row — no Python in the
  per-pair path.  The only Arrow hop builds the DISTINCT-cell
  adjacency table (cell 8-neighborhoods need the Hilbert (face,i,j)
  topology, kernel/cellid.all_neighbors_same_level); the 27x row
  multiplication itself is a broadcast join + codegen explode, so
  Python touches one row per occupied cell, never per event (the
  per-row emission it replaced cost ~18x the whole query).

Skew: a hot (cell, tb) bucket (urban flash crowd) concentrates its
candidate pairs on one reducer; AQE's skew-join split handles the join
side, and the level rule keeps per-bucket membership ~density x r^2
rather than unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql
from geo_spark.functions.s2 import s2_cellid, s2_xyz
from geo_spark.kernel import cellid as ck
from geo_spark.kernel import metric
from geo_spark.kernel.regions import chord2_from_angle


def spacetime_level(radius_rad: float) -> int:
    """Finest level whose MinWidth is at least the radius (coarser would
    work too but multiplies candidates; finer breaks the adjacency
    proof)."""
    return metric.MIN_WIDTH.max_level(radius_rad)


def _neighbor_table(cells: DataFrame) -> DataFrame:
    """DISTINCT occupied cells -> (cell, pcell) adjacency rows: self +
    the 8-neighborhood, per-cell deduplicated (at cube corners the
    clamped wrap repeats entries).

    The Arrow hop runs over the distinct-cell table only — data-bounded
    and orders of magnitude smaller than the event stream (the earlier
    per-ROW emission moved every event through Python 27 times; this
    version moves each occupied CELL through once and lets codegen do
    all row multiplication)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            cells_u = ck.from_signed(pdf["cell"].to_numpy(np.int64))
            nbrs = ck.all_neighbors_same_level(cells_u)  # (n, 8)
            grid = np.concatenate([cells_u[:, None], nbrs], axis=1)
            grid.sort(axis=1)
            keep = np.ones(grid.shape, dtype=bool)
            keep[:, 1:] = grid[:, 1:] != grid[:, :-1]
            rows, cols = np.nonzero(keep)
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame(
                    {
                        "cell": pdf["cell"].to_numpy(np.int64)[rows],
                        "pcell": ck.to_signed(grid[rows, cols]),
                    }
                ),
                preserve_index=False,
            )

    return cells.distinct().mapInArrow(fn, "cell long, pcell long")


def _emit_probes(pts: DataFrame, key: str) -> DataFrame:
    """(key, ts_us, tb, x, y, z, cell) -> 27-key probe rows: the cell's
    9-neighborhood x buckets {tb-1, tb, tb+1}.

    The neighbor relation is joined in from the tiny distinct-cell
    adjacency table (broadcast-sized: occupied level-L cells — the
    banding level is coarse by construction, MinWidth(L) >= radius, so
    the table is bounded by min(6*4^L, distinct event cells); drop the
    broadcast hint and let AQE pick if a deployment ever bands at leaf
    levels), and the bucket fan-out is a codegen explode — the full 27x
    row multiplication happens JVM-side; Python only ever touches one
    row per DISTINCT cell."""
    nbr = _neighbor_table(pts.select("cell"))
    return (
        pts.join(F.broadcast(nbr), "cell")
        .withColumn(
            "ptb",
            F.explode(
                F.array(F.col("tb") - 1, F.col("tb"), F.col("tb") + 1)
            ),
        )
        .select(key, "ts_us", "x", "y", "z", "pcell", "ptb")
    )


def spacetime_join(
    events: DataFrame,
    radius_rad: float,
    window_s: float,
    key: str = "event_id",
    latlng: tuple[str, str] = ("lat", "lng"),
    ts_col: str = "ts",
    level: int | None = None,
) -> DataFrame:
    """Self-join: (a, b, dt_us) for unordered pairs a < b with spherical
    distance <= radius AND |ts_a - ts_b| <= window.  dt_us is the exact
    signed ts_b - ts_a in microseconds (integer — engine-portable)."""
    if level is None:
        level = spacetime_level(radius_rad)
    window_us = int(round(window_s * 1_000_000))
    limit2 = chord2_from_angle(radius_rad)

    ts_type = events.schema[ts_col].dataType.simpleString()
    if ts_type in ("timestamp", "timestamp_ntz"):
        # timezone-free epoch micros (the DuckDB twin is epoch_us(ts)
        # on the same naive values)
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', cast({ts_col} as timestamp_ntz))"
        )
    else:  # already integer microseconds
        ts_us = F.col(ts_col).cast("long")
    src = events.select(key, *latlng, ts_col)
    # Small-scan parallelism lift (same rationale as knn.py): a local
    # fixture's parquet arrives in a handful of splits and would run the
    # join/refine on a fraction of the cores; at production scale the
    # scan already carries >= cores splits and this never fires.
    want_parts = events.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < want_parts:
        src = src.repartition(want_parts)
    p3 = F.col("_p3")
    base = (
        src
        .withColumn("ts_us", ts_us)
        .withColumn("tb", F.floor(F.col("ts_us") / F.lit(window_us)))
        .withColumn("_p3", s2_xyz(F.col(latlng[0]), F.col(latlng[1])))
        .withColumn(
            "cell",
            s2sql.parent(s2_cellid(F.col(latlng[0]), F.col(latlng[1])), level),
        )
        .select(
            key,
            "ts_us",
            "tb",
            p3["x"].alias("x"),
            p3["y"].alias("y"),
            p3["z"].alias("z"),
            "cell",
        )
    )

    home = base.select(
        F.col(key).alias("_bk"),
        F.col("ts_us").alias("_bts"),
        F.col("x").alias("_bx"),
        F.col("y").alias("_by"),
        F.col("z").alias("_bz"),
        F.col("cell").alias("_bcell"),
        F.col("tb").alias("_btb"),
    )
    probes = _emit_probes(base, key)

    chord2 = (
        (F.col("x") - F.col("_bx")) * (F.col("x") - F.col("_bx"))
        + (F.col("y") - F.col("_by")) * (F.col("y") - F.col("_by"))
        + (F.col("z") - F.col("_bz")) * (F.col("z") - F.col("_bz"))
    )
    pairs = (
        probes.join(
            home,
            (F.col("pcell") == F.col("_bcell")) & (F.col("ptb") == F.col("_btb")),
        )
        .where(F.col(key) != F.col("_bk"))
        .where(F.abs(F.col("ts_us") - F.col("_bts")) <= F.lit(window_us))
        .where(chord2 <= F.lit(limit2))
        .select(
            F.least(F.col(key), F.col("_bk")).alias("a"),
            F.greatest(F.col(key), F.col("_bk")).alias("b"),
            F.when(F.col(key) < F.col("_bk"), F.col("_bts") - F.col("ts_us"))
            .otherwise(F.col("ts_us") - F.col("_bts"))
            .alias("dt_us"),
        )
    )
    # both probe directions survive the refine (see module docstring on
    # corner asymmetry) — canonical dedup on the small result set
    return pairs.dropDuplicates(["a", "b"])
