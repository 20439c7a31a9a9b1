"""Equi-depth layout partitioning along a space-filling-curve key.

The write-side half of spatial data skipping: rows get a partition id
along an ORDERED integer layout key — the engine's Hilbert S2 cell id
(s2/cellid.go's ordering guarantee: the curve position IS the id), a
web-mercator Z-order/Morton key (functions/webgrid.py), or any other
curve key — such that partitions are (a) contiguous, disjoint key
ranges (a min/max manifest prunes them against query coverings) and
(b) equi-depth (balanced row counts, immune to hot-cell skew that
equal-WIDTH tiling cannot absorb).

Assignment rule (deterministic, exactly replayable in SQL):

    part_id = (rows_strictly_before_key * n_parts) // total_rows

Rows sharing one key always land in one partition — no intra-key
splits — so each partition's row count exceeds the ideal
``total/n_parts`` by at most the largest single-key multiplicity (the
residual hot-CELL skew; split hot keys upstream — e.g. use a deeper
cell level — if one key alone exceeds a partition budget).

Scale shape (100 TB):
  1. per-key counts — ONE corpus-wide map-combined groupBy;
  2. exclusive prefix sums via a window over the KEY HISTOGRAM, which
     is grid-bounded (#occupied cells at the chosen level), never
     corpus-bounded;
  3. rows rejoin the (key -> part_id) map — broadcast while the
     histogram fits (it is the same dimension-sized object the
     covering joins broadcast), AQE equi-join beyond.
The physical write is then ``assigned.repartition(n_parts,
part_col)`` (or a partitioned sink) and :func:`layout_manifest` emits
the per-partition (n_rows, n_keys, min_key, max_key) row the
data-skipping manifest and the lineage/metrics checkpoint record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equidepth_layout(
    df: DataFrame,
    key_col: str,
    n_parts: int,
    part_col: str = "part_id",
    broadcast_map: bool = True,
) -> DataFrame:
    """``df`` + ``part_col``: the equi-depth partition id along
    ``key_col`` (see module docstring for the exact rule and the
    balance guarantee)."""
    if n_parts < 1:
        raise ValueError("n_parts must be >= 1")
    hist = df.groupBy(key_col).agg(F.count("*").alias("_cnt"))
    w = (
        Window.orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        key_col,
        F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_before"),
    )
    tot = hist.agg(F.sum("_cnt").alias("_tot"))
    pidmap = cum.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.expr(f"(_before * {int(n_parts)}) div _tot").alias(part_col),
    )
    if broadcast_map:
        pidmap = F.broadcast(pidmap)
    return df.join(pidmap, key_col)


def layout_manifest(
    assigned: DataFrame, key_col: str, part_col: str = "part_id"
) -> DataFrame:
    """(part_col, n_rows, n_keys, min_key, max_key): the per-partition
    manifest row — disjoint [min_key, max_key] ranges by construction,
    so a reader prunes partitions by intersecting them with a query
    covering's cell ranges."""
    return assigned.groupBy(part_col).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(key_col).alias("n_keys"),
        F.min(key_col).alias("min_key"),
        F.max(key_col).alias("max_key"),
    )
