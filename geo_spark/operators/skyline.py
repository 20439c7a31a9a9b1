"""Distributed 2-D skyline (Pareto frontier) — the multi-criteria
"best tradeoffs" operator: keep every row that no other row dominates,
where q dominates p iff q.x <= p.x AND q.y <= p.y with at least one
strict inequality (both axes minimized; negate a column upstream to
maximize it).

The naive formulation is a quadratic NOT EXISTS anti-join (every row
against every row) — a cartesian plan at any scale.  The classic
distributed shape (grid-prefilter skyline, cf. the block-nested-loop /
sort-filter-skyline literature) is used instead:

1. distinct (group, x, y) value pairs — duplicates collapse before any
   pairwise reasoning (one shuffle of the 2/3-column projection);
2. bucket prefilter: x is quantized into ``buckets`` equal-width bins
   per group (bounds from a tiny per-group min/max agg).  Every point
   in a strictly earlier bin has strictly smaller x, so a point p is
   PROVABLY dominated when min(y) over earlier bins <= p.y.  The
   per-bin min table is tiny (<= groups x buckets rows); its running
   prefix-min is one window over that tiny table, broadcast back.
   Pruning is exact-safe for ANY bin boundaries (only bin *order*
   matters), so float quantization cannot perturb the result.
3. exact pass over the survivors: sort by (x asc, y asc) per group and
   keep rows whose running min(y) over STRICTLY PRECEDING rows exceeds
   their own y.  On distinct pairs this is exactly non-dominance: a
   preceding row has x < x_p, or x == x_p with y < y_p — either way
   prev_min_y <= y_p certifies a dominating witness.
4. inner equi-join (broadcast — the frontier is small) back to the
   input restores all carried columns and duplicate rows of frontier
   points.

Scale shape: one distinct shuffle + one tiny agg + one window over the
survivor set.  For independently-distributed axes the expected frontier
is O(ln n) and survivors per group are <= buckets + frontier; the
worst case (perfectly anti-correlated axes) degenerates to "everything
is on the frontier", where the output itself is the bottleneck — raise
``buckets`` or pre-partition by a coarse x-range when a huge frontier
is genuinely expected.  Zero Python nodes end to end.

Reference parity: no analog (the reference is a geometry library);
this covers the top-k/ordering family of SURVEY.md §2.12 for
multi-criteria selection (cheapest-and-earliest events, shortest-and-
freshest documents, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline2d(
    df: DataFrame,
    x: str,
    y: str,
    by: list[str] | None = None,
    buckets: int = 1024,
) -> DataFrame:
    """Rows of ``df`` on the per-group Pareto frontier minimizing
    (``x``, ``y``).  Rows with a null in either axis are dropped.
    Duplicate (x, y) points are all kept when the point is on the
    frontier (strict dominance — equal points never dominate each
    other)."""
    by = list(by or [])
    clean = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    pairs = clean.select(*by, x, y).distinct()

    grp = [F.col(c) for c in by]
    bounds = pairs.groupBy(*grp).agg(
        F.min(x).alias("_xmin"), F.max(x).alias("_xmax")
    )
    joined = (
        pairs.join(F.broadcast(bounds), on=by, how="inner")
        if by
        else pairs.crossJoin(F.broadcast(bounds))
    )
    # equal-width bin; degenerate range (xmax == xmin) puts everything
    # in bin 0.  least() clamps the xmax point into the last bin.
    width = (F.col("_xmax") - F.col("_xmin")) / F.lit(float(buckets))
    binned = joined.withColumn(
        "_bin",
        F.when(F.col("_xmax") == F.col("_xmin"), F.lit(0)).otherwise(
            F.least(
                F.floor((F.col(x) - F.col("_xmin")) / width).cast("int"),
                F.lit(buckets - 1),
            )
        ),
    ).drop("_xmin", "_xmax")

    bin_min = binned.groupBy(*grp, F.col("_bin")).agg(F.min(y).alias("_bmin"))
    w_bins = (
        Window.partitionBy(*by).orderBy("_bin")
        if by
        else Window.orderBy("_bin")
    ).rowsBetween(Window.unboundedPreceding, -1)
    prefix = bin_min.select(
        *by, "_bin", F.min("_bmin").over(w_bins).alias("_prev_bin_min")
    )

    survivors = (
        binned.join(F.broadcast(prefix), on=by + ["_bin"], how="inner")
        .where(
            F.col("_prev_bin_min").isNull()
            | (F.col("_prev_bin_min") > F.col(y))
        )
        .drop("_bin", "_prev_bin_min")
    )

    w_exact = (
        Window.partitionBy(*by).orderBy(F.col(x).asc(), F.col(y).asc())
        if by
        else Window.orderBy(F.col(x).asc(), F.col(y).asc())
    ).rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        survivors.withColumn("_prev_min_y", F.min(y).over(w_exact))
        .where(
            F.col("_prev_min_y").isNull() | (F.col("_prev_min_y") > F.col(y))
        )
        .drop("_prev_min_y")
    )

    return clean.join(F.broadcast(frontier), on=by + [x, y], how="inner")
