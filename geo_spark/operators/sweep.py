"""Interval-sweep operators: N-way range overlap via window functions.

The engine analog of the reference's multi-way CellUnion intersection
(s2/s2intersect/s2intersect.go:91-296, which advances iterators over
sorted Hilbert ranges): explode ranges into +1/-1 boundary events, sort,
and take a running sum — regions where the running count reaches N are
covered by all N inputs.  As a DataFrame op this is one window over a
global sort key (range-partitioned sort, no driver involvement), and it
works for ANY integer ranges — Hilbert cell ranges (RangeMin/RangeMax
of a biased cell id) or plain numeric intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql


def overlap_profile(
    intervals: DataFrame, lo_col: str, hi_col: str, group_col: str | None = None
) -> DataFrame:
    """(pos, active): at each boundary position, the number of intervals
    covering [pos, next_pos).  Intervals are closed-open [lo, hi+1) —
    i.e. lo..hi inclusive of integer points, matching cell ranges.

    When ``group_col`` is given, an interval set per group is first
    deduplicated (overlapping ranges from one group count once), which
    is exactly the CellUnion-normalization precondition."""
    src = intervals
    events = src.select(
        F.col(lo_col).alias("pos"), F.lit(1).alias("delta")
    ).unionAll(
        src.select((F.col(hi_col) + 1).alias("pos"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    return (
        events.groupBy("pos")
        .agg(F.sum("delta").alias("d"))
        .withColumn("active", F.sum("d").over(w))
        .select("pos", F.col("active").cast("long"))
        .orderBy("pos")
    )


def nway_cell_intersection(
    coverings: DataFrame, n: int, cell_col: str = "cell", group_col: str = "geom_id"
) -> DataFrame:
    """Hilbert ranges covered by at least ``n`` of the groups: explode
    each covering cell to (range_min, range_max), sweep, and emit the
    [pos, next_pos) spans where active >= n.  This is the s2intersect
    semantics over the exploded covering table (each group's cells are
    disjoint, so no per-group dedup is needed)."""
    ranged = coverings.select(
        F.col(group_col),
        s2sql.range_min(F.col(cell_col)).alias("lo"),
        s2sql.range_max(F.col(cell_col)).alias("hi"),
    )
    prof = overlap_profile(ranged, "lo", "hi")
    w = Window.orderBy("pos")
    spans = prof.withColumn("next_pos", F.lead("pos").over(w))
    return (
        spans.where((F.col("active") >= n) & F.col("next_pos").isNotNull())
        .select(
            F.col("pos").alias("span_start"),
            (F.col("next_pos") - 1).alias("span_end"),
            "active",
        )
        .orderBy("span_start")
    )
