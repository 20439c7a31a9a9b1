"""As-of join and banded range join — the two ordered-join shapes the
DataFrame API lacks as primitives, expressed as single-shuffle plans.

``asof_join`` answers "for each left row, the most recent right row at
or before it (per key)" — event attribution, slowly-changing-dimension
lookup, sensor alignment.  The naive formulation is a non-equi join
(``l.key = r.key AND r.ts <= l.ts`` + argmax), which Spark plans as a
broadcast/cartesian nested loop — quadratic per key.  We use the
union-and-carry trick instead: tag both sides, union them, sort each
key partition once by (ts, side, tiebreak), and carry the latest right
payload forward with ``last(..., ignorenulls=True)`` over a ROWS frame.

Scale shape:
- ONE shuffle of |L| + |R| rows (the window's hash partitioning by
  key), one sort — the same cost as a sort-merge join, with no
  candidate blow-up for long histories.
- zero Python nodes: tagging, the carry, and the tolerance filter are
  all native expressions inside whole-stage codegen.
- skew: per-key windows serialize a pathological hot key only within
  its own partition (the per-key-sequence bound; pre-split hot keys on
  a composite (key, epoch) upstream when that matters — carrying the
  last right row of epoch N into N+1 restores exactness).

``range_join`` answers "which intervals contain this point" without a
cartesian plan: intervals explode to the fixed-width buckets they
touch, points hash to their single bucket, and the match is a plain
equi-join + residual BETWEEN — the 1-D analog of the covering-term
spatial join (operators/spatial_join.py).  Each (point, interval) pair
can only meet in the point's bucket, so no post-join dedup is needed.

Reference parity: the reference library has no relational shell; these
cover the ordered-join surface its embedding applications hand-roll
(SURVEY.md §2.12 relational checklist).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: int | float | None = None,
    right_tiebreak: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left rows + the payload of the matching right row.

    For ``direction='backward'`` the match is the right row with the
    greatest ``right_ts <= left_ts`` (inclusive); ``'forward'`` takes
    the least ``right_ts >= left_ts``.  Unmatched left rows survive
    with null payload (left-outer semantics).  ``tolerance`` (same
    units as the ts columns, which must be numeric/orderable) nulls a
    match whose |gap| exceeds it.

    Determinism: among right rows tied on (keys, ts) the one with the
    greatest ``right_tiebreak`` wins (backward; least for forward) —
    pass a unique column whenever right ts values can collide, else
    the pick is partition-order dependent.

    Output columns: every left column, then ``{prefix}{right_ts}``
    (the matched timestamp) and ``{prefix}{c}`` for each requested
    right column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    payload = F.struct(
        F.col(right_ts).alias("_mts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    tb = (
        [F.col(right_tiebreak).alias("_tb")]
        if right_tiebreak
        else [F.lit(0).alias("_tb")]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_pay"),
        *tb,
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        F.lit(0).alias("_tb"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    both = r.unionByName(l)
    # backward: scan ascending — at equal ts the right row (side 0)
    # sorts before the left probe, so ties are inclusive.  forward:
    # scan descending, same tie layout, tiebreak order flipped so the
    # LEAST tied right row wins symmetric to backward's greatest.
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc()]
    else:
        order = [
            F.col("_ts").desc(),
            F.col("_side").asc(),
            F.col("_tb").desc(),
        ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        both.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("_ts") - F.col("_m._mts")
            if direction == "backward"
            else F.col("_m._mts") - F.col("_ts")
        )
        carried = carried.withColumn(
            "_m",
            F.when(gap <= F.lit(tolerance), F.col("_m")).otherwise(
                F.lit(None).cast(r.schema["_pay"].dataType)
            ),
        )
    out = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ] + [F.col("_m._mts").alias(f"{prefix}{right_ts}")] + [
        F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols
    ]
    return carried.select(*out)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band: int | float,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` × matching ``intervals`` where
    ``lo_col <= point_col <= hi_col`` (inclusive), planned as a banded
    equi-join instead of a nested loop.

    ``band`` is the bucket width; pick it near the median interval
    width — an interval spanning w produces ceil(w/band)+1 join terms
    (the identical term/point trade the spatial covering join makes).
    Points land in exactly one bucket, so the join emits no duplicate
    pairs and needs no dedup.  ``how='left'`` keeps unmatched points
    (null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left: {how}")
    pb = points.withColumn("_bucket", F.floor(F.col(point_col) / F.lit(band)))
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(band)),
                F.floor(F.col(hi_col) / F.lit(band)),
            )
        ),
    )
    cond: Column = (
        (pb["_bucket"] == ib["_bucket"])
        & (pb[point_col] >= ib[lo_col])
        & (pb[point_col] <= ib[hi_col])
    )
    joined = pb.join(ib, cond, how)
    return joined.select(
        *[pb[c] for c in points.columns],
        *[ib[c] for c in intervals.columns],
    )
