"""Greedy k-center coreset selection over embedding columns — the
diversity-maximizing subset rule of corpus curation (pick K documents
so every document is close to some pick: seed sets for active
labeling, diverse eval slices, dedup-aware mixture anchors).

Gonzalez farthest-point traversal: start from the smallest id, then
repeatedly pick the point FARTHEST from the selected set (ties break
to the smallest id).  The greedy is a 2-approximation of the optimal
k-center radius — the classic guarantee — and, made deterministic,
is exactly replayable on any engine, which is what the relational
oracle certifies.

Determinism contract (the kmeans/PQ fixed-point trick,
operators/kmeans.py): vectors quantize to non-negative BIGINTs, so
every distance, max, and tiebreak is integer arithmetic — no float
accumulation order anywhere.

Scale shape per round:
- the ONLY per-round dataflow is `least(best, dist-to-new-center)`
  — a broadcast-literal projection (the new center rides into the
  plan as a literal array, no join) followed by ONE map-combined
  max-struct aggregate returning a single row to the driver.  The
  embedding table itself is never shuffled.
- the running `best` column is localCheckpoint-ed per round (flat
  lineage — the iterative-loop rule of dedup's pointer jumping), and
  picked rows are filtered out so the scanned set only shrinks.
- K driver actions total (one argmax per pick) — inherent to the
  greedy's sequential dependence; K is small (10s-100s) in every
  curation use, while N is the 100 TB side and stays distributed.

No reference analog (akhenakh/geo is geometry-only); this serves the
LLM-data-pipeline family (SURVEY.md §2.12) alongside kmeans and the
ANN tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geo_spark.plans.checkpoints import free_local_checkpoint

from geo_spark.operators.kmeans import _quantize_vec


def _sqdist_to_literal(vec_col, center: list[int]):
    lit = F.array([F.lit(int(c)).cast("long") for c in center])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kcenter_select(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    shift: float = 1.0,
    scale: float = 1_000_000.0,
) -> DataFrame:
    """(pick_order, id, r2): the K greedy k-center picks in selection
    order.  ``r2`` is the pick's exact integer squared distance to the
    previously selected set at the moment it was chosen — a
    non-increasing sequence whose last value bounds the covering
    radius (optimal radius^2 >= r2_K / 4).  Pick 0 is the smallest id
    with r2 = 0.  ``shift`` must exceed ``max|x|`` (non-negative
    quantized components, the cross-engine floor rule).

    ``id_col`` must be an INTEGER type: ties at equal r2 break toward
    the smallest id via a negated-id struct max, and the result schema
    is ``id long`` — string/UUID ids fail at analysis time (hash or
    dense-rank them to int64 upstream)."""
    spark: SparkSession = df.sparkSession
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            _quantize_vec(vec_col, shift, scale).alias("_q"),
        )
        .persist()
    )
    first = base.orderBy("_id").limit(1).collect()
    if not first:
        base.unpersist()
        return spark.createDataFrame(
            [], "pick_order long, id long, r2 long"
        )
    picks = [(0, first[0]["_id"], 0)]
    center = list(first[0]["_q"])
    best = base.where(F.col("_id") != F.lit(picks[0][1])).select(
        "_id", "_q", _sqdist_to_literal(F.col("_q"), center).alias("_b")
    )
    prev_ck = None
    for s in range(1, k):
        best = best.localCheckpoint()
        # the previous round's cut was fully drained into this one
        free_local_checkpoint(prev_ck)
        prev_ck = best
        top = best.agg(
            F.max(
                F.struct(
                    F.col("_b").alias("b"),
                    (-F.col("_id")).alias("ni"),
                    F.col("_q").alias("q"),
                )
            ).alias("t")
        ).collect()[0]["t"]
        if top is None:
            break
        pid = -top["ni"]
        picks.append((s, pid, top["b"]))
        center = list(top["q"])
        best = best.where(F.col("_id") != F.lit(pid)).select(
            "_id",
            "_q",
            F.least(
                F.col("_b"), _sqdist_to_literal(F.col("_q"), center)
            ).alias("_b"),
        )
    base.unpersist()
    return spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in picks],
        "pick_order long, id long, r2 long",
    )
