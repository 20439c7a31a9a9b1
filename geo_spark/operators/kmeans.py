"""Deterministic k-means over embedding columns — the clustering step
of corpus curation (topic balancing, dedup-cluster seeding, IVF coarse
quantizer training) expressed so the iterative algorithm is exactly
replayable in any engine.

Determinism contract (the same fixed-point trick as the PQ tier,
operators/similarity.py): vectors quantize to non-negative BIGINTs
(``floor((x + shift) * scale)``), so every distance, argmin, and
centroid mean is integer arithmetic — no float accumulation order, no
cross-engine rounding.  Init is the kc rows with the smallest
(md5(id), id) — a data-sampled seed, not RNG.  Ties in the argmin
break toward the lowest centroid index; empty clusters drop out (both
rules stated so an oracle can replay them).

Scale shape per iteration:
- assignment: broadcast the kc centroid arrays and compute distances
  with ``zip_with``/``aggregate`` inside codegen — a broadcast
  nested-loop over kc rows, N·kc candidate rows, no shuffle of the
  embedding table beyond the argmin aggregation.
- update: members explode to (cluster, dim) partial sums — ONE shuffle
  of N·dim skinny rows with map-side combine.
- the kc×dim centroid table collects to the driver between rounds
  (tiny, and it also cuts lineage — the iterative-loop rule learned in
  operators/dedup.py's pointer jumping).

The reference has no clustering; this serves SURVEY.md §2.12's
LLM-data-pipeline family alongside the IVF/PQ ANN tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# shared with the oracle: quantizer SQL (x is one vector component)
QUANT_SQL = "CAST(FLOOR(({x} + {shift!r}) * {scale!r}) AS BIGINT)"


def _quantize_vec(vec_col: str, shift: float, scale: float):
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor((x + F.lit(shift)) * F.lit(scale)).cast("long"),
    )


def kmeans_embed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    kc: int = 8,
    iters: int = 2,
    shift: float = 1.0,
    scale: float = 1_000_000.0,
) -> DataFrame:
    """(id, cidx, dist): final cluster assignment per row after
    ``iters`` Lloyd iterations (init counts as iteration 1's
    centroids).  ``dist`` is the exact integer squared distance to the
    winning centroid in quantized units; ``shift`` must exceed
    ``max|x|`` so quantized components are non-negative (keeps
    floor-division identical across engines)."""
    spark: SparkSession = df.sparkSession
    # persist: the quantized base is re-read by the seed pick, the
    # centroid build, and every iteration's assignment + update — for
    # a composed input (e.g. the text-featurizer chain feeding
    # q_topic_clusters) each re-read would replay the whole upstream
    # pipeline.  The cached blocks live until the session drops them:
    # long-lived apps re-clustering repeatedly should
    # spark.catalog.clearCache() (or unpersist via the catalog)
    # between calls, the same lifetime contract as minhash_index
    base = df.select(
        F.col(id_col).alias("_id"),
        _quantize_vec(vec_col, shift, scale).alias("_q"),
    ).persist()
    seeds = (
        base.select("_id", F.md5(F.col("_id").cast("string")).alias("_m"))
        .orderBy("_m", "_id")
        .limit(kc)
    )
    from pyspark.sql import Window

    w = Window.orderBy("_m", "_id")
    cent = (
        seeds.withColumn("cidx", F.row_number().over(w) - 1)
        .join(base, "_id")
        .select("cidx", F.col("_q").alias("_c"))
    )
    asg = None
    for t in range(iters):
        # collect the tiny centroid table: broadcast literal + flat lineage
        rows = sorted(cent.collect(), key=lambda r: r["cidx"])
        cent_df = spark.createDataFrame(
            [(int(r["cidx"]), list(r["_c"])) for r in rows],
            "cidx int, _c array<bigint>",
        )
        cand = base.crossJoin(F.broadcast(cent_df))
        d2 = F.aggregate(
            F.zip_with("_q", "_c", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        scored = cand.select("_id", "cidx", "_q", d2.alias("_d"))
        asg = scored.groupBy("_id").agg(
            F.min(F.struct(F.col("_d"), F.col("cidx"))).alias("_m")
        ).select(
            "_id",
            F.col("_m.cidx").alias("cidx"),
            F.col("_m._d").alias("dist"),
        )
        if t < iters - 1:
            members = asg.join(base, "_id").select(
                "cidx", F.posexplode("_q").alias("dim", "qv")
            )
            cent = (
                members.groupBy("cidx", "dim")
                .agg(F.expr("sum(qv) div count(*)").alias("cv"))
                .groupBy("cidx")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "cv"))
                    ).alias("_p")
                )
                .select(
                    "cidx",
                    F.transform(F.col("_p"), lambda s: s["cv"]).alias("_c"),
                )
            )
    return asg.select(F.col("_id").alias(id_col), "cidx", "dist")
