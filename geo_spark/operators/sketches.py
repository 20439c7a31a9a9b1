"""Distinct-counting sketches for grouped rollups.

KMV (K-Minimum-Values): per group, keep the k smallest *distinct* hash
values of the counted column; if fewer than k survive the count is
exact, otherwise the classic estimator ``(k-1) / kth_min_normalized``
(Bar-Yossef et al., "Counting distinct elements in a data stream").
This is the primitive behind "distinct users per tile" over 100 TB:
the shuffled state per group is k values, not the value set.

Determinism contract: the hash is 32-bit LCG-style *integer* arithmetic
(exact in Spark SQL and DuckDB alike — the same replayability rule the
geo-noise streams follow, operators/geo_noise.py), and the estimator is
integer floor-division, so a SQL oracle reproduces every output bit.
Statistical quality of an LCG is below a real mixer's; the operator
accepts custom SQL via ``hash_sql`` when deployment needs md5-grade
dispersion (the structure of the sketch is hash-agnostic).

Scale shape: one distinct-shuffle on (group, hash), then the rank<=k
window — Spark 4 plants a partial WindowGroupLimit below the exchange,
so each map task forwards at most k rows per group it sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 32-bit mixed congruential hash: exact in both engines (operands stay
# far below 2^63, % is arithmetic mod on nonnegative values)
KMV_HASH_SQL = "(({v} * 2654435761 + 12345) % 4294967296)"
_KMV_RANGE = 4_294_967_296  # 2^32


def kmv_hash_sql(value_col: str) -> str:
    """The default hash as a SQL string (for oracles)."""
    return KMV_HASH_SQL.format(v=value_col)


def sampled_group_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_cols..., n_sample, median): per-group median estimated on
    a deterministic bottom-k-by-md5 sample (the hash-rank sample of
    operators/sampling.py), selected as the ceil(m/2)-th smallest
    sample value with (value, id) tie order.

    Per-group state is k rows regardless of group size — the quantile
    analog of the KMV distinct sketch.  The median is a SELECTED row's
    value (no arithmetic), so the SQL oracle reproduces it bitwise;
    both windows share one hash partitioning (one shuffle total)."""
    w_sample = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    kept = (
        df.select(*group_cols, value_col, id_col)
        .withColumn("_rn", F.row_number().over(w_sample))
        .where(F.col("_rn") <= k)
    )
    w_rank = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col), F.col(id_col)
    )
    cnt = Window.partitionBy(*group_cols)
    return (
        kept.withColumn("_vr", F.row_number().over(w_rank))
        .withColumn("_m", F.count(F.lit(1)).over(cnt))
        .where(F.col("_vr") == F.ceil(F.col("_m") / 2))
        .select(
            *group_cols,
            F.col("_m").alias("n_sample"),
            F.col(value_col).alias("median"),
        )
    )


def kmv_pair_similarity(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_sql: str | None = None,
) -> DataFrame:
    """(g1, g2, k_used, matches, est_jaccard_ppm, est_union): pairwise
    set-similarity between every two groups' value sets, estimated from
    merged KMV sketches — the mergeability that makes KMV usable at
    100 TB (ship one k-array per group, never the value sets).

    Estimator (Beyer et al., "On synopses for distinct-value estimation
    under multiset operations"): K = the k smallest of the UNION of the
    two sketches (which equals the k smallest of the union of the full
    sets — the KMV merge property); Jaccard ≈ |K ∩ A ∩ B| / |K|, and
    the union size reuses the kth-min estimator on K.  All integer
    arithmetic (ppm fixed-point, floor div), so the approximate
    operator has an exact SQL oracle.

    Scale shape: the sketch build is kmv_distinct's distinct-shuffle +
    rank-k window; each group then collapses to ONE row holding a
    ≤k-long sorted array, and the pair enumeration is an all-pairs join
    over those one-row-per-group sketches (inherently quadratic in
    group count — bound the group domain or pre-filter candidate pairs
    upstream; the arrays, not the data, are what's joined)."""
    h = F.expr((hash_sql or KMV_HASH_SQL).format(v=value_col))
    d = df.select(group_col, h.alias("_h")).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    kept = d.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    arrs = kept.groupBy(group_col).agg(
        F.sort_array(F.collect_list("_h")).alias("_arr")
    )
    a = arrs.select(F.col(group_col).alias("g1"), F.col("_arr").alias("_a1"))
    b = arrs.select(F.col(group_col).alias("g2"), F.col("_arr").alias("_a2"))
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    union_all = F.array_sort(F.array_union(F.col("_a1"), F.col("_a2")))
    staged = pairs.select(
        "g1",
        "g2",
        F.slice(union_all, 1, k).alias("_topk"),
        F.size(union_all).cast("long").alias("_un"),
        F.array_intersect(F.col("_a1"), F.col("_a2")).alias("_inter"),
    ).select(
        "g1",
        "g2",
        F.size("_topk").cast("long").alias("k_used"),
        F.size(F.array_intersect(F.col("_topk"), F.col("_inter")))
        .cast("long")
        .alias("matches"),
        F.element_at(F.col("_topk"), F.size("_topk")).alias("_kth"),
        F.col("_un"),
    )
    return staged.select(
        "g1",
        "g2",
        "k_used",
        "matches",
        F.expr("CAST(matches * 1000000 DIV k_used AS BIGINT)").alias(
            "est_jaccard_ppm"
        ),
        F.when(F.col("_un") < k, F.col("_un"))
        .otherwise(F.expr(f"({k - 1} * {_KMV_RANGE}) div _kth"))
        .cast("long")
        .alias("est_union"),
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    hash_sql: str | None = None,
) -> DataFrame:
    """(group_cols..., n_kept, kth_hash, est_distinct): KMV distinct
    estimate per group.  ``n_kept < k`` means est_distinct is exact."""
    h = F.expr((hash_sql or KMV_HASH_SQL).format(v=value_col))
    d = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = d.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    )
    # (k-1) / (kth / 2^32) as pure integer floor-division: exact in any
    # engine.  kth_hash > 0 whenever n_kept == k (k distinct values).
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"({k - 1} * {_KMV_RANGE}) div kth_hash")
    )
    return agg.withColumn("est_distinct", est.cast("long"))
