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
