"""Change-data-capture apply: merge an ordered change stream into a
base snapshot — the MERGE INTO / upsert primitive every Iceberg-style
table maintenance job runs (crawl refreshes, metadata corrections,
GDPR deletes).

Semantics: the base snapshot is version 0; every change row carries
(key, op, ts, payload) with op in {'U', 'D'} ('U' = upsert — insert
or update; 'D' = delete).  Last writer wins per key by (ts, op), with
'D' ordered AFTER 'U' at equal ts (a delete at the same timestamp as
an update tombstones it — the conservative tie rule, stated so the
oracle can replay it).  The result is the new snapshot: every
surviving key with its winning payload and version timestamp.

Scale shape: ONE shuffle — union the (skinny) change stream with the
base and take the per-key argmax via max(struct(ts, op_rank,
payload...)), a map-combined aggregate, NOT a row_number window (the
window would sort whole partitions; the struct-max needs only a
running maximum per key).  Change streams are tiny against a 10^12-row
base, so AQE sizes the post-union aggregate by the base's layout; with
the base bucketed by key the exchange drops entirely (the
test_bucketed_join.py property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    payload: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """(key, *payload, version_ts): the merged snapshot.  Base rows
    rank as upserts at version_ts = 0; change rows must carry ts > 0.
    Exactly one change per (key, ts, op) is assumed (dedupe upstream);
    at equal ts a 'D' beats a 'U'.

    If the uniqueness assumption is violated, duplicate (key, ts, op)
    rows resolve deterministically but arbitrarily: the payload columns
    sit in the struct-max as trailing tie-breakers, so the winner is
    the row with the lexicographically greatest payload, and a NULL
    payload field sorts LOWEST (loses to any non-null).  This is a
    silent pick, not an error — enforce uniqueness upstream when the
    distinction matters."""
    b = base.select(
        F.col(key).alias("_k"),
        *[F.col(c) for c in payload],
        F.lit(0).cast("long").alias("_ts"),
        F.lit(0).alias("_del"),
    )
    c = changes.select(
        F.col(key).alias("_k"),
        *[F.col(p) for p in payload],
        F.col(ts_col).cast("long").alias("_ts"),
        F.when(F.col(op_col) == "D", 1).otherwise(0).alias("_del"),
    )
    merged = b.unionByName(c)
    win = merged.groupBy("_k").agg(
        F.max(
            F.struct(
                F.col("_ts"),
                F.col("_del"),
                *[F.col(p).alias(p) for p in payload],
            )
        ).alias("_w")
    )
    return (
        win.where(F.col("_w._del") == 0)
        .select(
            F.col("_k").alias(key),
            *[F.col(f"_w.{p}").alias(p) for p in payload],
            F.col("_w._ts").alias("version_ts"),
        )
    )
