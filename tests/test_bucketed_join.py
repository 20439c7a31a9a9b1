"""Bucketed-table co-located joins: several operators' 100 TB notes
(snapshot_diff, spatial covering joins) claim that same-bucketing both
sides removes the join exchange.  This pins that claim against the
actual planner: bucketBy(url-hash) tables join with ZERO Exchange
nodes, while the plain-parquet twin of the same join pays two."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count shuffle exchanges only (broadcast exchanges don't move
    # the fact table)
    return plan.count("Exchange hashpartitioning")


@pytest.fixture()
def snapshots(spark, tmp_path):
    # warehouse.dir is a static conf — tables land in the session's
    # default warehouse and are dropped in teardown
    rows = [(f"https://a.com/p/{i}", f"h{i % 97}") for i in range(5000)]
    df = spark.createDataFrame(rows, "url string, fp string")
    for name in ("snap_old_b", "snap_new_b"):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "url")
            .sortBy("url")
            .format("parquet")
            .saveAsTable(name)
        )
    plain = str(tmp_path / "plain")
    df.write.parquet(plain + "/old")
    df.write.parquet(plain + "/new")
    yield plain
    for name in ("snap_old_b", "snap_new_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_skips_shuffle(spark, snapshots):
    from geo_spark.operators.webcorpus import snapshot_diff

    old_b = spark.table("snap_old_b")
    new_b = spark.table("snap_new_b")
    bucketed = snapshot_diff(old_b, new_b)
    old_p = spark.read.parquet(snapshots + "/old")
    new_p = spark.read.parquet(snapshots + "/new")
    plain = snapshot_diff(old_p, new_p)

    assert _exchanges(bucketed) == 0  # co-located: scan feeds the join
    assert _exchanges(plain) >= 2  # unbucketed pays one per side
    # same answer either way
    assert bucketed.count() == plain.count() == 5000
    assert (
        bucketed.where(F.col("status") != "unchanged").count() == 0
    )
