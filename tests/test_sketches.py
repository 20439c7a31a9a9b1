"""KMV distinct sketch: exactness below k, estimator accuracy above k,
and the plan shape that makes it shuffle-light (partial
WindowGroupLimit below the exchange)."""

from __future__ import annotations

import numpy as np

from geo_spark.operators.sketches import KMV_HASH_SQL, kmv_distinct


def _hash(v: np.ndarray) -> np.ndarray:
    return (v * 2654435761 + 12345) % 4294967296


def test_kmv_exact_below_k(spark):
    rows = [(g, int(u)) for g in ("a", "b") for u in range(10)]
    df = spark.createDataFrame(rows, "grp string, user_id long")
    out = {
        r["grp"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(df, ["grp"], "user_id", k=32).collect()
    }
    assert out == {"a": (10, 10), "b": (10, 10)}


def test_kmv_estimate_matches_reference_formula(spark):
    rng = np.random.default_rng(3)
    users = rng.integers(0, 5000, 4000)
    df = spark.createDataFrame(
        [("g", int(u)) for u in users], "grp string, user_id long"
    )
    k = 32
    row = kmv_distinct(df, ["grp"], "user_id", k=k).collect()[0]
    hs = np.unique(_hash(np.unique(users)))
    kth = int(np.sort(hs)[k - 1])
    want = ((k - 1) * 4294967296) // kth
    assert row["n_kept"] == k
    assert row["est_distinct"] == want
    # estimator sanity: within 3/sqrt(k) relative error of the truth
    truth = len(np.unique(users))
    assert abs(row["est_distinct"] - truth) / truth < 3 / np.sqrt(k)


def test_kmv_duplicate_hash_collapse(spark):
    # two users hashing to the same value count once (KMV is defined
    # over the distinct HASH set)
    # h(u) = h(u + 2^32 / gcd) is impossible for distinct small ids, so
    # force a collision via the modulus: u and u + 4294967296 collide
    # only if the multiply wraps identically — instead just feed literal
    # duplicate users, which must also collapse
    rows = [("g", 7)] * 5 + [("g", 8)] * 3
    df = spark.createDataFrame(rows, "grp string, user_id long")
    row = kmv_distinct(df, ["grp"], "user_id", k=8).collect()[0]
    assert (row["n_kept"], row["est_distinct"]) == (2, 2)


def test_kmv_plan_has_partial_window_group_limit(spark):
    df = spark.range(1000).select(
        (F_col_id() % 10).alias("grp"), F_col_id().alias("user_id")
    )
    plan = (
        kmv_distinct(df, ["grp"], "user_id", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id")
