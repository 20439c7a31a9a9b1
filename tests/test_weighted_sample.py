"""Weighted sampling without replacement: distributional sanity (the
A-ES priority actually biases selection by weight), determinism, and
the partial WindowGroupLimit plan shape."""

import numpy as np

from geo_spark.operators.sampling import weighted_sample


def test_heavier_items_win_proportionally(spark):
    # 2000 strata, two items each: weight 9 vs 1.  P(heavy wins) = 0.9
    # under A-ES; the LCG stream should land near it.
    rows = []
    for s in range(2000):
        rows.append((s, 2 * s, 9.0))  # heavy: even ids
        rows.append((s, 2 * s + 1, 1.0))  # light: odd ids
    df = spark.createDataFrame(rows, "stratum long, doc_id long, w double")
    top1 = weighted_sample(df, "stratum", 1, weight_col="w").collect()
    assert len(top1) == 2000
    heavy_wins = sum(1 for r in top1 if r["doc_id"] % 2 == 0)
    assert 0.85 <= heavy_wins / 2000 <= 0.95, heavy_wins


def test_without_replacement_and_deterministic(spark):
    rows = [(0, i, float(1 + i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "stratum long, doc_id long, w double")
    a = weighted_sample(df, "stratum", 10, weight_col="w").collect()
    b = weighted_sample(df, "stratum", 10, weight_col="w").collect()
    ids_a = [r["doc_id"] for r in sorted(a, key=lambda r: r["rank"])]
    ids_b = [r["doc_id"] for r in sorted(b, key=lambda r: r["rank"])]
    assert ids_a == ids_b
    assert len(set(ids_a)) == 10  # no repeats
    assert [r["rank"] for r in sorted(a, key=lambda r: r["rank"])] == list(
        range(1, 11)
    )


def test_matches_reference_priorities(spark):
    # replay the exact priority formula in numpy and check the top-k set
    rows = [(0, i, float(10 + 3 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "stratum long, doc_id long, w double")
    got = [
        r["doc_id"]
        for r in sorted(
            weighted_sample(df, "stratum", 8, weight_col="w").collect(),
            key=lambda r: r["rank"],
        )
    ]
    import hashlib

    ids = np.arange(40, dtype=np.int64)
    v = np.array(
        [
            int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
            for i in ids
        ],
        dtype=np.int64,
    )
    u = (v + 1) / 4503599627370496.0
    pri = np.log(u) / (10.0 + 3.0 * ids)
    want = list(np.argsort(-pri, kind="stable")[:8])
    assert got == want


def test_partial_window_group_limit_plan(spark):
    rows = [(i % 5, i, 1.0 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "stratum long, doc_id long, w double")
    plan = weighted_sample(df, "stratum", 3, weight_col="w")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2  # partial below the exchange
