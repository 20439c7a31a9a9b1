"""CDC apply: merge semantics pins + python replay differential."""

from __future__ import annotations

import numpy as np


def _brute_apply(base, changes):
    # state[key] = (ts, del, payload); D beats U at equal ts
    st = {k: (0, 0, p) for k, p in base.items()}
    for k, ts, op, p in changes:
        cur = st.get(k)
        cand = (ts, 1 if op == "D" else 0, p)
        if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
            st[k] = cand
    return {
        k: (p, ts) for k, (ts, d, p) in st.items() if d == 0
    }


def test_cdc_apply_semantics(spark):
    from geo_spark.operators.cdc import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, 10, "U", "b2"),   # update
            (3, 10, "D", "_"),    # delete
            (5, 10, "U", "e"),    # insert of a new key
            (4, 10, "U", "d2"),   # update...
            (4, 20, "D", "_"),    # ...then delete later
            (3, 20, "U", "c2"),   # delete then resurrect
            (1, 30, "U", "x"),
            (1, 30, "D", "_"),    # same-ts tie: D beats U
        ],
        "id long, ts long, op string, v string",
    )
    got = {
        r["id"]: (r["v"], r["version_ts"])
        for r in cdc_apply(base, changes, "id", ["v"]).collect()
    }
    assert got == {2: ("b2", 10), 3: ("c2", 20), 5: ("e", 10)}


def test_cdc_apply_random_differential(spark):
    from geo_spark.operators.cdc import cdc_apply

    rng = np.random.default_rng(9)
    base = {int(k): f"p{k}" for k in range(40)}
    seen = set()
    changes = []
    for _ in range(200):
        k = int(rng.integers(0, 60))
        ts = int(rng.integers(1, 50))
        op = "D" if rng.random() < 0.3 else "U"
        if (k, ts, op) in seen:
            continue
        seen.add((k, ts, op))
        changes.append((k, ts, op, f"v{k}_{ts}"))
    bdf = spark.createDataFrame(list(base.items()), "id long, v string")
    cdf = spark.createDataFrame(changes, "id long, ts long, op string, v string")
    got = {
        r["id"]: (r["v"], r["version_ts"])
        for r in cdc_apply(bdf, cdf, "id", ["v"]).collect()
    }
    assert got == _brute_apply(base, changes)


def test_cdc_apply_single_aggregate_plan(spark):
    from geo_spark.operators.cdc import cdc_apply

    base = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, 5, "U", "b")], "id long, ts long, op string, v string"
    )
    plan = (
        cdc_apply(base, changes, "id", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # struct-max aggregate, not row_number
    assert "CartesianProduct" not in plan
