"""As-of join and banded range join: randomized differentials against
pandas.merge_asof / a brute nested loop, plus pinned tie semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geo_spark.operators.asof import asof_join, range_join


def _rng(seed):
    return np.random.default_rng(seed)


def _mk(spark, pdf):
    return spark.createDataFrame(pdf)


def _random_frames(seed, n_left=400, n_right=300, n_keys=7):
    r = _rng(seed)
    left = pd.DataFrame(
        {
            "k": r.integers(0, n_keys, n_left),
            "ts": r.integers(0, 5000, n_left).astype("int64"),
            "lid": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": r.integers(0, n_keys, n_right),
            "ts": r.integers(0, 5000, n_right).astype("int64"),
            "rid": np.arange(n_right, dtype="int64"),
            "val": r.integers(0, 1000, n_right).astype("int64"),
        }
    )
    # merge_asof requires unique-ish ordering; dedup right on (k, ts)
    # keeping max rid — the operator's documented tiebreak.
    right = (
        right.sort_values(["k", "ts", "rid"])
        .groupby(["k", "ts"], as_index=False)
        .last()
    )
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lo = left.sort_values("ts", kind="mergesort")
    ro = right.sort_values("ts", kind="mergesort")
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = tolerance
    m = pd.merge_asof(
        lo,
        ro.rename(columns={"ts": "r_ts"}),
        left_on="ts",
        right_on="r_ts",
        by="k",
        direction=direction,
        allow_exact_matches=True,
        **kw,
    )
    return m[["lid", "r_ts", "rid", "val"]].sort_values("lid").reset_index(
        drop=True
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_differential(spark, seed, direction):
    left, right = _random_frames(seed)
    got = (
        asof_join(
            _mk(spark, left),
            _mk(spark, right),
            keys=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid", "val"],
            direction=direction,
            right_tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _pandas_asof(left, right, direction)
    for c in ("r_ts", "rid", "val"):
        g = got[{"r_ts": "r_ts", "rid": "r_rid", "val": "r_val"}[c]]
        e = exp[c]
        assert (
            g.fillna(-1).astype("int64") == e.fillna(-1).astype("int64")
        ).all(), f"{direction} seed={seed} col={c}"


def test_asof_tolerance(spark):
    left, right = _random_frames(9)
    got = (
        asof_join(
            _mk(spark, left),
            _mk(spark, right),
            keys=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            direction="backward",
            tolerance=50,
            right_tiebreak="rid",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = _pandas_asof(left, right, "backward", tolerance=50)
    assert (
        got["r_rid"].fillna(-1).astype("int64")
        == exp["rid"].fillna(-1).astype("int64")
    ).all()


def test_asof_exact_tie_inclusive_and_tiebreak(spark):
    left = pd.DataFrame({"k": [1, 1], "ts": [100, 99], "lid": [0, 1]})
    # two right rows tied at ts=100: greatest tiebreak (rid=7) must win
    right = pd.DataFrame(
        {"k": [1, 1, 1], "ts": [100, 100, 50], "rid": [3, 7, 1]}
    )
    got = (
        asof_join(
            _mk(spark, left),
            _mk(spark, right),
            keys=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            right_tiebreak="rid",
        )
        .toPandas()
        .set_index("lid")
    )
    assert got.loc[0, "r_rid"] == 7  # inclusive at equal ts, max tiebreak
    assert got.loc[1, "r_rid"] == 1
    # forward: least tied right row wins
    gotf = (
        asof_join(
            _mk(spark, left),
            _mk(spark, right),
            keys=["k"],
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            direction="forward",
            right_tiebreak="rid",
        )
        .toPandas()
        .set_index("lid")
    )
    assert gotf.loc[0, "r_rid"] == 3
    assert gotf.loc[1, "r_rid"] == 3


def test_asof_unmatched_left_survives(spark):
    left = pd.DataFrame({"k": [5], "ts": [10], "lid": [0]})
    right = pd.DataFrame({"k": [5], "ts": [20], "rid": [1]})
    got = asof_join(
        _mk(spark, left),
        _mk(spark, right),
        keys=["k"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["rid"],
    ).toPandas()
    assert len(got) == 1 and pd.isna(got.loc[0, "r_rid"])


def test_asof_single_shuffle_plan(spark):
    left, right = _random_frames(4)
    df = asof_join(
        _mk(spark, left),
        _mk(spark, right),
        keys=["k"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["rid"],
        right_tiebreak="rid",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


@pytest.mark.parametrize("seed,band", [(11, 16), (12, 100), (13, 1)])
def test_range_join_differential(spark, seed, band):
    r = _rng(seed)
    pts = pd.DataFrame(
        {
            "p": r.integers(-200, 1200, 500).astype("int64"),
            "pid": np.arange(500, dtype="int64"),
        }
    )
    lo = r.integers(-250, 1100, 60).astype("int64")
    w = r.integers(0, 180, 60).astype("int64")
    iv = pd.DataFrame(
        {"lo": lo, "hi": lo + w, "iid": np.arange(60, dtype="int64")}
    )
    got = (
        range_join(_mk(spark, pts), _mk(spark, iv), "p", "lo", "hi", band)
        .select("pid", "iid")
        .toPandas()
    )
    got_set = set(map(tuple, got.values.tolist()))
    exp = {
        (int(p.pid), int(i.iid))
        for p in pts.itertuples()
        for i in iv.itertuples()
        if i.lo <= p.p <= i.hi
    }
    assert got_set == exp


def test_range_join_left_outer(spark):
    pts = pd.DataFrame({"p": [5, 500], "pid": [0, 1]})
    iv = pd.DataFrame({"lo": [0], "hi": [10], "iid": [0]})
    got = (
        range_join(_mk(spark, pts), _mk(spark, iv), "p", "lo", "hi", 8, "left")
        .select("pid", "iid")
        .toPandas()
        .sort_values("pid")
    )
    assert len(got) == 2 and pd.isna(got.iloc[1]["iid"])
