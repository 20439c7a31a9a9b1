"""Quantized classifier training: exact agreement with a pure-Python
replay of the integer GD recurrence, separable-data convergence, the
truncating-division discipline, and the offset-budget guard."""

import pytest

from geo_spark.operators.logreg import (
    H,
    HALF,
    _trunc_div,
    logreg_train_quantized,
)


def _py_train(rows, d, iters, lr_den, shift):
    K = 1 << 32
    C = K << shift
    w = [0] * d
    n = len(rows)
    for _ in range(iters):
        g = [0] * d
        for y, x in rows:
            z = sum(wi * xi for wi, xi in zip(w, x))
            p = max(0, min(H, HALF + (z + C) // (1 << shift) - K))
            e = p - y * H
            for j in range(d):
                g[j] += e * x[j]
        w = [wi - _trunc_div(gi, n * lr_den) for wi, gi in zip(w, g)]
    ok = sum(
        (1 if sum(wi * xi for wi, xi in zip(w, x)) >= 0 else 0) == y
        for y, x in rows
    )
    return w, ok


def _fixture_rows():
    # separable: y = 1 iff 2*a - b + 40 > 0, deterministic LCG features
    rows = []
    s = 1
    for _ in range(300):
        s = (s * 1103515245 + 12345) % (1 << 31)
        a = s % 201 - 100
        s = (s * 1103515245 + 12345) % (1 << 31)
        b = s % 201 - 100
        y = 1 if 2 * a - b + 40 > 0 else 0
        rows.append((y, (a, b, 100)))
    return rows


def test_trunc_div_sql_semantics():
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3  # Python // gives -4; SQL gives -3
    assert _trunc_div(7, -2) == -3
    assert _trunc_div(-7, -2) == 3
    assert _trunc_div(0, 5) == 0


def test_matches_python_replay_and_converges(spark):
    rows = _fixture_rows()
    df = spark.createDataFrame(
        [(y, *x) for y, x in rows], "y long, a long, b long, c long"
    ).repartition(7)
    w, ok, n = logreg_train_quantized(
        df, ["a", "b", "c"], "y", iters=15, lr_den=50, shift=12
    )
    w_py, ok_py = _py_train(rows, 3, 15, 50, 12)
    assert w == w_py
    assert ok == ok_py
    assert n == len(rows)
    # the separable rule must actually be learned, not just replayed
    assert ok / n > 0.9
    # direction of the recovered hyperplane matches 2a - b + 0.4c
    assert w[0] > 0 and w[1] < 0


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "y long, a long").where("y > 0")
    with pytest.raises(Exception):
        logreg_train_quantized(df, ["a"], "y", iters=1)


def test_overflow_guard(spark):
    # a huge learning rate blows the weights past the offset budget
    rows = [(1, (1000,)), (0, (-1000,))] * 50
    df = spark.createDataFrame(
        [(y, x[0]) for y, x in rows], "y long, a long"
    )
    with pytest.raises(OverflowError):
        logreg_train_quantized(df, ["a"], "y", iters=40, lr_den=1, shift=1)
