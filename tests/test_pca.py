"""Quantized power iteration: the Spark operator must equal a pure
python replay of the integer spec bit-for-bit, and the resulting
direction must align with numpy's true top principal component on
anisotropic data."""

from __future__ import annotations

import numpy as np

from geo_spark.operators.pca import QSCALE, VSCALE, _rescale, pca_projections


def _python_spec(X, iterations=2):
    n, dim = X.shape
    q = np.floor((X + 1.0) * QSCALE).astype(object)  # python ints
    q = [[int(q[i][d]) for d in range(dim)] for i in range(n)]
    m = [sum(q[i][d] for i in range(n)) // n for d in range(dim)]
    c = [[q[i][d] - m[d] for d in range(dim)] for i in range(n)]
    v = [VSCALE] * dim
    for _ in range(iterations):
        dots = [sum(c[i][d] * v[d] for d in range(dim)) for i in range(n)]
        w = [sum(c[i][d] * dots[i] for i in range(n)) for d in range(dim)]
        v = _rescale(w)
    return {
        i: sum(c[i][d] * v[d] for d in range(dim)) for i in range(n)
    }, v


def _aniso(n=300, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    t = rng.normal(size=(n, 1)) * 0.5
    noise = rng.normal(size=(n, dim)) * 0.02
    return np.clip(t * direction + noise, -0.999, 0.999), direction


def test_pca_matches_python_spec(spark):
    X, _ = _aniso()
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the spec quantizes the FLOAT32 values the operator sees
    X32 = np.array([np.array(r[1], dtype=np.float32) for r in rows], dtype=np.float64)
    want, _ = _python_spec(X32)
    got = {
        r["vec_id"]: r["proj"]
        for r in pca_projections(df, dim=X.shape[1]).collect()
    }
    assert got == want


def test_pca_direction_aligns_with_numpy(spark):
    X, direction = _aniso(seed=11)
    _, v = _python_spec(X)
    v = np.array(v, dtype=np.float64)
    cos = abs(v @ direction) / np.linalg.norm(v)
    assert cos > 0.99


def _python_spec2(X, iterations=2):
    """Pure-python replay of the top-2 deflation spec (exact ints)."""
    n, dim = X.shape
    q = np.floor((X + 1.0) * QSCALE).astype(object)
    q = [[int(q[i][d]) for d in range(dim)] for i in range(n)]
    m = [sum(q[i][d] for i in range(n)) // n for d in range(dim)]
    c = [[q[i][d] - m[d] for d in range(dim)] for i in range(n)]

    def power(cm):
        v = [VSCALE] * dim
        for _ in range(iterations):
            dots = [sum(cm[i][d] * v[d] for d in range(dim)) for i in range(n)]
            w = [sum(cm[i][d] * dots[i] for i in range(n)) for d in range(dim)]
            v = _rescale(w)
        return v

    v1 = power(c)
    v2sq = sum(x * x for x in v1)
    p1 = [sum(c[i][d] * v1[d] for d in range(dim)) for i in range(n)]
    c2 = []
    for i in range(n):
        row = []
        for d in range(dim):
            num = p1[i] * v1[d]
            quot = abs(num) // v2sq
            row.append(c[i][d] - (quot if num >= 0 else -quot))
        c2.append(row)
    u = power(c2)
    p2 = [sum(c2[i][d] * u[d] for d in range(dim)) for i in range(n)]
    return {i: (p1[i], p2[i]) for i in range(n)}, v1, u, c2


def _two_dir(n=300, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    d1 = rng.normal(size=dim)
    d1 /= np.linalg.norm(d1)
    d2 = rng.normal(size=dim)
    d2 -= (d2 @ d1) * d1
    d2 /= np.linalg.norm(d2)
    t1 = rng.normal(size=(n, 1)) * 0.5
    t2 = rng.normal(size=(n, 1)) * 0.2
    noise = rng.normal(size=(n, dim)) * 0.01
    return np.clip(t1 * d1 + t2 * d2 + noise, -0.999, 0.999), d1, d2


def test_pca2_matches_python_spec(spark):
    from geo_spark.operators.pca import pca_projections2

    X, _, _ = _two_dir()
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    X32 = np.array(
        [np.array(r[1], dtype=np.float32) for r in rows], dtype=np.float64
    )
    want, _, _, _ = _python_spec2(X32)
    got = {
        r["vec_id"]: (r["proj1"], r["proj2"])
        for r in pca_projections2(df, dim=X.shape[1]).collect()
    }
    assert got == want


def test_pca2_second_direction_sane():
    """The deflated direction must align with the true second PC and be
    near-orthogonal to the first iterate."""
    X, d1, d2 = _two_dir(seed=13)
    _, v1, u, _ = _python_spec2(X, iterations=3)
    v1 = np.array(v1, dtype=np.float64)
    u = np.array(u, dtype=np.float64)
    assert abs(u @ d2) / np.linalg.norm(u) > 0.98
    assert abs(u @ v1) / (np.linalg.norm(u) * np.linalg.norm(v1)) < 0.02
