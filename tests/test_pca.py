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
