"""Deterministic quantized k-means: exact differential against a
pure-python replay of the spec (init, argmin ties, integer centroid
means, empty-cluster drop)."""

from __future__ import annotations

import hashlib

import numpy as np

from geo_spark.operators.kmeans import kmeans_embed


def _spec(ids, vecs, kc, iters, shift, scale):
    q = np.floor((vecs + shift) * scale).astype(np.int64)
    md5s = {i: hashlib.md5(str(i).encode()).hexdigest() for i in ids}
    order = sorted(range(len(ids)), key=lambda j: (md5s[ids[j]], ids[j]))
    cent = {c: q[order[c]].copy() for c in range(kc)}
    asg = {}
    for t in range(iters):
        cids = sorted(cent)
        asg = {
            ids[j]: min(
                (int(((q[j] - cent[c]) ** 2).sum()), c) for c in cids
            )
            for j in range(len(ids))
        }
        if t < iters - 1:
            cent = {}
            for c in cids:
                mem = [j for j in range(len(ids)) if asg[ids[j]][1] == c]
                if mem:
                    cent[c] = q[mem].sum(axis=0) // len(mem)
    return asg  # id -> (dist, cidx)


def test_kmeans_matches_spec(spark):
    rng = np.random.default_rng(5)
    n, dim, kc, iters = 80, 8, 4, 3
    ids = list(range(1000, 1000 + n))
    vecs = rng.uniform(-0.9, 0.9, (n, dim))
    rows = [(i, [float(x) for x in vecs[j]]) for j, i in enumerate(ids)]
    df = spark.createDataFrame(rows, "vid long, emb array<double>")
    got = {
        r["vid"]: (r["dist"], r["cidx"])
        for r in kmeans_embed(
            df, "vid", "emb", kc=kc, iters=iters
        ).collect()
    }
    exp = _spec(ids, vecs, kc, iters, 1.0, 1_000_000.0)
    assert got == exp


def test_kmeans_inertia_monotone(spark):
    """Lloyd's guarantee: total inertia never increases across
    iterations (integer-floor centroids can perturb by at most one
    quantum per dim, covered by the epsilon)."""
    rng = np.random.default_rng(9)
    blobs = [(-0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]
    rows = []
    for j in range(90):
        bx, by = blobs[j % 3]
        rows.append(
            (
                j,
                [
                    float(bx + rng.normal(0, 0.03)),
                    float(by + rng.normal(0, 0.03)),
                ],
            )
        )
    df = spark.createDataFrame(rows, "vid long, emb array<double>")
    totals = []
    for iters in (1, 2, 3, 4):
        out = kmeans_embed(df, "vid", "emb", kc=3, iters=iters).collect()
        totals.append(sum(r["dist"] for r in out))
    for a, b in zip(totals, totals[1:]):
        assert b <= a * 1.000001 + 90 * 2, totals
    assert totals[-1] < totals[0]


def test_hard_negatives_masks_own_label(spark):
    from geo_spark.operators.similarity import hard_negatives

    rng = np.random.default_rng(3)
    n, dim = 60, 6
    vecs = rng.normal(size=(n, dim))
    labels = [f"l{j % 4}" for j in range(n)]
    rows = [
        (j, [float(x) for x in vecs[j]], labels[j]) for j in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = {}
    for r in hard_negatives(df, 2).collect():
        got.setdefault(r["vec_id"], []).append((r["rank"], r["nb_id"]))
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv @ nv.T
    for j in range(n):
        s = sims[j].copy()
        s[[i for i in range(n) if labels[i] == labels[j]]] = -np.inf
        order = np.lexsort((np.arange(n), -s))[:2]
        assert [nb for _, nb in sorted(got[j])] == list(order), j
        assert all(labels[nb] != labels[j] for _, nb in got[j])
