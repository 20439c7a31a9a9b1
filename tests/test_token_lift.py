"""token_lift: exact differential against a pure-python replay of the
fixed-point lift spec (division order included)."""

from __future__ import annotations

from collections import Counter

import numpy as np

from geo_spark.operators.text import token_lift

VOCAB = ["the", "quick", "brown", "fox", "data", "spark", "join", "x"]


def _spec(texts, min_count, k):
    uni = Counter()
    big = Counter()
    for t in texts:
        toks = t.lower().split(" ")
        for a in toks:
            if a:
                uni[a] += 1
        for a, b in zip(toks, toks[1:]):
            if a and b:
                big[(a, b)] += 1
    n_uni = sum(uni.values())
    n_big = sum(big.values())
    rows = []
    for (a, b), c_ab in big.items():
        if c_ab < min_count:
            continue
        lift = (
            ((c_ab * n_uni) // uni[a]) * 1_000_000 // uni[b]
        ) * n_uni // n_big
        rows.append((a, b, c_ab, uni[a], uni[b], lift))
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    return rows[:k]


def test_token_lift_matches_spec(spark):
    rng = np.random.default_rng(23)
    texts = []
    for i in range(120):
        words = list(rng.choice(VOCAB, rng.integers(5, 40)))
        if i % 3 == 0:
            words += ["quick", "brown"]  # a planted collocation
        texts.append(" ".join(words))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["a"], r["b"], r["c_ab"], r["c_a"], r["c_b"], r["lift_ppm"])
        for r in token_lift(df, min_count=3, k=15).collect()
    ]
    assert got == _spec(texts, 3, 15)
    # the planted bigram must outrank the random ones
    assert got[0][:2] == ("quick", "brown")


def test_token_lift_empty_token_handling(spark):
    df = spark.createDataFrame(
        [(0, "a  b a  b a  b a  b a  b")], "doc_id long, text string"
    )
    rows = token_lift(df, min_count=1, k=10).collect()
    # double spaces break adjacency: no (a, b) bigram exists
    assert all((r["a"], r["b"]) != ("a", "b") for r in rows)
