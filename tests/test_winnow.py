"""Winnowing fingerprints: pure-python spec differential + the
shared-substring guarantee."""

from __future__ import annotations

import hashlib

import numpy as np

from geo_spark.operators.dedup import winnow_fingerprints, winnow_pairs

K, W = 8, 4


def _spec_fps(text):
    hs = [
        hashlib.md5(text[i : i + K].encode()).hexdigest()
        for i in range(len(text) - K + 1)
    ]
    return {min(hs[i : i + W]) for i in range(len(hs) - W + 1)}


def test_winnow_matches_spec(spark):
    rng = np.random.default_rng(13)
    alpha = "abcdefg "
    texts = [
        "".join(rng.choice(list(alpha), rng.integers(12, 120)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in winnow_fingerprints(df, K, W).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        if len(t) >= K + W - 1:
            assert got[i] == _spec_fps(t), i
        else:
            assert i not in got or got[i] == _spec_fps(t)


def test_winnow_guarantee_and_pairs(spark):
    shared = "the quick brown fox jumps"  # len 25 >= K + W - 1
    docs = [
        (0, "aaaa " + shared + " bbbb"),
        (1, "cccc " + shared + " dddd"),
        (2, "entirely unrelated content here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_pairs(df, min_shared=1, kgram=K, window=W).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_winnow_max_df_drops_boilerplate(spark):
    boiler = "copyright footer boilerplate line"
    docs = [(i, f"unique{i:03d} " + boiler) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with_filter = winnow_pairs(
        df, min_shared=1, kgram=K, window=W, max_df=5
    ).count()
    without = winnow_pairs(df, min_shared=1, kgram=K, window=W).count()
    assert without == 45  # all pairs share the boilerplate
    assert with_filter == 0  # stop-gram filter kills the hot key


def test_fuzzy_pairs_matches_brute(spark):
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = min(
                    d[j] + 1,
                    d[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev, d[j] = d[j], cur
        return d[n]

    rng = np.random.default_rng(41)
    base = "the quick brown fox jump"
    strs = []
    for i in range(30):
        s = list(base)
        for _ in range(rng.integers(0, 6)):
            p = rng.integers(0, len(s))
            s[p] = chr(ord("a") + rng.integers(0, 26))
        strs.append("".join(s))
    from geo_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strs)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, max_dist=3, q=4).collect()
    }
    want = {
        (i, j): lev(strs[i], strs[j])
        for i, j in itertools.combinations(range(30), 2)
        if lev(strs[i], strs[j]) <= 3
    }
    assert got == want
