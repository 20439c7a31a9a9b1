"""Distributed BPE training: exact python-spec replay (greedy scan ==
run-parity rule), argmax tie order, self-pair overlap handling."""

from __future__ import annotations

import numpy as np

from geo_spark.operators.text import bpe_train


def _bpe_python(texts, k):
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                words[w] += 1
    vocab = {}
    for w, c in words.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + c
    merges = []
    for step in range(1, k + 1):
        pc = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += c
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, n))
        newv = {}
        for toks, c in vocab.items():
            res = []
            i = 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(toks[i])
                    i += 1
            newv[tuple(res)] = newv.get(tuple(res), 0) + c
        vocab = newv
    return merges


def test_bpe_matches_python_spec(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide widest",
        "aaaa aaa aa aaaa aaaa",  # self-pair runs exercise the parity rule
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["merged"], r["pair_count"])
        for r in bpe_train(df, n_merges=8).orderBy("step").collect()
    ]
    assert got == _bpe_python(texts, 8)
    assert len(got) == 8


def test_bpe_random_words(spark):
    rng = np.random.default_rng(17)
    vocab = ["ab", "abc", "abcd", "xy", "xyz", "aaa", "aaaa", "bab"]
    texts = [
        " ".join(rng.choice(vocab, 20)) for _ in range(30)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["left_tok"], r["right_tok"], r["merged"], r["pair_count"])
        for r in bpe_train(df, n_merges=6).orderBy("step").collect()
    ]
    assert got == _bpe_python(texts, 6)
