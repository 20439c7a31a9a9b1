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


def _nb_python(rows):
    """Exact integer replay of the nb_classify spec."""
    import math
    from collections import Counter, defaultdict

    cw = Counter()
    nd = Counter()
    vocab = set()
    doc_words = {}
    for did, y, t in rows:
        ws = [w for w in t.lower().split(" ") if w]
        doc_words[did] = ws
        nd[y] += 1
        for w in ws:
            cw[(y, w)] += 1
            vocab.add(w)
    v = len(vocab)
    tot = Counter()
    for (y, w), c in cw.items():
        tot[y] += c
    ndall = sum(nd.values())
    priors = {
        y: math.floor(math.log(n / ndall) * 1e6) for y, n in nd.items()
    }
    lp = {
        (y, w): math.floor(math.log((c + 1) / (tot[y] + v)) * 1e6)
        for (y, w), c in cw.items()
    }
    lp0 = {
        y: math.floor(math.log(1.0 / (t + v)) * 1e6) for y, t in tot.items()
    }
    out = {}
    for did, ws in doc_words.items():
        scores = {}
        for y in nd:
            s = priors[y]
            for w in ws:
                s += lp.get((y, w), lp0[y])
            scores[y] = s
        pred = min(scores, key=lambda y: (-scores[y], y))
        out[did] = (pred, scores[pred])
    return out


def test_nb_classify_matches_python(spark):
    from geo_spark.operators.text import nb_classify

    rows = [
        (0, "en", "the cat and the dog of the house"),
        (1, "en", "the quick fox and the hen"),
        (2, "de", "der hund und die katze der stadt"),
        (3, "de", "die maus und der fuchs"),
        (4, "en", "a dog and a cat"),
        (5, "de", "und der und die und das"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["pred"], r["score_x1e6"])
        for r in nb_classify(df).collect()
    }
    assert got == _nb_python(rows)
    # self-classification recovers the training labels on this corpus
    assert all(got[d][0] == y for d, y, _ in rows)
