

def _brute_tf_dot(texts, min_dot, max_df):
    from collections import Counter

    tfs = {i: Counter(t.lower().split()) for i, t in texts.items()}
    df = Counter()
    for c in tfs.values():
        for t in c:
            df[t] += 1
    keep = {t for t, d in df.items() if d <= max_df}
    out = {}
    ids = sorted(tfs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dot = sum(
                tfs[a][t] * tfs[b][t] for t in tfs[a] if t in keep
            )
            if dot >= min_dot:
                out[(a, b)] = dot
    return out


def test_tf_dot_pairs_differential(spark):
    import numpy as np

    from geo_spark.operators.text import tf_dot_pairs

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab, rng.integers(3, 25)))
        for i in range(40)
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["dot"]
        for r in tf_dot_pairs(df, min_dot=3, max_df=20).collect()
    }
    assert got == _brute_tf_dot(texts, 3, 20)


def test_tf_dot_stop_term_valve(spark):
    from geo_spark.operators.text import tf_dot_pairs

    # 'the' appears in all 5 docs -> dropped at max_df=4; the pair
    # evidence must come only from the rare shared term
    texts = {
        0: "the the cat",
        1: "the cat cat",
        2: "the dog",
        3: "the bird",
        4: "the fish",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["dot"]
        for r in tf_dot_pairs(df, min_dot=1, max_df=4).collect()
    }
    assert got == {(0, 1): 2}  # tf_0(cat)=1 * tf_1(cat)=2
