

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


def test_compression_ratio_python_replay(spark):
    import zlib

    from geo_spark.operators.text import compression_ratio

    texts = {
        0: "spam spam spam " * 50,          # compresses very well
        1: "the quick brown fox jumps",     # normal prose
        2: "",                               # empty
        3: "abcdefghij" * 3 + "XYZ",        # mild redundancy
        4: "éèê unicode bytes " * 4,
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["raw_len"], r["zlib_len"], r["ratio_x1000"])
        for r in compression_ratio(df).collect()
    }
    for i, t in texts.items():
        data = t.encode("utf-8")
        c = len(zlib.compress(data, 6))
        want = (
            len(data),
            c,
            1000 * c // len(data) if data else 0,
        )
        assert got[i] == want, i
    # the spam doc compresses far better than prose
    assert got[0][2] < got[1][2]


def test_blocklist_hits(spark):
    from geo_spark.operators.text import blocklist_hits

    docs = spark.createDataFrame(
        [
            (0, "Spam and EGGS and spam"),
            (1, "perfectly clean text"),
            (2, "eggs eggs eggs"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    terms = spark.createDataFrame(
        [("SPAM",), ("eggs",), ("unused",)], "term string"
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["n_terms"], r["first_term"])
        for r in blocklist_hits(docs, terms).collect()
    }
    assert got == {0: (3, 2, "eggs"), 2: (3, 1, "eggs")}


def test_blocklist_broadcast_plan(spark):
    from geo_spark.operators.text import blocklist_hits

    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(100)], "doc_id long, text string"
    )
    terms = spark.createDataFrame([("common",)], "term string")
    plan = (
        blocklist_hits(docs, terms)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
