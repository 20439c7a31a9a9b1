"""TF-IDF top-k keywords: hand-computed fixture + tie-break pin."""

import math

from geo_spark.operators.text import tfidf_topk


def test_tfidf_hand_computed(spark):
    # 4 docs; "rare" appears only in doc 0 (df=1), "common" in all (df=4
    # -> idf = ln(1) = 0, never a keyword despite high tf)
    rows = [
        (0, "rare common common common"),
        (1, "common mid"),
        (2, "common mid"),
        (3, "common solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"])
        for r in tfidf_topk(df, k=2).collect()
    }
    # doc 0: rare scores ln(4) > common scores 3*ln(1)=0
    assert got[(0, 1)] == ("rare", 1, 1)
    assert got[(0, 2)] == ("common", 3, 4)
    # doc 3: solo (df=1, ln 4) beats common (0)
    assert got[(3, 1)] == ("solo", 1, 1)
    # docs 1/2: mid df=2 -> ln(2) > 0
    assert got[(1, 1)] == ("mid", 1, 2)


def test_tfidf_tie_breaks_lexicographic(spark):
    # two terms with identical (tf, df) in the same doc -> equal scores;
    # rank order must be term-ascending
    rows = [(0, "zeta alpha"), (1, "zeta alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["rank"]): r["term"] for r in tfidf_topk(df, k=2).collect()
    }
    assert got[(0, 1)] == "alpha" and got[(0, 2)] == "zeta"


def test_tfidf_scores_match_numpy(spark):
    rows = [(i, f"w{i % 3} shared w{(i + 1) % 3}") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_topk(df, k=1).collect()
    # every doc's top keyword must have idf > 0 (i.e. df < N)
    for r in out:
        assert r["df"] < 9
        assert math.log(9 / r["df"]) > 0


def test_inverted_index_gap_encoding(spark):
    from geo_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [
            (3, "the cat sat"),
            (10, "THE dog"),
            (25, "cat naps the"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in inverted_index(docs).collect()
    }
    assert got["the"] == (3, "3,7,15")  # 3, 10, 25 gap-encoded
    assert got["cat"] == (2, "3,22")
    assert got["dog"] == (1, "10")
    assert got["sat"] == (1, "3")
    assert got["naps"] == (1, "25")


def test_inverted_index_min_df_and_dups(spark):
    from geo_spark.operators.text import inverted_index

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a  b"), (4, "b")],
        "doc_id long, text string",
    )
    got = {
        r["term"]: r["postings"]
        for r in inverted_index(docs, min_df=2).collect()
    }
    # duplicate in-doc terms collapse; empty split tokens dropped
    assert got == {"a": "1,1", "b": "1,1,2"}
