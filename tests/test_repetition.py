"""Pinned semantics for the Gopher-style repetition signals: tiny
hand-computed documents where every fraction is known exactly."""

from geo_spark.operators.text import repetition_signals


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_signals(df, key="doc_id").orderBy("doc_id").collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_duplicate_line_excess(spark):
    # doc 1: lines [ab, ab, xyz] -> excess = (2-1)*2 = 2, total = 2+2+3 = 7
    got = _run(spark, [(1, "ab\nab\nxyz")])
    r = got[1]
    assert r["n_lines"] == 3
    assert r["dup_line_frac_x1e6"] == (2 * 1_000_000) // 7
    # tokens: split on [ \n] -> [ab, ab, xyz]
    assert r["n_tokens"] == 3


def test_top_2gram_claim_and_tie_break(spark):
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y]
    # counts: "x y" 3, "y x" 2 -> top = "x y" (len 3), chars = 3*3 = 9 of 11
    got = _run(spark, [(1, "x y x y x y")])
    assert got[1]["top_2gram_frac_x1e6"] == (9 * 1_000_000) // 11
    # tie: "a b a b" (2-grams: a b, b a, a b -> a b wins on count);
    # "c d d c" -> counts all 1, tie breaks to lexicographically least "c d"
    got = _run(spark, [(2, "c d d c")])
    assert got[2]["top_2gram_frac_x1e6"] == (1 * 3 * 1_000_000) // 7


def test_dup_5gram_interval_union_coverage(spark):
    # 12 tokens: the 5-gram "a b c d e" occurs at positions 0 and 6;
    # coverage = tokens 0-4 and 6-10 = 10 of 12 (position 5 and 11 not
    # covered) -> exact union, not 2*5/12 overcount (same here), but
    # with an overlapping repeat "a a a a a a" (6 tokens) the union is
    # ALL 6 positions, not 10.
    got = _run(spark, [(1, "a b c d e f a b c d e g")])
    assert got[1]["dup_5gram_token_frac_x1e6"] == (10 * 1_000_000) // 12
    got = _run(spark, [(2, "a a a a a a")])
    assert got[2]["dup_5gram_token_frac_x1e6"] == 1_000_000


def test_short_docs_zero_signals(spark):
    got = _run(spark, [(1, "only"), (2, "two words")])
    assert got[1]["top_2gram_frac_x1e6"] == 0  # no 2-grams
    assert got[1]["dup_5gram_token_frac_x1e6"] == 0
    # one 2-gram "two words" occurring once: claim = 9/9 chars
    assert got[2]["top_2gram_frac_x1e6"] == 1_000_000
    assert got[2]["dup_5gram_token_frac_x1e6"] == 0
