"""Mixture sampling: determinism, prefilter equivalence, budget walk."""

from __future__ import annotations

from pyspark.sql import functions as F

from geo_spark.operators.sampling import stratified_sample, token_budget_sample

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_prefilter_matches_exact(spark):
    docs = _docs(spark)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    exact = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", 10).select("doc_id").collect()
    }
    fast = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", 10, prefilter_counts=counts)
        .select("doc_id")
        .collect()
    }
    assert exact == fast
    per_lang = (
        stratified_sample(docs, "lang", 10)
        .groupBy("lang")
        .count()
        .collect()
    )
    assert all(r["count"] <= 10 for r in per_lang)


def test_sample_invariant_to_partitioning(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", 7).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13), "lang", 7).collect()
    }
    assert a == b


def test_token_budget_walk(spark):
    from geo_spark.operators.text import with_quality

    docs = with_quality(_docs(spark))
    out = token_budget_sample(docs, "lang", 500).collect()
    assert out, "budget should admit at least one doc per stratum"
    # every kept doc fits, and the walk is the md5-order prefix
    by_lang = {}
    for r in out:
        assert r["cum_tokens"] <= 500
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["cum_tokens"])
        # cumulative totals strictly increase along the prefix
        cums = [r["cum_tokens"] for r in rows]
        assert cums == sorted(set(cums))


def test_pack_sequences_stream_contract(spark):
    from geo_spark.operators.text import with_quality
    from geo_spark.operators.sampling import pack_sequences

    docs = with_quality(_docs(spark))
    out = pack_sequences(docs, 512, "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["start_tok"])
        # spans tile the stream with no gaps or overlaps
        pos = 0
        for r in rows:
            assert r["start_tok"] == pos
            assert r["end_tok"] == pos + r["n_tokens"]
            assert r["start_bin"] == r["start_tok"] // 512
            assert r["end_bin"] == (r["end_tok"] - 1) // 512
            pos = r["end_tok"]


def test_token_budget_bucketed_equals_naive(spark):
    # The bucketed prefix-sum decomposition must reproduce the naive
    # single-window walk row-for-row, including cum_tokens values.
    # bucket_hex=1 on 400 docs spreads rows over 16 buckets, so fully
    # kept, boundary, and fully-pruned buckets all occur.
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from geo_spark.operators.sampling import _order_cols, token_budget_sample

    rng = np.random.default_rng(7)
    rows = [
        (int(i), ["en", "fr", "de"][i % 3], int(rng.integers(0, 40)))
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    w = (
        Window.partitionBy("lang")
        .orderBy(*_order_cols("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for budget in (0, 37, 500, 10**6):
        naive = {
            (r["doc_id"], r["cum_tokens"])
            for r in docs.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .where(F.col("cum_tokens") <= budget)
            .collect()
        }
        got = {
            (r["doc_id"], r["cum_tokens"])
            for r in token_budget_sample(
                docs, "lang", budget, bucket_hex=1
            ).collect()
        }
        assert got == naive, budget


def test_rank_fusion(spark):
    from geo_spark.operators.sampling import rank_fusion

    rows = [
        (0, 100, 5.0),   # long, bad score
        (1, 100, 1.0),   # long, best score
        (2, 10, 1.0),    # short, best score
        (3, 50, 3.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, length long, nll double")
    got = {
        r["doc_id"]: (r["fused"], r["rank_length"], r["rank_nll"])
        for r in rank_fusion(
            df, {"length": True, "nll": False}
        ).collect()
    }
    # dense ranks: length 100->1 (tie), 50->2, 10->3; nll 1.0->1 (tie),
    # 3.0->2, 5.0->3
    assert got == {
        0: (4, 1, 3),
        1: (2, 1, 1),
        2: (4, 3, 1),
        3: (4, 2, 2),
    }


def test_stratified_rank_fusion(spark):
    from geo_spark.operators.sampling import (
        rank_fusion,
        stratified_rank_fusion,
    )

    rows = [
        # stratum 'a': lengths 100, 10; nll 5.0, 1.0
        (0, "a", 100, 5.0),
        (1, "a", 10, 1.0),
        # stratum 'b': lengths 60, 60, 20 (tie); nll 2.0, 4.0, 2.0
        (2, "b", 60, 2.0),
        (3, "b", 60, 4.0),
        (4, "b", 20, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, src string, length long, nll double"
    )
    got = {
        r["doc_id"]: (r["src"], r["fused"], r["rank_length"], r["rank_nll"])
        for r in stratified_rank_fusion(
            df, {"length": True, "nll": False}, stratum_col="src"
        ).collect()
    }
    # ranks never cross strata: doc 4 (length 20) ranks 2 in 'b', not 3
    # globally; doc 1 (length 10) ranks 2 in 'a'
    assert got == {
        0: ("a", 3, 1, 2),
        1: ("a", 3, 2, 1),
        2: ("b", 2, 1, 1),
        3: ("b", 3, 1, 2),
        4: ("b", 3, 2, 1),
    }

    # single-stratum degeneration: equals the global operator
    one = df.withColumn("src", df.src.substr(0, 0))  # all-empty stratum
    glob = {
        r["doc_id"]: (r["fused"], r["rank_length"], r["rank_nll"])
        for r in rank_fusion(df, {"length": True, "nll": False}).collect()
    }
    strat = {
        r["doc_id"]: (r["fused"], r["rank_length"], r["rank_nll"])
        for r in stratified_rank_fusion(
            one, {"length": True, "nll": False}, stratum_col="src"
        ).collect()
    }
    assert strat == glob
