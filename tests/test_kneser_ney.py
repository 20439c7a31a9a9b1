"""Kneser-Ney bigram NLL: hand-computed rational check plus the
continuation-count property that separates it from Laplace."""

import math

from geo_spark.operators.text import bigram_nll, kneser_ney_nll


def _kn_expected(docs: list[str]) -> dict[int, tuple[int, int]]:
    """doc -> (n_bigrams, nll_x1e6) via the documented rational."""
    bg: dict = {}
    for t in docs:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    cp: dict = {}
    fwd: dict = {}
    bwd: dict = {}
    for (a, b), c in bg.items():
        cp[a] = cp.get(a, 0) + c
        fwd[a] = fwd.get(a, 0) + 1
        bwd[b] = bwd.get(b, 0) + 1
    nb = len(bg)
    lp = {
        (a, b): math.floor(
            math.log(
                float(max(4 * c - 3, 0) * nb + 3 * fwd[a] * bwd[b])
                / float(4 * cp[a] * nb)
            )
            * 1e6
        )
        for (a, b), c in bg.items()
    }
    out = {}
    for i, t in enumerate(docs):
        ws = t.split()
        prs = list(zip(ws, ws[1:]))
        if prs:
            out[i] = (len(prs), -sum(lp[p] for p in prs))
    return out


def test_kn_matches_hand_rational(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "san francisco san francisco san francisco",
        "the",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_x1e6"])
        for r in kneser_ney_nll(df).collect()
    }
    assert got == _kn_expected(texts)  # doc 3 (<2 tokens) emits no row


def test_kn_continuation_counts_beat_raw_frequency(spark):
    """The Kneser-Ney signature: in a NOVEL context ('zzz _'), the
    frequent-but-frozen word ('francisco', 9 occurrences, ONE distinct
    predecessor) must score WORSE than the rarer free word ('cat', 5
    occurrences, FIVE distinct predecessors), because the backoff term
    uses continuation counts.  Laplace cannot tell them apart: both
    probe bigrams have c = 1 and share cp, so their NLLs are equal."""
    corpus = ["san francisco"] * 8 + [
        "the cat",
        "a cat",
        "my cat",
        "one cat",
    ]
    probe_frozen = "zzz francisco"
    probe_free = "zzz cat"
    texts = corpus + [probe_frozen, probe_free]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    i_frozen, i_free = len(texts) - 2, len(texts) - 1

    kn = {r["doc_id"]: r["nll_x1e6"] for r in kneser_ney_nll(df).collect()}
    lap = {r["doc_id"]: r["nll_x1e6"] for r in bigram_nll(df).collect()}
    assert kn[i_frozen] > kn[i_free]  # continuation counts discriminate
    assert lap[i_frozen] == lap[i_free]  # raw-count smoothing cannot


def test_pmi_collocations_surface_frozen_phrase(spark):
    from geo_spark.operators.text import pmi_collocations

    corpus = ["san francisco is big"] * 6 + [
        "the cat is small",
        "a dog is big",
        "the dog is small",
        "a cat is big",
        "rare gem",  # c = 1 < min_count: excluded despite perfect PMI
    ]
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = pmi_collocations(df, k=3, min_count=5).collect()
    assert (got[0]["p"], got[0]["w"]) == ("san", "francisco")
    assert all((r["p"], r["w"]) != ("rare", "gem") for r in got)
    pmis = [r["pmi_x1e6"] for r in got]
    assert pmis == sorted(pmis, reverse=True)
