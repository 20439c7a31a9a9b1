"""Training-data corpus operators: dedup tiers, text metrics, similarity
search — differential-tested against scalar python oracles, and the
approximate tiers (MinHash-LSH, SimHash, cosine-LSH) measured for recall
against their exact counterparts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_spark.operators.dedup import (
    _shingle_hashes,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from geo_spark.operators.similarity import cosine_topk_brute, cosine_topk_lsh
from geo_spark.operators.text import (
    token_count_bpe_ish,
    with_fingerprint,
    with_lang_guess,
    with_quality,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df.cache().count()
    return df


def _py_shingles(t, n=8):
    if len(t) < n:
        return {t}
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def test_exact_dedup(spark):
    rows = [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "ccc"), (5, "aaa")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["keep_id"], r["dup_cnt"]) for r in exact_dedup(df).collect()
    }
    assert got == {(1, 3), (2, 1), (4, 1)}


def test_ngram_jaccard_matches_python(spark, docs):
    pdf = docs.limit(60).toPandas()
    expected = set()
    sh = {int(r.doc_id): _py_shingles(r.text) for r in pdf.itertuples()}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            if j >= 0.2:
                expected.add((a, b, inter))
    sub = spark.createDataFrame(pdf[["doc_id", "text"]])
    got = {
        (r["da"], r["db"], r["shared"])
        for r in ngram_jaccard_pairs(sub, n=8, threshold=0.2).collect()
    }
    assert got == expected


def test_minhash_lsh_recall(spark, docs):
    exact = {
        (r["da"], r["db"])
        for r in ngram_jaccard_pairs(docs, n=8, threshold=0.3).collect()
    }
    approx = {
        (r["da"], r["db"])
        for r in minhash_lsh_pairs(docs, n=8, threshold=0.3).collect()
    }
    # The rerank keeps only true pairs, so approx ⊆ exact; LSH at
    # b=16,r=4 catches J>=0.3 with prob ~1-(1-0.3^4)^16 ≈ 0.12 per pair
    # at the threshold but ->1 fast for higher J; fixture dupes are
    # J ~ 0.9+, so expect full recall there.
    assert approx <= exact
    high = {
        (r["da"], r["db"])
        for r in ngram_jaccard_pairs(docs, n=8, threshold=0.7).collect()
    }
    assert high <= approx, "near-exact dupes must survive LSH"


def test_simhash_identical_and_disjoint(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "completely unrelated words about spark shuffles everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["da"], r["db"], r["hamming"]) for r in simhash_pairs(df, 3).collect()}
    assert (1, 2, 0) in got
    assert not any(d == 3 or a == 3 for a, d, _ in got)


def test_shingle_hash_deterministic():
    a = _shingle_hashes("hello world hello", 8)
    b = _shingle_hashes("hello world hello", 8)
    assert np.array_equal(a, b)
    assert len(_shingle_hashes("ab", 8)) == 1  # short-text fallback


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


def test_cosine_brute_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    ids = pdf.vec_id.to_numpy()
    m = np.array(list(pdf.embedding), dtype=np.float64)
    m = m / np.sqrt((m * m).sum(1))[:, None]
    sims = m @ m.T
    np.fill_diagonal(sims, -np.inf)
    order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)
    expected = {
        (int(ids[i]), int(ids[order[i, r]]), r + 1)
        for i in range(len(ids))
        for r in range(5)
    }
    got = {
        (r["vec_id"], r["nb_id"], r["rank"])
        for r in cosine_topk_brute(emb, emb, 5).collect()
    }
    assert got == expected


def test_cosine_lsh_recall(spark, emb):
    dim = len(emb.select("embedding").first()[0])
    brute1 = {
        (r["vec_id"], r["nb_id"])
        for r in cosine_topk_brute(emb, emb, 1).collect()
    }
    # Random fixture vectors have rank-1 cosine ~0.36 (≈69°): short band
    # signatures are the right operating point (recall/candidate-count
    # knob; measured 0.99 at 32x4 on this fixture).
    lsh = {
        (r["vec_id"], r["nb_id"])
        for r in cosine_topk_lsh(emb, 1, dim, bands=32, bits_per_band=4).collect()
    }
    recall = len(brute1 & lsh) / len(brute1)
    assert recall >= 0.9, f"rank-1 recall {recall}"


def test_text_metrics_match_python(spark):
    rows = [
        (1, "The quick brown Fox 42 jumps!"),
        (2, "  "),
        (3, "der und die der hund"),
        (4, "one-token"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in token_count_bpe_ish(
            with_fingerprint(with_lang_guess(with_quality(df)))
        ).collect()
    }
    assert out[1]["n_tokens"] == 6
    assert out[1]["n_digits"] == 2
    assert out[1]["n_upper"] == 2
    assert out[1]["n_bpe_tokens"] == 7  # The quick brown Fox 42 jumps !
    assert out[2]["n_tokens"] == 0
    assert out[3]["lang_guess"] == "de"
    assert out[1]["lang_guess"] == "und"  # "The" capitalized, no ' the '
    assert out[4]["n_bpe_tokens"] == 3  # one - token
    import hashlib, re

    norm = re.sub(r"\s+", " ", rows[0][1].lower()).strip()
    assert out[1]["fingerprint"] == hashlib.md5(norm.encode()).hexdigest()


def test_cosine_brute_guard_refuses_large_corpus(spark, emb):
    from geo_spark.operators.similarity import cosine_topk_brute as brute

    with pytest.raises(ValueError, match="exceeds"):
        brute(emb, emb, 3, max_corpus_rows=10)


def test_cosine_topk_dispatch_branches(spark, emb):
    from geo_spark.operators.similarity import cosine_topk, cosine_topk_brute

    dim = len(emb.select("embedding").first()[0])
    expected = {
        (r["vec_id"], r["nb_id"], r["rank"])
        for r in cosine_topk_brute(emb, emb, 3).collect()
    }
    # corpus fits -> exact brute results
    got = {
        (r["vec_id"], r["nb_id"], r["rank"])
        for r in cosine_topk(emb, 3, dim).collect()
    }
    assert got == expected
    # corpus "too big" -> LSH path (approximate; verify shape + high recall)
    approx = cosine_topk(
        emb, 3, dim, bands=32, bits_per_band=4, max_brute_rows=10
    ).collect()
    assert {r["rank"] for r in approx} <= {1, 2, 3}
    got1 = {(r["vec_id"], r["nb_id"]) for r in approx if r["rank"] == 1}
    exp1 = {(v, n) for v, n, rk in expected if rk == 1}
    assert len(got1 & exp1) / len(exp1) >= 0.9


def test_cosine_ivf_recall(spark, emb):
    from geo_spark.operators.similarity import cosine_topk_brute, cosine_topk_ivf

    brute1 = {
        (r["vec_id"], r["nb_id"])
        for r in cosine_topk_brute(emb, emb, 1).collect()
    }
    # the fixture is uniform-random (no cluster structure) — IVF's
    # adversarial case; half-probe still reaches ~0.89 recall here, real
    # embedding corpora (clustered) do much better at far fewer probes
    ivf = {
        (r["vec_id"], r["nb_id"])
        for r in cosine_topk_ivf(emb, 1, n_centroids=32, nprobe=16).collect()
    }
    recall = len(brute1 & ivf) / len(brute1)
    assert recall >= 0.85, f"rank-1 recall {recall}"


def test_cosine_ivf_deterministic(spark, emb):
    from geo_spark.operators.similarity import cosine_topk_ivf

    a = sorted(
        (r["vec_id"], r["nb_id"], r["rank"])
        for r in cosine_topk_ivf(emb, 2, n_centroids=16, nprobe=4).collect()
    )
    b = sorted(
        (r["vec_id"], r["nb_id"], r["rank"])
        for r in cosine_topk_ivf(emb, 2, n_centroids=16, nprobe=4).collect()
    )
    assert a == b


def test_cosine_near_dup_pairs_brute_vs_lsh(spark):
    """Planted near-dups: brute tier is exact ground truth; the sign-LSH
    tier must be a subset (rerank is exact) with high recall."""
    import numpy as np

    from geo_spark.operators.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(17)
    dim = 32
    base = rng.normal(size=(60, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for v in base:
        rows.append((vid, v.tolist()))
        vid += 1
        if vid % 3 == 0:  # plant a near-dup (cosine ~0.98)
            w = v + 0.2 * rng.normal(size=dim) / np.sqrt(dim)
            w /= np.linalg.norm(w)
            rows.append((vid, w.tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r["da"], r["db"]): r["sim"]
        for r in cosine_near_dup_pairs(df, 0.9, method="brute").collect()
    }
    assert len(brute) >= 15  # the planted pairs are found
    lsh = {
        (r["da"], r["db"]): r["sim"]
        for r in cosine_near_dup_pairs(
            df, 0.9, dim=dim, method="lsh", bands=16, bits_per_band=8
        ).collect()
    }
    # exact rerank: every LSH pair is a true pair with the same sim
    for pair, sim in lsh.items():
        assert pair in brute
        assert abs(sim - brute[pair]) < 1e-12
    # recall on strong near-dups
    assert len(lsh) >= 0.8 * len(brute)


def test_cosine_near_dup_brute_guard(spark):
    import pytest as _pytest

    from geo_spark.operators.similarity import cosine_near_dup_pairs

    df = spark.range(10).selectExpr(
        "id as vec_id", "array(cast(id as double), 1.0d) as embedding"
    )
    with _pytest.raises(ValueError, match="corpus exceeds"):
        cosine_near_dup_pairs(df, 0.5, method="brute", max_corpus_rows=5).collect()


class TestDedupClusters:
    def test_components_match_union_find(self, spark):
        from geo_spark.operators.dedup import dedup_clusters

        # two chains (forces >1 propagation round), a triangle, singletons
        pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12),
                 (20, 21), (21, 22), (20, 22)]
        docs = [(i,) for i in list(range(1, 6)) + [10, 11, 12, 20, 21, 22, 30, 31]]
        pdf = spark.createDataFrame(pairs, "da long, db long")
        ddf = spark.createDataFrame(docs, "doc_id long")
        got = {
            r["doc_id"]: r["rep"]
            for r in dedup_clusters(pdf, docs=ddf).collect()
        }

        # union-find ground truth
        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {d[0]: find(d[0]) for d in docs}
        assert got == want

    def test_long_chain_converges(self, spark):
        from geo_spark.operators.dedup import dedup_clusters

        n = 12  # path graph: worst-case diameter; pointer jumping -> O(log n)
        pdf = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "da long, db long"
        )
        got = dedup_clusters(pdf).collect()
        assert all(r["rep"] == 0 for r in got)
        assert len(got) == n + 1

    def test_self_pairs_survive_without_docs(self, spark):
        """ADVICE r4: a doc whose ONLY pair is reflexive (da == db)
        must still appear with rep = self when docs=None — the edge
        filter may drop the self-loop but not the node."""
        from geo_spark.operators.dedup import dedup_clusters

        pdf = spark.createDataFrame(
            [(7, 7), (1, 2), (2, 2)], "da long, db long"
        )
        got = {r["doc_id"]: r["rep"] for r in dedup_clusters(pdf).collect()}
        assert got == {7: 7, 1: 1, 2: 1}

    def test_retired_round_checkpoints_released(self, spark):
        """ADVICE r4: each star round's localCheckpoint must be freed
        once the next round materializes — after a multi-round run the
        persistent-RDD count stays bounded (base + final edges), not
        one per round."""
        from geo_spark.operators.dedup import dedup_clusters

        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        n = 300  # high-diameter path: several large/small-star rounds
        pdf = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "da long, db long"
        )
        got = dedup_clusters(pdf).collect()
        assert all(r["rep"] == 0 for r in got) and len(got) == n + 1
        after = jsc.getPersistentRDDs().size()
        # base + final round's edge table may remain; prior rounds must
        # not accumulate (the path graph needs >= 4 rounds)
        assert after - before <= 2, f"leaked checkpoints: {after - before}"


def test_unigram_nll_properties(spark):
    """Common words score lower than rare ones; totals consistent."""
    from geo_spark.operators.text import unigram_nll

    docs = spark.createDataFrame(
        [(1, "the the the the rare"), (2, "the the the the the")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
    assert rows[1]["n_words"] == 5 and rows[2]["n_words"] == 5
    # doc 1 contains the rare word -> strictly higher NLL
    assert rows[1]["nll_x1e6"] > rows[2]["nll_x1e6"]
    import math
    # doc 2: 5 * floor(ln(9/10)*1e6)... 'the' appears 9 of 10 words
    lp_the = math.floor(math.log(9 / 10) * 1e6)
    assert rows[2]["nll_x1e6"] == -5 * lp_the


def test_random_graphs_match_union_find(spark):
    """Three random graphs in disjoint id spaces, resolved in ONE
    operator call (components never cross the spaces)."""
    import numpy as np

    from geo_spark.operators.dedup import dedup_clusters

    rng = np.random.default_rng(23)
    pairs, ids = [], []
    for block in range(3):
        base = block * 1000
        n = int(rng.integers(8, 20))
        ids += [base + i for i in range(n)]
        for _ in range(int(rng.integers(4, 15))):
            a, b = rng.integers(0, n, 2)
            if a != b:
                pairs.append((base + int(min(a, b)), base + int(max(a, b))))
    pdf = spark.createDataFrame(pairs, "da long, db long")
    ddf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["rep"] for r in dedup_clusters(pdf, docs=ddf).collect()}

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assert got == {i: find(i) for i in ids}


def test_line_dedup_boilerplate_removal(spark):
    from geo_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nCOOKIE BANNER\nunique two"),
            (2, "COOKIE BANNER\nonly here"),
            (3, "COOKIE BANNER"),          # fully boilerplate -> empty
            (4, "twice in me\ntwice in me\nsolo line"),  # in-doc dup counts
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["text_clean"])
        for r in line_dedup(docs).collect()
    }
    assert got[1] == (3, 2, "unique one\nunique two")
    assert got[2] == (2, 1, "only here")
    assert got[3] == (1, 0, "")
    assert got[4] == (3, 1, "solo line")


def test_line_dedup_max_count_and_order(spark):
    from geo_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(1, "b\na\nb"), (2, "c\nb")],
        "doc_id long, text string",
    )
    # max_count=2: 'b' occurs 3x -> dropped; rebuild preserves line order
    got = {
        r["doc_id"]: r["text_clean"]
        for r in line_dedup(docs, max_count=2).collect()
    }
    assert got == {1: "a", 2: "c"}
    # max_count=3 keeps everything, original order intact
    got3 = {
        r["doc_id"]: r["text_clean"]
        for r in line_dedup(docs, max_count=3).collect()
    }
    assert got3 == {1: "b\na\nb", 2: "c\nb"}


def test_bm25_matches_numpy(spark):
    """bm25_scores == a straightforward numpy replay of Okapi BM25 on a
    small fixture with known tf/df structure."""
    import numpy as np

    from geo_spark.operators.text import bm25_scores

    texts = [
        "the table joins the query",
        "scan scan scan",
        "table table table query",
        "nothing relevant here",
        "a query about a table scan plan",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    terms = ["table", "query", "scan"]
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, terms).collect()}

    toks = [t.lower().split() for t in texts]
    n = len(texts)
    dl = np.array([len(t) for t in toks], dtype=float)
    avgdl = dl.mean()
    k1, b = 1.2, 0.75
    want = {}
    for i, tk in enumerate(toks):
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            if tf == 0:
                continue
            df = sum(1 for t2 in toks if term in t2)
            idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl[i] / avgdl))
        if s > 0:
            want[i] = s
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-12, i


def test_pq_recall_and_rerank(spark):
    """PQ tier: codes are m_sub bytes, the ADC scan + exact rerank
    reaches high recall@k vs the brute oracle on clustered embeddings,
    and the reranked order itself is exact-cosine order."""
    import numpy as np

    from geo_spark.operators.similarity import (
        _normalize_rows,
        cosine_topk_brute,
        cosine_topk_pq,
        pq_encode,
        train_pq,
    )

    rng = np.random.default_rng(31)
    dim, n = 32, 1200
    centers = _normalize_rows(rng.normal(size=(20, dim)))
    vecs = _normalize_rows(
        centers[rng.integers(0, 20, n)] + 0.15 * rng.normal(size=(n, dim))
    )
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(4)

    books = train_pq(df, m_sub=8, n_codes=64, sample_rows=n, iters=8)
    assert books.shape == (8, 64, 4)
    codes = pq_encode(df, books)
    row = codes.limit(1).collect()[0]
    assert len(row["codes"]) == 8  # 8 bytes per vector

    queries = df.limit(40)
    k = 10
    got = {}
    for r in cosine_topk_pq(
        queries, codes, df, books, k=k, rerank=6
    ).collect():
        got.setdefault(r["vec_id"], []).append((r["rank"], r["nb_id"]))
    want = {}
    for r in cosine_topk_brute(queries, df, k=k).collect():
        want.setdefault(r["vec_id"], []).append((r["rank"], r["nb_id"]))
    assert set(got) == set(want)
    hits = total = 0
    for q in want:
        w = {t for _, t in want[q]}
        g = {t for _, t in got[q]}
        hits += len(w & g)
        total += k
    assert hits / total >= 0.9, hits / total


def test_bigram_nll_matches_python_spec(spark):
    import math
    from collections import Counter

    from geo_spark.operators.text import bigram_nll

    texts = {
        1: "the cat sat on the mat",
        2: "the cat the cat the",
        3: "dog",  # single token: no row
        4: "  spaced   out  tokens ",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    toks = {k: [w for w in t.split(" ") if w] for k, t in texts.items()}
    prs = {
        k: list(zip(ws[:-1], ws[1:])) for k, ws in toks.items() if len(ws) > 1
    }
    bg = Counter(p for ps in prs.values() for p in ps)
    cp = Counter()
    for (p, _), c in bg.items():
        cp[p] += c
    vocab = len({w for ws in toks.values() for w in ws})
    lp = {
        pw: math.floor(math.log((c + 1) / (cp[pw[0]] + float(vocab))) * 1e6)
        for pw, c in bg.items()
    }
    want = {
        k: (len(ps), -sum(lp[p] for p in ps)) for k, ps in prs.items()
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_x1e6"])
        for r in bigram_nll(docs).collect()
    }
    assert got == want
    assert 3 not in got


def test_transition_matrix_spec(spark):
    from geo_spark.operators.sessionize import transition_matrix

    rows = [
        # user 1: a -> b -> a -> a
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "a"),
        # user 2: b -> a (cross-user pairs must NOT count)
        (2, 1, "b"), (2, 2, "a"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        (r["prev_state"], r["state"]): (r["n"], r["p_ppm"])
        for r in transition_matrix(
            ev, order_cols=("ts",)
        ).collect()
    }
    assert got == {
        ("a", "b"): (1, 500000),
        ("a", "a"): (1, 500000),
        ("b", "a"): (2, 1000000),
    }


def test_stay_points_runs_and_threshold(spark):
    from geo_spark.operators.sessionize import stay_points

    h = 3_600_000_000
    rows = [
        # user 1: tile A for 7h (stay), hop to far tile for 1h (no),
        # back to A for 8h (separate stay)
        (1, 1, 10.0, 10.0, 0 * h),
        (1, 2, 10.0, 10.0, 7 * h),
        (1, 3, -40.0, -120.0, 8 * h),
        (1, 4, 10.0, 10.0, 9 * h),
        (1, 5, 10.0, 10.0, 17 * h),
        # user 2: single event (dur 0, filtered)
        (2, 6, 10.0, 10.0, 0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, lat double, lng double, ts_us long"
    )
    got = [
        (r["user_id"], r["stay_idx"], r["n_events"], r["dur_us"])
        for r in stay_points(ev, zoom=3, min_duration_us=6 * h)
        .orderBy("user_id", "stay_idx")
        .collect()
    ]
    assert got == [(1, 1, 2, 7 * h), (1, 3, 2, 8 * h)]


def test_containment_pairs_quote_detection(spark):
    """A short doc embedded verbatim in a long one: containment(short
    in long) ~ 1 while the reverse (and Jaccard) stay low; exact values
    checked against a python shingle replay."""
    from geo_spark.operators.dedup import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = (
        "completely unrelated preamble text here and then "
        + quote
        + " followed by a very long unrelated tail that goes on and on "
        "with more and more filler words to dilute the overlap badly"
    )
    other = "nothing in common with anything else at all in this text"
    rows = [(0, quote), (1, long_doc), (2, other)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(t, n=8):
        return {t[i : i + n] for i in range(max(len(t) - n + 1, 1))}

    want = {}
    ss = {i: shingles(t) for i, t in rows}
    for a, sa in ss.items():
        for b, sb in ss.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= 0.5:
                want[(a, b)] = (len(sa & sb), len(sa), len(sb))
    got = {
        (r["src"], r["dst"]): (r["shared"], r["n_src"], r["n_dst"])
        for r in containment_pairs(df, n=8, threshold=0.5).collect()
    }
    assert got == want
    assert (0, 1) in got and (1, 0) not in got  # asymmetric by design


def test_containment_max_df_valve(spark):
    """With max_df=1, any shingle shared by 2+ docs is a stop-shingle:
    identical docs lose ALL their shingles and produce no pairs, and
    sizes shrink consistently (effective-vocabulary semantics)."""
    from geo_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(0, "abcdefghijkl"), (1, "abcdefghijkl"), (2, "zzzzyyyyxxxxw")],
        "doc_id long, text string",
    )
    assert containment_pairs(df, n=8, threshold=0.1).count() == 2
    assert containment_pairs(df, n=8, threshold=0.1, max_df=1).count() == 0


def test_prefix_jaccard_equals_exact(spark, docs):
    """Prefix filtering is LOSSLESS: output must be row-identical to
    the naive shingle self-join at the same threshold."""
    from geo_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    for th in (0.2, 0.3, 0.5):
        want = {
            (r["da"], r["db"]): (r["shared"], r["na"], r["nb"])
            for r in ngram_jaccard_pairs(docs, n=8, threshold=th).collect()
        }
        got = {
            (r["da"], r["db"]): (r["shared"], r["na"], r["nb"])
            for r in jaccard_pairs_prefix(docs, n=8, threshold=th).collect()
        }
        assert got == want, th
    assert want  # fixture produces pairs at 0.5? fall through harmless


def test_prefix_jaccard_random_texts(spark):
    from geo_spark.operators.dedup import (
        jaccard_pairs_prefix,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(67)
    vocab = ["alpha", "beta", "gamma", "delta", "epsil", "zetaa"]
    rows = []
    for i in range(40):
        base = rng.choice(vocab, 12)
        if i % 3 == 0 and rows:
            # mutated near-dup of a previous doc
            prev = rows[rng.integers(0, len(rows))][1].split(" ")
            k = rng.integers(0, len(prev))
            prev = prev[:k] + [str(rng.choice(vocab))] + prev[k + 1 :]
            rows.append((i, " ".join(prev)))
        else:
            rows.append((i, " ".join(base)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        (r["da"], r["db"]) for r in ngram_jaccard_pairs(df, n=6, threshold=0.4).collect()
    }
    got = {
        (r["da"], r["db"]) for r in jaccard_pairs_prefix(df, n=6, threshold=0.4).collect()
    }
    assert got == want
    assert want  # near-dups guarantee non-trivial pairs


def _dup_spans_python(texts, gram_len, min_count=2):
    """Exact replay: corpus gram counts -> flagged positions -> maximal
    runs."""
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for p in range(len(t) - gram_len + 1):
            grams[t[p : p + gram_len]] += 1
    out = set()
    for did, t in texts.items():
        flagged = [
            p + 1
            for p in range(len(t) - gram_len + 1)
            if grams[t[p : p + gram_len]] >= min_count
        ]
        run_start = None
        prev = None
        for p in flagged + [None]:
            if p is not None and prev is not None and p == prev + 1:
                prev = p
                continue
            if prev is not None:
                out.add(
                    (did, run_start, prev + gram_len - 1,
                     prev + gram_len - run_start)
                )
            run_start, prev = p, p
    return out


def test_dup_spans_quote_and_self_repeat(spark):
    from geo_spark.operators.dedup import dup_spans

    boiler = "SHARED BOILERPLATE SENTENCE THAT REPEATS EXACTLY!"
    texts = {
        0: "unique head aaaa " + boiler + " unique tail bbbb",
        1: "other document " + boiler + " entirely different end",
        2: "no duplication anywhere in this one at all, promise",
        3: "selfselfselfselfselfselfselfselfselfselfselfselfself",  # self-repeat
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    L = 20
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in dup_spans(df, gram_len=L).collect()
    }
    want = _dup_spans_python(texts, L)
    assert got == want
    # the boilerplate span is found in both docs 0 and 1, not in 2
    assert any(d == 0 for d, *_ in got)
    assert any(d == 1 for d, *_ in got)
    assert not any(d == 2 for d, *_ in got)
    assert any(d == 3 for d, *_ in got)  # self-repetition counts


def test_dup_spans_random_fixture(spark, docs):
    from geo_spark.operators.dedup import dup_spans

    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    L = 30
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in dup_spans(docs, gram_len=L).collect()
    }
    assert got == _dup_spans_python(texts, L)
    assert got  # word-salad corpus has real duplicated spans


def test_remove_spans_cuts_and_merges_overlaps(spark):
    from geo_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame(
        [(0, "abcdefghijklmnop"), (1, "untouched doc"), (2, "xxxxyyyy")],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        [
            (0, 3, 6), (0, 5, 9),    # overlap -> merged [3,9]
            (0, 12, 13),
            (2, 1, 8),               # whole doc removed
        ],
        "doc_id long, span_start long, span_end long",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_spans(docs, spans).collect()
    }
    assert got[0] == ("ab" + "jk" + "nop", 9)
    assert got[1] == ("untouched doc", 0)
    assert got[2] == ("", 8)


def test_dup_spans_then_remove_round_trip(spark, docs):
    """Composition: cutting the dup_spans intervals must remove every
    flagged gram position (no 30-gram in the cleaned corpus-wide
    multiset count drops below the visibility of the replay) — checked
    by python replay of the full chain."""
    from geo_spark.operators.dedup import dup_spans, remove_spans

    L = 30
    spans = dup_spans(docs, gram_len=L)
    cleaned = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_spans(docs, spans).collect()
    }
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    want_spans = _dup_spans_python(texts, L)
    for did, t in texts.items():
        ivs = sorted(
            (s, e) for d, s, e, _ in want_spans if d == did
        )
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        keep = []
        p = 1
        for s, e in merged:
            keep.append(t[p - 1 : s - 1])
            p = e + 1
        keep.append(t[p - 1 :])
        want = "".join(keep)
        assert cleaned[did] == (want, len(t) - len(want)), did


def test_semantic_dedup_planted_groups(spark):
    """SemDeDup end-to-end on planted duplicate groups: three tight
    bundles of near-identical vectors plus isolated singletons —
    every bundle collapses to its min id, singletons keep themselves,
    and the survivor set is exactly one doc per semantic group."""
    import numpy as np

    from geo_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    bundles = []
    for _ in range(3):  # 3 bundles of 4 near-dups each
        base = rng.normal(size=16)
        base /= np.linalg.norm(base)
        ids = []
        for _ in range(4):
            v = base + rng.normal(scale=1e-3, size=16)
            rows.append((vid, [float(x) for x in v]))
            ids.append(vid)
            vid += 1
        bundles.append(ids)
    singles = []
    for _ in range(6):  # isolated vectors
        v = rng.normal(size=16)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        singles.append(vid)
        vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: (r["rep"], r["keep"])
        for r in semantic_dedup(
            df, "vec_id", "embedding", threshold=0.98, kc=4, iters=2
        ).collect()
    }
    assert len(out) == len(rows)
    for ids in bundles:
        rep = min(ids)
        for i in ids:
            assert out[i] == (rep, i == rep), (i, out[i])
    for i in singles:
        assert out[i] == (i, True), (i, out[i])
    kept = sorted(i for i, (_, k) in out.items() if k)
    assert kept == sorted([min(b) for b in bundles] + singles)


def test_dsir_weights_orders_target_like_docs_first(spark):
    """DSIR semantics: documents sharing the target's vocabulary get a
    higher importance weight than documents that don't; weight scales
    with overlap.  Also pins the Laplace joint-vocab contract: words
    unseen in the target keep the weight finite."""
    from geo_spark.operators.text import dsir_weights

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta"),        # pure target vocab
            (1, "alpha beta gamma delta"),       # half target vocab
            (2, "gamma delta epsilon zeta"),     # no target vocab
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "alpha beta alpha beta alpha")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["w_x1e6"])
        for r in dsir_weights(docs, target).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0][0] == 4 and got[1][0] == 4 and got[2][0] == 4
    w0, w1, w2 = got[0][1], got[1][1], got[2][1]
    assert w0 > w1 > w2, (w0, w1, w2)
    assert w0 > 0 > w2, (w0, w2)  # target-like up-weighted, alien down


def test_contamination_score_fractions(spark):
    """frac_e6 is the exact integer micro-fraction of a doc's distinct
    shingles found in the probe set: full containment -> 1_000_000,
    disjoint -> 0, and a doc shorter than n (single sub-n shingle) is
    excluded entirely."""
    from geo_spark.operators.dedup import contamination_score

    docs = spark.createDataFrame(
        [
            (1, "abcdefgh"),   # shingles of eval doc exactly
            (2, "abcdwxyz"),   # partial overlap
            (3, "qrstuvzz"),   # disjoint
            (4, "ab"),         # shorter than n=4 -> no length-4 shingle
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, "abcdefgh")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["frac_e6"])
        for r in contamination_score(docs, probes, n=4).collect()
    }
    assert set(got) == {1, 2, 3}
    # doc 1: 5 distinct 4-shingles, all in probe
    assert got[1] == (5, 5, 1_000_000)
    # doc 2: shingles abcd,bcdw,cdwx,dwxy,wxyz -> only abcd hits
    assert got[2] == (5, 1, 200_000)
    assert got[3] == (5, 0, 0)


def test_contamination_score_matches_python_oracle(spark, docs):
    """Differential vs a scalar python replay on real documents."""
    from geo_spark.operators.dedup import contamination_score

    probes = docs.where(F.col("doc_id") % 7 == 0)
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["frac_e6"])
        for r in contamination_score(docs, probes, n=12).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    pset = set()
    for did, t in rows:
        if did % 7 == 0:
            pset |= {s for s in _py_shingles(t, 12) if len(s) == 12}
    for did, t in rows:
        sh = {s for s in _py_shingles(t, 12) if len(s) == 12}
        if not sh:
            assert did not in got
            continue
        hit = len(sh & pset)
        assert got[did] == (len(sh), hit, hit * 1_000_000 // len(sh)), did


def test_incremental_minhash_equals_full_filtered(spark, docs):
    """incremental_minhash_pairs over a persisted index must equal the
    full-corpus LSH pairs restricted to pairs touching the batch."""
    from geo_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_index,
        minhash_lsh_pairs,
    )

    batch = docs.where(F.col("doc_id") % 5 == 2)
    corpus = docs.where(F.col("doc_id") % 5 != 2)
    buckets, sets = minhash_index(corpus, n=8)
    inc = {
        (r["da"], r["db"], round(r["jaccard"], 12))
        for r in incremental_minhash_pairs(
            buckets, sets, batch, n=8, threshold=0.3
        ).collect()
    }
    full = {
        (r["da"], r["db"], round(r["jaccard"], 12))
        for r in minhash_lsh_pairs(docs, n=8, threshold=0.3).collect()
        if r["da"] % 5 == 2 or r["db"] % 5 == 2
    }
    assert inc == full and len(inc) > 0


def test_incremental_minhash_new_vs_new_and_old(spark):
    """Both pair kinds surface: a batch doc near-dup of an indexed doc
    AND of another batch doc; indexed-vs-indexed pairs never leak."""
    from geo_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base), (2, base + " twin"), (3, "completely different words")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base + "!"), (11, base + "!!")],
        "doc_id long, text string",
    )
    buckets, sets = minhash_index(corpus, n=8)
    pairs = {
        (r["da"], r["db"])
        for r in incremental_minhash_pairs(
            buckets, sets, batch, n=8, threshold=0.3
        ).collect()
    }
    assert (1, 10) in pairs and (10, 11) in pairs
    assert (1, 2) not in pairs  # indexed-vs-indexed excluded


def test_text_sign_projection_separation(spark):
    """Deterministic JL sanity: identical bags project identically;
    a near-identical pair lands far closer than a disjoint pair."""
    from geo_spark.operators.text import text_sign_projection

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # identical bag
            (3, base + "iota"),             # one extra token
            (4, "completely different tokens q w e r t y u i o p " * 4),
        ],
        "doc_id long, text string",
    )
    out = text_sign_projection(docs, out_dim=32).collect()
    vecs = {}
    for r in out:
        vecs.setdefault(r["doc_id"], {})[r["d"]] = r["proj"]
    v = {k: [vecs[k][d] for d in range(32)] for k in vecs}
    assert v[1] == v[2]
    d_near = sum((a - b) ** 2 for a, b in zip(v[1], v[3]))
    d_far = sum((a - b) ** 2 for a, b in zip(v[1], v[4]))
    assert 0 < d_near < d_far / 10, (d_near, d_far)


def test_zipf_slope_signatures(spark):
    """A Zipf-distributed corpus fits slope ~ -1; a uniform-frequency
    corpus fits slope ~ 0."""
    from geo_spark.operators.text import zipf_slope

    zipf_tokens = []
    for r in range(1, 41):
        zipf_tokens += [f"w{r:03d}"] * max(1, round(4000 / r))
    uni_tokens = [f"u{r:03d}" for r in range(1, 41)] * 100
    docs = spark.createDataFrame(
        [(1, "zipf", " ".join(zipf_tokens)), (2, "unif", " ".join(uni_tokens))],
        "doc_id long, lang string, text string",
    )
    got = {
        r["lang"]: r["slope_u4"]
        for r in zipf_slope(docs, group_col="lang", top_k=40).collect()
    }
    assert -10500 < got["zipf"] < -9500, got
    assert abs(got["unif"]) < 200, got


def test_heaps_law_signatures(spark):
    """Open vocabulary (every doc new tokens) fits beta near 1; a
    closed vocabulary (same tokens every doc) saturates to beta 0."""
    from geo_spark.operators.text import heaps_law

    open_docs = [
        (i, "open", " ".join(f"t{i}_{j}" for j in range(20)))
        for i in range(20)
    ]
    closed_docs = [
        (100 + i, "closed", " ".join(f"c{j}" for j in range(20)))
        for i in range(20)
    ]
    docs = spark.createDataFrame(
        open_docs + closed_docs, "doc_id long, lang string, text string"
    )
    out = heaps_law(docs, group_col="lang", checkpoints=5).collect()
    beta = {r["lang"]: r["beta_u4"] for r in out}
    assert 9000 <= beta["open"] <= 10500, beta
    assert beta["closed"] == 0, beta
    # curve is monotone in both coordinates
    for g in ("open", "closed"):
        pts = sorted(
            (r["checkpoint"], r["n_tokens"], r["n_types"])
            for r in out
            if r["lang"] == g
        )
        assert all(a[1] <= b[1] and a[2] <= b[2] for a, b in zip(pts, pts[1:]))


def test_fold_into_index_equals_recomputation(spark, docs):
    """Index induction: fold batch1 into the corpus index, probe
    batch2 — identical pairs to probing batch2 against an index built
    from scratch over corpus+batch1."""
    from geo_spark.operators.dedup import (
        fold_into_index,
        incremental_minhash_pairs,
        minhash_index,
    )

    corpus = docs.where(F.col("doc_id") % 5 > 1)
    b1 = docs.where(F.col("doc_id") % 5 == 0)
    b2 = docs.where(F.col("doc_id") % 5 == 1)
    buckets, sets = minhash_index(corpus, n=8)
    fb, fs = fold_into_index(buckets, sets, b1, n=8)
    got = {
        (r["da"], r["db"], round(r["jaccard"], 12))
        for r in incremental_minhash_pairs(fb, fs, b2, n=8, threshold=0.3).collect()
    }
    rb, rs = minhash_index(docs.where(F.col("doc_id") % 5 != 1), n=8)
    want = {
        (r["da"], r["db"], round(r["jaccard"], 12))
        for r in incremental_minhash_pairs(rb, rs, b2, n=8, threshold=0.3).collect()
    }
    assert got == want and len(got) > 0
