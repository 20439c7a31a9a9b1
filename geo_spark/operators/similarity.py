"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk_brute` — exact top-k for every query vector.  For a
  broadcastable corpus the plan is shuffle-free: the corpus matrix ships
  in the task closure and each Arrow batch is one numpy GEMM.  This is
  the ground truth the approximate path is measured against.
- :func:`cosine_topk_lsh` — random-hyperplane (sign) LSH: b band
  signatures per vector, candidates = band-bucket equi-join, exact
  cosine rerank on candidates only.  The scale path for corpus sizes
  where all-pairs is impossible; recall tested in pytest.

Hyperplanes are seeded splitmix64 gaussians — deterministic across
executors, no RNG state shipped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geo_spark.operators.dedup import _splitmix64


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norm = np.sqrt((m * m).sum(axis=1))
    norm[norm == 0] = 1.0
    return m / norm[:, None]


# Corpus rows above this never ship in a task closure: ~64k x dim 64
# float64 is ~33 MB broadcast — the same adaptive size switch the kNN
# path makes at BRUTE_FORCE_MAX_TARGETS (operators/knn.py).
BRUTE_FORCE_MAX_CORPUS = 65536


def cosine_topk_brute(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_corpus_rows: int = BRUTE_FORCE_MAX_CORPUS,
) -> DataFrame:
    """(query_key, nb_id, rank): rank 1..k by descending cosine, ties by
    ascending corpus key.  Refuses driver-side collection of a corpus
    larger than ``max_corpus_rows`` — use :func:`cosine_topk` for the
    automatic brute/LSH dispatch."""
    rows = corpus.select(corpus_key, vec_col).limit(max_corpus_rows + 1).collect()
    if len(rows) > max_corpus_rows:
        raise ValueError(
            f"cosine_topk_brute: corpus exceeds {max_corpus_rows} rows; "
            "the all-pairs GEMM would need an unbounded driver collect. "
            "Use cosine_topk() (auto-dispatch) or cosine_topk_lsh()."
        )
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    cmat = _normalize_rows(np.array([r[1] for r in rows], dtype=np.float64))

    src = queries.select(query_key, vec_col)
    key_type = src.schema[query_key].dataType.simpleString()
    schema = f"{query_key} {key_type}, nb_id long, rank int"

    def fn(batches):
        for pdf in batches:
            q = _normalize_rows(
                np.array(list(pdf[vec_col]), dtype=np.float64)
            )  # (B,D)
            sims = q @ cmat.T  # (B,C)
            qids = pdf[query_key].to_numpy()
            if exclude_self:
                mask = qids[:, None] == cids[None, :]
                sims = np.where(mask, -np.inf, sims)
            order = np.lexsort((np.broadcast_to(cids, sims.shape), -sims), axis=1)
            kk = min(k, sims.shape[1] - (1 if exclude_self else 0))
            topk = order[:, :kk]
            yield pd.DataFrame(
                {
                    query_key: np.repeat(qids, kk),
                    "nb_id": cids[topk].ravel(),
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf)),
                }
            )

    return src.mapInPandas(fn, schema)


def cosine_topk(
    df: DataFrame,
    k: int,
    dim: int,
    key: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    bits_per_band: int = 12,
    seed: int = 42,
    max_brute_rows: int = BRUTE_FORCE_MAX_CORPUS,
) -> DataFrame:
    """Self-join top-k with automatic strategy dispatch: exact brute
    force while the corpus fits a task closure, banded sign-LSH +
    exact rerank beyond it.  The size probe is a bounded ``limit``
    count, not a full scan."""
    probe = df.select(key).limit(max_brute_rows + 1).count()
    if probe <= max_brute_rows:
        return cosine_topk_brute(
            df, df, k, key, key, vec_col, max_corpus_rows=max_brute_rows
        )
    return cosine_topk_lsh(df, k, dim, bands, bits_per_band, key, vec_col, seed)


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    """Deterministic (bits, dim) gaussian hyperplanes via Box-Muller over
    splitmix64 counter streams."""
    n = bits * dim
    idx = np.arange(n, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x51E2C1A1)
    u1 = (_splitmix64(idx).astype(np.float64) + 1.0) / 2.0**64
    u2 = (_splitmix64(idx ^ np.uint64(0xDEADBEEF)).astype(np.float64) + 1.0) / 2.0**64
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(bits, dim)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    bands: int = 8,
    bits_per_band: int = 12,
    key: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(key, band, sig): one sign-pattern integer per band."""
    planes = _hyperplanes(dim, bands * bits_per_band, seed)  # (bands*bits, dim)
    weights = (1 << np.arange(bits_per_band, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        m = np.array(list(vecs), dtype=np.float64)  # (B,D)
        proj = m @ planes.T  # (B, bands*bits)
        bits = (proj > 0).astype(np.int64).reshape(len(m), bands, bits_per_band)
        return pd.Series(list((bits * weights).sum(axis=2)))

    out = df.select(F.col(key), sigs(F.col(vec_col)).alias("_sigs"))
    return out.select(
        key, F.posexplode(F.col("_sigs")).alias("band", "sig")
    )


def cosine_topk_lsh(
    df: DataFrame,
    k: int,
    dim: int,
    bands: int = 8,
    bits_per_band: int = 12,
    key: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate self-join top-k: band-bucket candidates + exact
    rerank.  Candidates are symmetric; rank by descending cosine then
    ascending neighbor id."""
    sigs = lsh_signatures(df, dim, bands, bits_per_band, key, vec_col, seed)
    a = sigs.select(F.col(key).alias("qa"), "band", "sig")
    b = sigs.select(F.col(key).alias("qb"), "band", "sig")
    cands = (
        a.join(b, ["band", "sig"])
        .where(F.col("qa") != F.col("qb"))
        .select("qa", "qb")
        .distinct()
    )
    vecs = df.select(F.col(key).alias("_vid"), F.col(vec_col).alias("_v"))
    cands = (
        cands.join(vecs.withColumnRenamed("_vid", "qa").withColumnRenamed("_v", "_va"), "qa")
        .join(vecs.withColumnRenamed("_vid", "qb").withColumnRenamed("_v", "_vb"), "qb")
    )

    @F.pandas_udf(T.DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = _normalize_rows(np.array(list(va), dtype=np.float64))
        mb = _normalize_rows(np.array(list(vb), dtype=np.float64))
        return pd.Series((ma * mb).sum(axis=1))

    scored = cands.withColumn("sim", cos(F.col("_va"), F.col("_vb"))).drop("_va", "_vb")
    w = Window.partitionBy("qa").orderBy(F.desc("sim"), F.asc("qb"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("qa").alias(key), F.col("qb").alias("nb_id"), F.col("rank").cast("int").alias("rank"))
    )


def _train_centroids(
    df: DataFrame,
    n_centroids: int,
    key: str,
    vec_col: str,
    sample_rows: int = 8192,
    iters: int = 12,
    seed: int = 7,
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded driver-side sample:
    the coarse quantizer of the IVF index.  Sample and init are seeded,
    so every executor derives identical buckets."""
    rows = df.select(vec_col).limit(sample_rows).collect()
    m = _normalize_rows(np.array([r[0] for r in rows], dtype=np.float64))
    idx = _splitmix64(
        np.arange(n_centroids, dtype=np.uint64) + np.uint64(seed)
    ) % np.uint64(len(m))
    cents = m[idx.astype(np.int64)].copy()
    for _ in range(iters):
        sims = m @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                cents[c] = members.sum(axis=0)
        cents = _normalize_rows(cents)
    return cents


def cosine_topk_ivf(
    df: DataFrame,
    k: int,
    n_centroids: int = 64,
    nprobe: int = 8,
    key: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate self-join top-k: a seeded spherical-k-means coarse
    quantizer buckets the corpus by nearest centroid (one bucket per
    vector); each query probes its ``nprobe`` nearest centroid buckets
    and reranks candidates exactly.  The bucket join is a hash equi-join
    on the centroid id — the non-all-pairs scale path, complementary to
    the sign-LSH variant (different recall/shape trade-off: IVF follows
    the data distribution, LSH is data-independent)."""
    cents = _train_centroids(df, n_centroids, key, vec_col, seed=seed)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_buckets(vecs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.array(list(vecs), dtype=np.float64))
        sims = m @ cents.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    @F.pandas_udf(T.IntegerType())
    def home_bucket(vecs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.array(list(vecs), dtype=np.float64))
        return pd.Series((m @ cents.T).argmax(axis=1).astype(np.int32))

    data = df.select(
        F.col(key).alias("qb"),
        F.col(vec_col).alias("_vb"),
        home_bucket(F.col(vec_col)).alias("bucket"),
    )
    queries = df.select(
        F.col(key).alias("qa"),
        F.col(vec_col).alias("_va"),
        F.explode(probe_buckets(F.col(vec_col))).alias("bucket"),
    )
    cands = queries.join(data, "bucket").where(F.col("qa") != F.col("qb"))

    @F.pandas_udf(T.DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = _normalize_rows(np.array(list(va), dtype=np.float64))
        mb = _normalize_rows(np.array(list(vb), dtype=np.float64))
        return pd.Series((ma * mb).sum(axis=1))

    scored = cands.withColumn("sim", cos(F.col("_va"), F.col("_vb"))).drop(
        "_va", "_vb"
    )
    w = Window.partitionBy("qa").orderBy(F.desc("sim"), F.asc("qb"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qa").alias(key),
            F.col("qb").alias("nb_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int | None = None,
    key: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    bands: int = 16,
    bits_per_band: int = 8,
    seed: int = 42,
    max_corpus_rows: int = BRUTE_FORCE_MAX_CORPUS,
) -> DataFrame:
    """Embedding near-duplicate pair join: (da, db, sim) with da < db and
    cosine >= threshold.

    ``method='lsh'`` (the scale path): sign-LSH band buckets generate
    candidates (equi-join, never all-pairs) and the exact cosine rerank
    keeps pairs over the threshold — same harvest-then-verify shape as
    MinHash-LSH text dedup (operators/dedup.minhash_lsh_pairs); recall
    for a given threshold is governed by bands x bits (pytest-pinned vs
    the exact tier).  ``method='brute'``: exact all-pairs against a
    driver-collected corpus, count-gated like cosine_topk_brute — the
    oracle tier and the small-corpus fast path.
    """
    if method == "brute":
        rows = df.select(key, vec_col).limit(max_corpus_rows + 1).collect()
        if len(rows) > max_corpus_rows:
            raise ValueError(
                f"cosine_near_dup_pairs(brute): corpus exceeds "
                f"{max_corpus_rows} rows; use method='lsh'"
            )
        cids = np.array([r[0] for r in rows], dtype=np.int64)
        cmat = _normalize_rows(np.array([r[1] for r in rows], dtype=np.float64))

        src = df.select(key, vec_col)

        def fn(batches):
            for pdf in batches:
                q = _normalize_rows(np.array(list(pdf[vec_col]), dtype=np.float64))
                sims = q @ cmat.T
                qids = pdf[key].to_numpy(np.int64)
                # strict upper triangle only: da < db
                keep = (sims >= threshold) & (qids[:, None] < cids[None, :])
                qi, ci = np.nonzero(keep)
                yield pd.DataFrame(
                    {
                        "da": qids[qi],
                        "db": cids[ci],
                        "sim": sims[qi, ci],
                    }
                )

        return src.mapInPandas(fn, "da long, db long, sim double")

    if method != "lsh":
        raise ValueError(method)
    if dim is None:
        raise ValueError("cosine_near_dup_pairs(lsh) requires dim")
    sigs = lsh_signatures(df, dim, bands, bits_per_band, key, vec_col, seed)
    a = sigs.select(F.col(key).alias("da"), "band", "sig")
    b = sigs.select(F.col(key).alias("db"), "band", "sig")
    cands = (
        a.join(b, ["band", "sig"])
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    vecs = df.select(F.col(key).alias("_vid"), F.col(vec_col).alias("_v"))
    cands = (
        cands.join(
            vecs.withColumnRenamed("_vid", "da").withColumnRenamed("_v", "_va"), "da"
        ).join(
            vecs.withColumnRenamed("_vid", "db").withColumnRenamed("_v", "_vb"), "db"
        )
    )

    @F.pandas_udf(T.DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = _normalize_rows(np.array(list(va), dtype=np.float64))
        mb = _normalize_rows(np.array(list(vb), dtype=np.float64))
        return pd.Series((ma * mb).sum(axis=1))

    return (
        cands.withColumn("sim", cos(F.col("_va"), F.col("_vb")))
        .where(F.col("sim") >= threshold)
        .select("da", "db", "sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): 8-bit codes + asymmetric-distance scans —
# the compressed tier of the ANN family (brute / LSH / IVF / PQ).
# ---------------------------------------------------------------------------


def sample_codebooks(
    df: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    n_codes: int = 16,
) -> np.ndarray:
    """Data-sampled PQ codebooks: the subspace slices of the first
    ``n_codes`` corpus vectors in ``key`` order (L2-normalized), no
    k-means.  A legitimate PQ variant (random-sample codebooks are the
    k-means init) whose full chain — unlike the iterative
    :func:`train_pq` — is deterministic and replayable in plain SQL,
    which is what the ``q_pq_ann`` contract oracle does."""
    rows = df.select(key, vec_col).orderBy(key).limit(n_codes).collect()
    m = _normalize_rows(np.array([r[1] for r in rows], dtype=np.float64))
    d = m.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    # (m_sub, n_codes, ds): centroid c of subspace s = vector c's slice s
    return np.stack([m[:, s * ds : (s + 1) * ds] for s in range(m_sub)])


def train_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    m_sub: int = 8,
    n_codes: int = 256,
    sample_rows: int = 8192,
    iters: int = 12,
    seed: int = 11,
) -> np.ndarray:
    """(m_sub, n_codes, d/m_sub) PQ codebooks: per-subspace k-means on a
    bounded, seeded driver-side sample (the FAISS training protocol —
    codebooks are a dimension-table artifact, the corpus encode is the
    distributed part).  Vectors are L2-normalized first, so PQ dot
    products approximate cosine."""
    rows = df.select(vec_col).limit(sample_rows).collect()
    m = _normalize_rows(np.array([r[0] for r in rows], dtype=np.float64))
    d = m.shape[1]
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by m_sub {m_sub}")
    ds = d // m_sub
    n_codes = min(n_codes, len(m))
    books = np.empty((m_sub, n_codes, ds), dtype=np.float64)
    for s in range(m_sub):
        sub = m[:, s * ds : (s + 1) * ds]
        idx = _splitmix64(
            np.arange(n_codes, dtype=np.uint64) + np.uint64(seed + 977 * s)
        ) % np.uint64(len(sub))
        cents = sub[idx.astype(np.int64)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(key, codes binary): each vector compressed to m_sub bytes
    (argmin subspace centroid).  One vectorized Arrow pass; at 8 bytes
    per vector the encoded corpus is ~64x smaller than float64x64 —
    the representation a 100 TB embedding scan actually reads."""
    m_sub, n_codes, ds = codebooks.shape
    if n_codes > 256:
        raise ValueError("binary codes support up to 256 centroids")
    key_type = df.schema[key].dataType.simpleString()

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = _normalize_rows(
                np.array(list(pdf[vec_col]), dtype=np.float64)
            )
            n = len(vecs)
            codes = np.empty((n, m_sub), dtype=np.uint8)
            for s in range(m_sub):
                sub = vecs[:, s * ds : (s + 1) * ds]
                d2 = ((sub[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(
                    axis=2
                )
                codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
            yield pd.DataFrame(
                {
                    key: pdf[key].to_numpy(),
                    "codes": [c.tobytes() for c in codes],
                }
            )

    return df.select(key, vec_col).mapInPandas(fn, f"{key} {key_type}, codes binary")


def cosine_topk_pq(
    queries: DataFrame,
    corpus_codes: DataFrame,
    corpus: DataFrame,
    codebooks: np.ndarray,
    k: int,
    rerank: int = 4,
    query_key: str = "vec_id",
    corpus_key: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_queries: int = 4096,
) -> DataFrame:
    """(query_key, nb_id, rank): ADC top-k over PQ codes with exact
    re-ranking.

    Scan shape for 100 TB of embeddings: per corpus partition, every
    query's (m_sub x n_codes) dot-product lookup table scores the
    partition's codes as pure numpy GATHERS over uint8 (no float
    vector is ever read) and emits a per-partition top-(k*rerank); one
    small shuffle ranks the per-partition survivors globally, and the
    final k come from EXACT cosine on the survivors only (the standard
    PQ refinement step — approximation error affects recall, never the
    reported order of the reranked set)."""
    m_sub, n_codes, ds = codebooks.shape
    qrows = queries.select(query_key, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_pq ships query LUTs in closures; got > "
            f"{max_queries} queries — batch the query set"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qvecs = _normalize_rows(np.array([r[1] for r in qrows], dtype=np.float64))
    nq = len(qids)
    # LUT[q, s, c] = <q_sub_s, centroid_c_s>, QUANTIZED to integers
    # (floor(dot * 2^16)) — the FAISS fast-scan trick.  Integer ADC sums
    # are associativity-free: every engine (numpy here, the SQL oracle's
    # SUM, a future SIMD kernel) ranks candidates identically, so the
    # survivor cut is fully deterministic instead of hostage to float
    # summation order.  The <2^-16 per-term approximation error only
    # perturbs which candidates reach the EXACT rerank, never the final
    # reported order.
    lut = np.stack(
        [qvecs[:, s * ds : (s + 1) * ds] @ codebooks[s].T for s in range(m_sub)],
        axis=1,
    )  # (nq, m_sub, n_codes)
    lut = np.floor(lut * 65536.0).astype(np.int64)
    # survivor quota is exactly k*rerank non-self candidates; the
    # per-partition scan keeps one extra slot so a self-match can never
    # crowd a true survivor out of its partition's top list (makes the
    # result invariant to corpus partitioning — the contract oracle
    # relies on this)
    quota = k * rerank
    keep_n = quota + (1 if exclude_self else 0)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(len(pdf), m_sub)
            tids = pdf[corpus_key].to_numpy(np.int64)
            # scores[q, row] = sum_s LUT[q, s, codes[row, s]] (int64)
            scores = np.zeros((nq, len(codes)), dtype=np.int64)
            for s in range(m_sub):
                scores += lut[:, s, :][:, codes[:, s]]
            kk = min(keep_n, scores.shape[1])
            # Identical code tuples give bitwise-EQUAL approx scores, and
            # argpartition breaks such boundary ties arbitrarily — the
            # global (approx DESC, nb_id) window can then see a survivor
            # set that depends on partitioning.  Select tie-INCLUSIVELY
            # (everything >= the kth score), then order the small
            # candidate set deterministically by (score desc, tid).
            neg = -scores
            part = np.argpartition(neg, kk - 1, axis=1)[:, :kk]
            kth = np.take_along_axis(neg, part, axis=1).max(axis=1)
            mask = neg <= kth[:, None]
            oq, ot, osc = [], [], []
            for qi in range(nq):
                cidx = np.nonzero(mask[qi])[0]
                srt = cidx[np.lexsort((tids[cidx], neg[qi, cidx]))][:kk]
                oq.append(np.full(len(srt), qids[qi], dtype=np.int64))
                ot.append(tids[srt])
                osc.append(scores[qi, srt])
            yield pd.DataFrame(
                {
                    query_key: np.concatenate(oq),
                    "nb_id": np.concatenate(ot),
                    "approx": np.concatenate(osc),
                }
            )

    cand = corpus_codes.mapInPandas(
        scan, f"{query_key} long, nb_id long, approx long"
    )
    if exclude_self:
        cand = cand.where(F.col(query_key) != F.col("nb_id"))
    w = Window.partitionBy(query_key).orderBy(
        F.col("approx").desc(), F.col("nb_id")
    )
    survivors = (
        cand.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= quota)
        .drop("_r", "approx")
    )
    # exact rerank: join true vectors back for the survivor set only
    qmap = {int(i): v for i, v in zip(qids, qvecs)}
    exact = survivors.join(
        corpus.select(
            F.col(corpus_key).alias("nb_id"), F.col(vec_col).alias("_v")
        ),
        "nb_id",
    )

    def rer(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = _normalize_rows(np.array(list(pdf["_v"]), dtype=np.float64))
            qs = np.array([qmap[int(q)] for q in pdf[query_key]])
            yield pd.DataFrame(
                {
                    query_key: pdf[query_key],
                    "nb_id": pdf["nb_id"],
                    "cos": (qs * vecs).sum(axis=1),
                }
            )

    rers = exact.mapInPandas(rer, f"{query_key} long, nb_id long, cos double")
    w2 = Window.partitionBy(query_key).orderBy(F.col("cos").desc(), F.col("nb_id"))
    return (
        rers.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(query_key, "nb_id", F.col("rank").cast("int").alias("rank"))
    )


def hard_negatives(
    df: DataFrame,
    k: int,
    key: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_corpus_rows: int = BRUTE_FORCE_MAX_CORPUS,
) -> DataFrame:
    """(key, nb_id, rank): for every vector, the k most cosine-similar
    vectors with a DIFFERENT label — hard-negative mining for
    contrastive training (the highest-similarity cross-label pairs are
    the informative negatives).  Ties break by ascending corpus key,
    the cosine_topk_brute convention.

    Same gated-brute tier as cosine_topk_brute (one GEMM per Arrow
    batch against a broadcast corpus); at corpus sizes past the gate,
    run the LSH bucket join (cosine_topk_lsh) and apply the label mask
    at the rerank — the mask only ever REMOVES candidates, so the
    banding recall analysis carries over unchanged."""
    rows = df.select(key, vec_col, label_col).limit(
        max_corpus_rows + 1
    ).collect()
    if len(rows) > max_corpus_rows:
        raise ValueError(
            f"hard_negatives: corpus exceeds {max_corpus_rows} rows; "
            "use cosine_topk_lsh with a label-mask rerank."
        )
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    clab = np.array([r[2] for r in rows])
    cmat = _normalize_rows(np.array([r[1] for r in rows], dtype=np.float64))

    src = df.select(key, vec_col, label_col)
    key_type = src.schema[key].dataType.simpleString()
    schema = f"{key} {key_type}, nb_id long, rank int"

    def fn(batches):
        for pdf in batches:
            q = _normalize_rows(
                np.array(list(pdf[vec_col]), dtype=np.float64)
            )
            sims = q @ cmat.T
            qlab = pdf[label_col].to_numpy()
            same = qlab[:, None] == clab[None, :]
            sims = np.where(same, -np.inf, sims)
            qids = pdf[key].to_numpy()
            order = np.lexsort(
                (np.broadcast_to(cids, sims.shape), -sims), axis=1
            )
            n_valid = (~same).sum(axis=1)
            out_q, out_nb, out_rk = [], [], []
            for i in range(len(pdf)):
                kk = min(k, int(n_valid[i]))
                out_q.append(np.repeat(qids[i], kk))
                out_nb.append(cids[order[i, :kk]])
                out_rk.append(np.arange(1, kk + 1, dtype=np.int32))
            yield pd.DataFrame(
                {
                    key: np.concatenate(out_q),
                    "nb_id": np.concatenate(out_nb),
                    "rank": np.concatenate(out_rk),
                }
            )

    return src.mapInPandas(fn, schema)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    kc: int = 8,
    iters: int = 2,
    shift: float = 1.0,
    scale: float = 1_000_000.0,
) -> DataFrame:
    """(id, cidx, rep, keep): SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540) — semantic near-duplicate removal over an
    embedding column.  K-means-cluster the embedding space, search
    cosine near-dup pairs ONLY within a cluster (the clustering is
    what makes the pair search tractable: expected cluster size n/k
    turns all-pairs n^2 into ~n^2/k), resolve the pair graph into
    components, keep the minimum id per component.

    Scale shape: the in-cluster pair search is a plain cidx equi-join
    with NATIVE cosine (zip_with dot product over precomputed norms —
    no UDF, no Arrow hop), so AQE's skew-join split handles a hot
    cluster; component resolution is dedup_clusters (large-star/
    small-star rounds, O(log^2 n) bound).  k is the quadratic
    valve — size it so n/k stays joinable; for corpora where even
    n^2/k is too big, generate in-cluster candidates with
    cosine_near_dup_pairs(method='lsh') per cluster instead and feed
    the same resolution.

    ``keep`` marks the component representative (singletons keep
    themselves); downstream filters on it.  Quantization contract
    (shift/scale) as in kmeans_embed."""
    from geo_spark.operators.dedup import dedup_clusters
    from geo_spark.operators.kmeans import kmeans_embed

    asg = kmeans_embed(df, id_col, vec_col, kc, iters, shift, scale)
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn(
        "_nrm",
        F.sqrt(
            F.aggregate(
                F.zip_with("_v", "_v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
    )
    withc = asg.select(F.col(id_col).alias("_vid"), "cidx").join(vecs, "_vid")
    a = withc.select(
        "cidx",
        F.col("_vid").alias("da"),
        F.col("_v").alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    b = withc.select(
        "cidx",
        F.col("_vid").alias("db"),
        F.col("_v").alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    sim = F.aggregate(
        F.zip_with("_va", "_vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / (F.col("_na") * F.col("_nb"))
    pairs = (
        a.join(b, "cidx")
        .where(F.col("da") < F.col("db"))
        .withColumn("sim", sim)
        .where(F.col("sim") >= threshold)
        .select("da", "db")
    )
    comps = dedup_clusters(pairs, docs=df, key=id_col)
    return (
        asg.select(id_col, "cidx")
        .join(comps, id_col)
        .select(
            id_col,
            "cidx",
            "rep",
            (F.col("rep") == F.col(id_col)).alias("keep"),
        )
    )


def random_projection(
    emb: DataFrame,
    out_dim: int = 8,
    key: str = "vec_id",
    vec_col: str = "embedding",
    shift: float = 1.0,
    scale: float = 1_000_000.0,
    seed: int = 1,
) -> DataFrame:
    """(key, d, proj): a deterministic +-1 Johnson-Lindenstrauss sketch
    of the quantized embedding — proj_d = sum_i s(d, i) * q_i with the
    sign drawn from an inline integer hash of (dimension, component),
    so NO projection matrix is materialized or broadcast at all.  The
    cheap pre-ANN dimension cut: pairwise distances survive within
    (1 +- eps) w.h.p. for out_dim = O(ln n / eps^2) (sign/Achlioptas
    projections satisfy the JL lemma like gaussians do).

    Exactness: components quantize to BIGINT (floor((x + shift) *
    scale), the repo-wide embedding contract) and each projection is an
    integer sum, so the SQL oracle replays every value bit-for-bit.

    Scale shape: ONE partial-aggregatable groupBy(key) computing all
    ``out_dim`` conditional sums in a single pass over the exploded
    components — no cross join, no matrix, shuffle rows = n x out_dim
    after map-side combine."""
    from geo_spark.operators.kmeans import _quantize_vec

    ex = emb.select(
        F.col(key),
        F.posexplode(_quantize_vec(vec_col, shift, scale)).alias("i", "q"),
    )

    def sign(d: int):
        mix = (
            (F.col("i") * 1000003 + F.lit(d * 7919 + int(seed)))
            * 2654435761
        ) % 4294967296
        return F.when(mix < 2147483648, F.lit(1)).otherwise(F.lit(-1))

    wide = ex.groupBy(key).agg(
        *[F.sum(sign(d) * F.col("q")).alias(f"_p{d}") for d in range(out_dim)]
    )
    stack = ", ".join(
        f"CAST({d} AS BIGINT), _p{d}" for d in range(out_dim)
    )
    return wide.select(
        key, F.expr(f"stack({out_dim}, {stack}) AS (d, proj)")
    )
