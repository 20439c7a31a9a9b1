"""Mixture-construction sampling for training-data pipelines.

Building a training mixture from a 100 TB corpus is a *sampling* step:
per-stratum quotas ("50k docs per language") or token budgets ("2B
tokens per domain"), deterministic across reruns so downstream shards
are reproducible.  Both operators are one window function over a
single shuffle on the stratum key — entirely native SQL (whole-stage
codegen), no UDF, no driver state.

Determinism: rows are ordered by ``md5(key)`` (a content-free uniform
permutation), so the sample is a fixed pseudo-random subset independent
of input partitioning or row order — rerunning the pipeline, or running
it on a differently-bucketed copy of the corpus, selects the same rows.

Skew note (100 TB): a naive per-stratum window makes one stratum one
window partition — a single giant stratum (e.g. English) concentrates
on one task.  :func:`stratified_sample` caps the damage with an
md5-prefix range prefilter when ``prefilter_counts`` is given;
:func:`token_budget_sample` decomposes the walk into md5-prefix
buckets (tiny per-bucket totals first, then per-bucket windows over
only the buckets the budget can reach), so neither a full-stratum
sort nor a single-task stratum exists on the per-doc path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(key: str):
    # md5 of the key, tie-broken by the key itself (total order)
    return [F.md5(F.col(key).cast("string")), F.col(key)]


def stratified_sample(
    docs: DataFrame,
    stratum_col: str,
    quota: int,
    key: str = "doc_id",
    prefilter_counts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic per-stratum quota sample: the ``quota`` rows with
    the smallest ``md5(key)`` in each stratum.

    ``prefilter_counts`` (stratum_col, n_docs) — when given, strata
    larger than ``4 * quota`` are pre-thinned with a cheap md5-prefix
    range predicate before the exact window, so the window partition
    for a billion-doc stratum sees ~4x the quota instead of a billion
    rows.  The thinned result equals the exact sample unless fewer than
    ``quota`` of the stratum's rows hash under the 4x cutoff — a
    Chernoff-improbable event (P < exp(-q); pass ``None`` for the
    unconditionally exact path)."""
    if prefilter_counts is not None:
        # keep rows whose md5 falls in the first ~4*quota/n fraction of
        # hash space: equal-length lowercase hex compares lexicographically,
        # so an 8-hex-digit cutoff string is the whole predicate
        frac = F.least(
            F.lit(1.0), F.lit(4.0 * quota) / F.col("n_docs").cast("double")
        )
        cutoff = F.lpad(
            F.format_string(
                "%x", F.least(F.lit(0xFFFFFFFF), F.ceil(frac * (1 << 32))).cast("long")
            ),
            8,
            "0",
        )
        docs = (
            docs.join(F.broadcast(prefilter_counts), stratum_col)
            .where(F.substring(F.md5(F.col(key).cast("string")), 1, 8) <= cutoff)
            .drop("n_docs")
        )
    w = Window.partitionBy(stratum_col).orderBy(*_order_cols(key))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= quota)
        .drop("_rn")
    )


def token_budget_sample(
    docs: DataFrame,
    stratum_col: str,
    budget: int,
    token_col: str = "n_tokens",
    key: str = "doc_id",
    bucket_hex: int = 2,
) -> DataFrame:
    """Deterministic per-stratum token-budget sample: walk the stratum
    in md5 order, keep documents while the running token total stays
    within ``budget`` (the first document that would overflow the
    budget is excluded, as are all after it).  Token counts must be
    non-negative.

    Scale shape — bucketed prefix-sum, not one full per-stratum sort:
    the md5 order is refined by its own first ``bucket_hex`` hex chars
    into 16^bucket_hex ordered buckets, so the walk decomposes exactly:

    1. aggregate token totals per (stratum, bucket) — map-side
       combined, output is strata x 256 rows;
    2. an exclusive prefix sum over that TINY table (window over
       buckets) gives each bucket's starting offset in the walk;
    3. buckets whose offset already exceeds the budget are dropped
       BEFORE any per-doc work — at corpus scale with budget << corpus
       this prunes almost all data ahead of the expensive exchange;
    4. surviving docs window per (stratum, bucket): 256-way parallel
       per-bucket sorts of ~budget-sized data instead of one task
       sorting a billion-doc stratum, then per-doc cum = bucket offset
       + in-bucket running sum (exact, because bucket prefix order is
       a prefix of the full md5 order).

    Output rows and ``cum_tokens`` values are identical to the naive
    single-window formulation (the sf0.01 oracle replays that naive
    SQL verbatim)."""
    bucket = F.substring(F.md5(F.col(key).cast("string")), 1, bucket_hex)
    bucketed = docs.withColumn("_bkt", bucket)
    stats = bucketed.groupBy(stratum_col, "_bkt").agg(
        F.sum(F.col(token_col)).alias("_bt")
    )
    wcum = (
        Window.partitionBy(stratum_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    surviving = (
        stats.withColumn("_cum_before", F.sum("_bt").over(wcum) - F.col("_bt"))
        .where(F.col("_cum_before") <= budget)
        .select(stratum_col, "_bkt", "_cum_before")
    )
    w = (
        Window.partitionBy(stratum_col, "_bkt")
        .orderBy(*_order_cols(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.join(F.broadcast(surviving), [stratum_col, "_bkt"])
        .withColumn(
            "cum_tokens", F.sum(F.col(token_col)).over(w) + F.col("_cum_before")
        )
        .where(F.col("cum_tokens") <= budget)
        .drop("_bkt", "_cum_before")
    )


def weighted_sample(
    docs: DataFrame,
    stratum_col: str,
    quota: int,
    weight_col: str,
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, per stratum
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): each row gets priority ln(u)/w for a uniform
    u in (0,1] and positive weight w, and the ``quota`` LARGEST
    priorities per stratum are the sample — exactly the distribution of
    sequential weighted draws without replacement.

    u comes from the first 13 hex chars (52 bits) of md5(key) — a TRUE
    hash, unlike the affine LCG noise streams, whose Weyl-sequence
    structure correlates adjacent ids and visibly skews pairwise win
    rates (measured: 0.833 instead of 0.9 for a 9:1 weight pair on
    consecutive ids).  The hex->integer conversion, +1 shift and /2^52
    are exact integer/dyadic arithmetic in both engines
    (``weighted_priority_sql`` emits the DuckDB digit-extraction twin);
    ln() is the only libm call and affects selection only when two
    priorities straddle the quota boundary within an ulp.

    Scale shape: one row_number window per stratum, which Spark 4
    rewrites with a partial WindowGroupLimit BELOW the exchange — every
    map task forwards at most ``quota`` rows per stratum, so the
    shuffle carries O(tasks x quota), not the corpus.

    Returns (stratum, key, weight, rank) with rank 1..quota by
    descending priority."""
    pri = F.expr(AES_PRIORITY_SQL.format(key=key, weight=weight_col))
    w = Window.partitionBy(stratum_col).orderBy(
        pri.desc(), F.col(key).asc()
    )
    return (
        docs.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= quota)
        .select(
            stratum_col,
            key,
            F.col(weight_col).alias("weight"),
            F.col("_rnk").cast("int").alias("rank"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows (the standard
    pretraining chunking step: window ``chunk_tokens``, stride
    ``chunk_tokens - overlap``).  Token at position p belongs to every
    chunk k with k*stride <= p < k*stride + chunk_tokens; trailing
    windows may be short (and, when the doc ends inside an overlap,
    a tail window can be a subset of its predecessor — included by
    spec, deterministic).

    Integer arithmetic only, and the k-range derivation keeps every
    numerator non-negative: Spark's `div` truncates toward zero while
    DuckDB's `//` floors, so a negative intermediate would silently
    diverge between engine and oracle.

    Scale shape: posexplode -> bounded explode (<= chunk/stride chunk
    ids per token) -> ONE groupBy(key, chunk) rebuilding each window
    with a sorted collect_list — per-group state bounded by the window
    size, never the document."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(key),
        F.posexplode(F.split(F.col(text_col), " ", -1)).alias("_pos", "_tok"),
    )
    kmin = F.when(F.col("_pos") < chunk_tokens, F.lit(0)).otherwise(
        F.expr(f"(_pos - {chunk_tokens}) div {stride} + 1")
    )
    kmax = F.expr(f"_pos div {stride}")
    spread = toks.withColumn(
        "chunk_id", F.explode(F.sequence(kmin.cast("long"), kmax.cast("long")))
    )
    return (
        spread.groupBy(key, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_tok"))
                    ),
                    lambda s: s["_tok"],
                ),
            ).alias("chunk_text"),
        )
    )


# The A-ES priority as a Spark SQL fragment — shared verbatim by the
# batch operator and the streaming reservoir twin so both rank by the
# bit-identical value.
AES_PRIORITY_SQL = (
    "ln((cast(conv(substring(md5(cast({key} as string)), 1, 13), 16, 10)"
    " as bigint) + 1) / 4503599627370496e0) / {weight}"
)


def weighted_priority_sql(key: str, weight: str) -> str:
    """DuckDB twin of the A-ES priority: the md5 52-bit uniform is
    rebuilt by arithmetic hex-digit extraction (DuckDB has no conv()),
    exact integer arithmetic end to end."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST({key} AS VARCHAR)),"
        f" {i + 1}, 1)) - 1) * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"ln((({digits}) + 1) / 4503599627370496e0) / {weight}"


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    shard_col: str,
    token_col: str = "n_tokens",
    key: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard, documents
    are concatenated in deterministic ``md5(key)`` order and the token
    stream is chunked into fixed ``seq_len`` windows — the standard
    pretraining packing step.  Each document reports the half-open
    token span it occupies and the bins it lands in; documents longer
    than ``seq_len`` span multiple bins.

    One running-sum window per shard (same shuffle shape as
    :func:`token_budget_sample`).  Packing per *shard* rather than
    globally is deliberate: a global token order would be a
    single-partition window (a driver-shaped bottleneck at 100 TB),
    while shards pack independently on executors and training readers
    consume shards independently anyway.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*_order_cols(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    start = (cum - F.col(token_col)).alias("start_tok")
    return docs.select(
        key,
        shard_col,
        F.col(token_col),
        start,
        cum.alias("end_tok"),
        F.floor((cum - F.col(token_col)) / seq_len).cast("long").alias("start_bin"),
        F.floor((cum - 1) / seq_len).cast("long").alias("end_bin"),
    ).where(F.col(token_col) > 0)


def rank_fusion(
    df: DataFrame,
    signals: dict[str, bool],
    key: str = "doc_id",
) -> DataFrame:
    """(key, fused, *ranks): Borda rank fusion of quality signals —
    combine incommensurable signals (length, LM score, repetition
    ratio) by summing each document's DENSE RANK per signal instead
    of z-scoring floats: rank arithmetic is integer-exact, scale-free
    and outlier-immune, which is why curation stacks fuse ranks, not
    values.  ``signals`` maps column -> higher_is_better; every rank
    is dense (ties share a rank) with rank 1 = best; ``fused`` is the
    sum (lower = better overall).

    Scale note: each dense_rank is a global ORDER BY one signal —
    a single-column sort-based window per signal, the price of exact
    global ranks.  For 100 TB use the per-stratum variant (partition
    the window by language/domain bucket, which is how mixture
    pipelines apply it anyway) or pre-bucket values; exact global
    ranking of a petabyte by k signals is k sorts and should be."""
    out = df
    rank_cols = []
    for col, higher in signals.items():
        rc = f"rank_{col}"
        order = F.col(col).desc() if higher else F.col(col).asc()
        out = out.withColumn(
            rc, F.dense_rank().over(Window.orderBy(order)).cast("long")
        )
        rank_cols.append(rc)
    fused = None
    for rc in rank_cols:
        fused = F.col(rc) if fused is None else fused + F.col(rc)
    return out.select(key, fused.alias("fused"), *rank_cols)


def stratified_rank_fusion(
    df: DataFrame,
    signals: dict[str, bool],
    stratum_col: str,
    key: str = "doc_id",
) -> DataFrame:
    """(key, stratum, fused, *ranks): :func:`rank_fusion` with every
    dense rank computed WITHIN a stratum (language, domain bucket,
    source) — the 100-TB shape the global variant's docstring points
    to, and the semantically right one for mixture pipelines: a
    document competes against its own stratum (ranking a Python file
    against English prose by length is meaningless), and selection
    quotas are per-stratum anyway (:func:`stratified_sample`).

    Scale shape: each rank is one hash-partitioned sort-window per
    signal — strata rank in parallel, no global sort, no single
    partition ever holds more than a stratum.  Skew note: one giant
    stratum degenerates to the global variant's cost for ITS rows
    only; pre-split hot strata upstream if that matters."""
    out = df
    rank_cols = []
    for col, higher in signals.items():
        rc = f"rank_{col}"
        order = F.col(col).desc() if higher else F.col(col).asc()
        out = out.withColumn(
            rc,
            F.dense_rank()
            .over(Window.partitionBy(stratum_col).orderBy(order))
            .cast("long"),
        )
        rank_cols.append(rc)
    fused = None
    for rc in rank_cols:
        fused = F.col(rc) if fused is None else fused + F.col(rc)
    return out.select(key, stratum_col, fused.alias("fused"), *rank_cols)
