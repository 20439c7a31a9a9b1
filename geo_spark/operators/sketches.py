"""Mergeable sketches + selection statistics for grouped rollups.

The family, by merge operator — what ships across partitions/windows
is always a fixed-size summary, never the value set:

* KMV (k-MIN merge): distinct counts + pairwise set similarity
  (`kmv_distinct`, `kmv_pair_similarity`).
* HyperLogLog (register MAX merge): distinct counts at O(2^p) cells
  (`hll_registers`, `hll_distinct`) — estimator kept exact-integer.
* Count-Min (counter ADD merge): frequencies + exact-refined heavy
  hitters (`cms_sketch`, `cms_heavy_hitters`).
* Bloom (bit OR merge): prefiltered exact semi-joins
  (`bloom_semi_join`).
* Selection statistics (no estimator at all — the answer is a chosen
  input row): `sampled_group_median`, `exact_quantiles` (global
  order statistics by histogram selection, no global sort).

KMV background: per group, keep the k smallest *distinct* hash values
of the counted column; if fewer than k survive the count is exact,
otherwise the classic estimator ``(k-1) / kth_min_normalized``
(Bar-Yossef et al., "Counting distinct elements in a data stream").
This is the primitive behind "distinct users per tile" over 100 TB:
the shuffled state per group is k values, not the value set.

Determinism contract: the hash is 32-bit LCG-style *integer* arithmetic
(exact in Spark SQL and DuckDB alike — the same replayability rule the
geo-noise streams follow, operators/geo_noise.py), and the estimator is
integer floor-division, so a SQL oracle reproduces every output bit.
Statistical quality of an LCG is below a real mixer's; the operator
accepts custom SQL via ``hash_sql`` when deployment needs md5-grade
dispersion (the structure of the sketch is hash-agnostic).

Scale shape: one distinct-shuffle on (group, hash), then the rank<=k
window — Spark 4 plants a partial WindowGroupLimit below the exchange,
so each map task forwards at most k rows per group it sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 32-bit mixed congruential hash: exact in both engines (operands stay
# far below 2^63, % is arithmetic mod on nonnegative values)
KMV_HASH_SQL = "(({v} * 2654435761 + 12345) % 4294967296)"
_KMV_RANGE = 4_294_967_296  # 2^32


def kmv_hash_sql(value_col: str) -> str:
    """The default hash as a SQL string (for oracles)."""
    return KMV_HASH_SQL.format(v=value_col)


def sampled_group_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_cols..., n_sample, median): per-group median estimated on
    a deterministic bottom-k-by-md5 sample (the hash-rank sample of
    operators/sampling.py), selected as the ceil(m/2)-th smallest
    sample value with (value, id) tie order.

    Per-group state is k rows regardless of group size — the quantile
    analog of the KMV distinct sketch.  The median is a SELECTED row's
    value (no arithmetic), so the SQL oracle reproduces it bitwise;
    both windows share one hash partitioning (one shuffle total)."""
    w_sample = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    kept = (
        df.select(*group_cols, value_col, id_col)
        .withColumn("_rn", F.row_number().over(w_sample))
        .where(F.col("_rn") <= k)
    )
    w_rank = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col), F.col(id_col)
    )
    cnt = Window.partitionBy(*group_cols)
    return (
        kept.withColumn("_vr", F.row_number().over(w_rank))
        .withColumn("_m", F.count(F.lit(1)).over(cnt))
        .where(F.col("_vr") == F.ceil(F.col("_m") / 2))
        .select(
            *group_cols,
            F.col("_m").alias("n_sample"),
            F.col(value_col).alias("median"),
        )
    )


def kmv_pair_similarity(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_sql: str | None = None,
) -> DataFrame:
    """(g1, g2, k_used, matches, est_jaccard_ppm, est_union): pairwise
    set-similarity between every two groups' value sets, estimated from
    merged KMV sketches — the mergeability that makes KMV usable at
    100 TB (ship one k-array per group, never the value sets).

    Estimator (Beyer et al., "On synopses for distinct-value estimation
    under multiset operations"): K = the k smallest of the UNION of the
    two sketches (which equals the k smallest of the union of the full
    sets — the KMV merge property); Jaccard ≈ |K ∩ A ∩ B| / |K|, and
    the union size reuses the kth-min estimator on K.  All integer
    arithmetic (ppm fixed-point, floor div), so the approximate
    operator has an exact SQL oracle.

    Scale shape: the sketch build is kmv_distinct's distinct-shuffle +
    rank-k window; each group then collapses to ONE row holding a
    ≤k-long sorted array, and the pair enumeration is an all-pairs join
    over those one-row-per-group sketches (inherently quadratic in
    group count — bound the group domain or pre-filter candidate pairs
    upstream; the arrays, not the data, are what's joined)."""
    h = F.expr((hash_sql or KMV_HASH_SQL).format(v=value_col))
    d = df.select(group_col, h.alias("_h")).distinct()
    w = Window.partitionBy(group_col).orderBy("_h")
    kept = d.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    arrs = kept.groupBy(group_col).agg(
        F.sort_array(F.collect_list("_h")).alias("_arr")
    )
    a = arrs.select(F.col(group_col).alias("g1"), F.col("_arr").alias("_a1"))
    b = arrs.select(F.col(group_col).alias("g2"), F.col("_arr").alias("_a2"))
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    union_all = F.array_sort(F.array_union(F.col("_a1"), F.col("_a2")))
    staged = pairs.select(
        "g1",
        "g2",
        F.slice(union_all, 1, k).alias("_topk"),
        F.size(union_all).cast("long").alias("_un"),
        F.array_intersect(F.col("_a1"), F.col("_a2")).alias("_inter"),
    ).select(
        "g1",
        "g2",
        F.size("_topk").cast("long").alias("k_used"),
        F.size(F.array_intersect(F.col("_topk"), F.col("_inter")))
        .cast("long")
        .alias("matches"),
        F.element_at(F.col("_topk"), F.size("_topk")).alias("_kth"),
        F.col("_un"),
    )
    return staged.select(
        "g1",
        "g2",
        "k_used",
        "matches",
        F.expr("CAST(matches * 1000000 DIV k_used AS BIGINT)").alias(
            "est_jaccard_ppm"
        ),
        F.when(F.col("_un") < k, F.col("_un"))
        .otherwise(F.expr(f"({k - 1} * {_KMV_RANGE}) div _kth"))
        .cast("long")
        .alias("est_union"),
    )


def md5_mod_sql(value_expr: str, salt: str, mod: int) -> str:
    """Deterministic salted hash as Spark SQL: the first 13 hex chars
    (52 bits) of ``md5(salt || ':' || value)`` reduced mod ``mod``.
    Engine-portable by the same rule as AES_PRIORITY_SQL
    (operators/sampling.py): the hex->int conversion and % are exact
    integer arithmetic; DuckDB twin in :func:`md5_mod_duckdb_sql`."""
    return (
        f"(cast(conv(substring(md5(concat('{salt}:', "
        f"cast({value_expr} as string))), 1, 13), 16, 10) as bigint)"
        f" % {mod})"
    )


def md5_mod_duckdb_sql(value_expr: str, salt: str, mod: int) -> str:
    """DuckDB twin of :func:`md5_mod_sql` (no conv(): exact hex-digit
    extraction, mirroring sampling.weighted_priority_sql)."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(concat('{salt}:', "
        f"CAST({value_expr} AS VARCHAR))), {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"(({digits}) % {mod})"


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """(group_cols..., d, bucket, cnt): Count-Min sketch counters — per
    group, ``depth`` independent md5-salted hash rows of ``width``
    buckets (Cormode/Muthukrishnan, "An improved data stream summary:
    the count-min sketch and its applications").

    Mergeability is the 100 TB story: counters add coordinate-wise, so
    partial aggregation happens map-side and cross-partition /
    cross-window merges ship depth x width integers per group, never
    item domains.  In pure batch an exact groupBy-count is the same
    single shuffle — the sketch earns its keep as bounded streaming
    state (streaming/sketches.py twin) and as the prefilter of
    :func:`cms_heavy_hitters`.  Plan: one explode(depth) + one partial
    aggregated shuffle, zero Python."""
    d_bucket = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(
                        md5_mod_sql(item_col, f"cms{d}", width)
                    ).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("_db")
    return (
        df.select(*group_cols, d_bucket)
        .select(*group_cols, "_db.d", "_db.bucket")
        .groupBy(*group_cols, "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    threshold: int,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """(group_cols..., item, est_count, n_exact): per-group heavy
    hitters — items whose true count >= ``threshold`` — found by
    probing the Count-Min sketch and exact-counting only survivors.

    CMS never under-counts (est >= true always: every occurrence lands
    in all of the item's ``depth`` counters), so the sketch cut keeps a
    SUPERSET of the true heavies and the exact refine makes the output
    exact — the same sketch-prefilter + exact-refine contract the LSH
    dedup tiers follow.  est_count is min over rows (the CMS read).

    Scale shape: sketch build (fixed-size per group) + distinct-item
    probe join against depth*width counters + exact count of survivors
    only.  When the candidate item domain is externally known (event
    types, probe vocabularies), feed it upstream and the probe pass
    touches only those."""
    sk = cms_sketch(df, group_cols, item_col, depth=depth, width=width)
    items = df.select(*group_cols, item_col).distinct()
    probes = items.select(
        *group_cols,
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(
                            md5_mod_sql(item_col, f"cms{d}", width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_db"),
    ).select(*group_cols, item_col, "_db.d", "_db.bucket")
    est = (
        probes.join(sk, [*group_cols, "d", "bucket"])
        .groupBy(*group_cols, item_col)
        .agg(F.min("cnt").alias("est_count"))
        .where(F.col("est_count") >= threshold)
    )
    exact = (
        df.join(est.select(*group_cols, item_col), [*group_cols, item_col], "left_semi")
        .groupBy(*group_cols, item_col)
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .where(F.col("n_exact") >= threshold)
    )
    return exact.join(est, [*group_cols, item_col]).select(
        *group_cols, item_col, "est_count", "n_exact"
    )


def bloom_semi_join(
    big: DataFrame,
    big_col: str,
    probe: DataFrame,
    probe_col: str,
    bits_log2: int = 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact ``big SEMI JOIN probe`` with a Bloom-filter prefilter on
    the big side — the deterministic, oracle-replayable analog of the
    runtime bloom filters Spark's AQE plants for selective joins.

    The probe side's values set ``n_hashes`` md5-salted bit positions
    in a 2^bits_log2-bit filter; the filter is aggregated to ONE row of
    packed 64-bit words, collected (8 KiB at the default — the same
    fixed-size-aggregate driver hop kmeans takes for centroids) and
    inlined as a literal array, so the big-side scan filters with pure
    codegen bit tests and NO shuffle or Python.  Bloom filters have no
    false negatives (all k positions of a member are set by
    construction), so prefilter + exact semi-join refine == exact
    semi-join; false positives only cost refine work (~0.4%% at 16 bits
    / 4 hashes / <=5k probe values).  At larger probe cardinalities
    raise bits_log2 (the array literal stays executor-local); beyond
    literal-friendly sizes the same words table broadcast-joins on
    word index."""
    m = 1 << bits_log2
    pos_exprs = [
        md5_mod_sql(probe_col, f"bl{j}", m) for j in range(n_hashes)
    ]
    words_rows = (
        probe.select(
            F.explode(
                F.array(*[F.expr(p).cast("long") for p in pos_exprs])
            ).alias("_pos")
        )
        .select(
            F.expr("_pos div 64").alias("_w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(_pos % 64 as int))"
            ).alias("_b"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_b)").alias("_word"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in words_rows:
        words[int(r["_w"])] = int(r["_word"])
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for j in range(n_hashes):
        p_sql = md5_mod_sql(big_col, f"bl{j}", m)
        word = F.element_at(
            arr, F.expr(f"cast(({p_sql}) div 64 + 1 as int)")
        )
        bit = F.expr(
            f"shiftleft(cast(1 as bigint), cast(({p_sql}) % 64 as int))"
        )
        hit = word.bitwiseAND(bit) != F.lit(0).cast("long")
        cond = hit if cond is None else (cond & hit)
    cand = big.where(cond)
    pr = probe.select(F.col(probe_col).alias("_pv")).distinct()
    return cand.join(
        pr, F.col(big_col) == F.col("_pv"), "left_semi"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
    hash_sql: str | None = None,
) -> DataFrame:
    """(group_cols..., n_kept, kth_hash, est_distinct): KMV distinct
    estimate per group.  ``n_kept < k`` means est_distinct is exact."""
    h = F.expr((hash_sql or KMV_HASH_SQL).format(v=value_col))
    d = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = d.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("kth_hash"),
    )
    # (k-1) / (kth / 2^32) as pure integer floor-division: exact in any
    # engine.  kth_hash > 0 whenever n_kept == k (k distinct values).
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"({k - 1} * {_KMV_RANGE}) div kth_hash")
    )
    return agg.withColumn("est_distinct", est.cast("long"))


def md5_52_sql(value_expr: str, salt: str) -> str:
    """Full 52-bit salted md5 hash as Spark SQL (the md5_mod_sql value
    before the modulus — register sketches need the whole word to
    split into (bucket, leading-zero payload))."""
    return (
        f"cast(conv(substring(md5(concat('{salt}:', "
        f"cast({value_expr} as string))), 1, 13), 16, 10) as bigint)"
    )


def md5_52_duckdb_sql(value_expr: str, salt: str) -> str:
    """DuckDB twin of :func:`md5_52_sql` (exact hex-digit expansion)."""
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(concat('{salt}:', "
        f"CAST({value_expr} AS VARCHAR))), {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"({digits})"


def _hll_alpha_ppm(m: int) -> int:
    """Standard HLL bias constant in parts-per-million (Flajolet et
    al. 2007): fixed small-m values, the asymptotic formula above."""
    if m == 16:
        return 673_000
    if m == 32:
        return 697_000
    if m == 64:
        return 709_000
    return int(721_300 * m / (m + 1.079))


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """(group_cols..., j, reg): HyperLogLog registers — per group,
    2^p max-rank cells over the 52-bit salted md5 hash (register j =
    h mod 2^p, rank = leading zeros of the remaining 52-p bits + 1).

    This is the MAX-merge mergeable summary, complementing
    kmv_distinct's k-MIN family: registers combine by coordinate-wise
    max, so partial aggregation is map-side, cross-partition merges
    ship 2^p bytes-worth of cells per group, and the same state is a
    natural streaming aggregate.  Rank extraction is exact integer +
    string SQL (bit_length via length(bin(w)) — identical in DuckDB),
    no floats anywhere."""
    m = 1 << p
    r_bits = 52 - p
    h = F.expr(md5_52_sql(value_col, "hll"))
    base = df.select(*group_cols, h.alias("_h"))
    w = F.expr(f"_h div {m}")
    rank = (
        F.when(w == 0, F.lit(r_bits + 1))
        .otherwise(F.lit(r_bits + 1) - F.length(F.bin(w)))
        .cast("long")
    )
    return (
        base.select(
            *group_cols,
            (F.col("_h") % m).alias("j"),
            rank.alias("_rank"),
        )
        .groupBy(*group_cols, "j")
        .agg(F.max("_rank").alias("reg"))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 6,
) -> DataFrame:
    """(group_cols..., n_regs, est_distinct): HyperLogLog distinct
    estimate per group, every step exact integer arithmetic so a SQL
    oracle replays it bit-for-bit (the kmv_distinct portability
    contract, applied to the harmonic-mean estimator):

      S   = Σ_j 2^(R+1-reg_j)  (empty registers contribute 2^(R+1);
                                computed as (m - n_regs)·2^(R+1))
      est = ALPHA_N // S        (ALPHA_N = (α_ppm·m²·2^(R+1)) // 10^6,
                                 the bias constant pre-scaled to an
                                 exact int64 literal driver-side)

    The raw estimator only (no small/large-range corrections): at the
    corpus scales this engine targets the linear-counting regime is
    the job of kmv_distinct, and keeping one exact formula is what
    buys the oracle."""
    m = 1 << p
    r_bits = 52 - p
    pow_top = 1 << (r_bits + 1)
    alpha_n = (_hll_alpha_ppm(m) * m * m * pow_top) // 1_000_000
    regs = hll_registers(df, group_cols, value_col, p=p)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {r_bits + 1} - reg)")
        ).alias("_s_present"),
    )
    s = F.col("_s_present") + (m - F.col("n_regs")) * F.lit(pow_top)
    return agg.withColumn("_s", s).select(
        *group_cols,
        "n_regs",
        F.expr(f"cast({alpha_n} as bigint) div _s").alias("est_distinct"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    q_ppms: tuple[int, ...] = (250_000, 500_000, 750_000, 900_000),
    buckets: int = 1024,
) -> DataFrame:
    """(q_ppm, value): EXACT order-statistic quantiles without a global
    sort — the selection-beats-sort primitive for wide columns.

    Spec: for quantile q (in ppm), the value at 0-indexed rank
    k = (q_ppm · (n−1)) // 10⁶ of the ascending non-null values — the
    same row a full ``ORDER BY ... OFFSET k`` would return (that IS
    the oracle), ties resolved by value equality so the answer is
    deterministic regardless of partitioning.

    Plan: (1) one aggregate for (n, min, max); (2) one histogram
    aggregate over ``buckets`` equal-width bins — the bin boundaries
    are internal float scaffolding and CANNOT affect the answer, only
    which rows round 3 touches (the jaccard_pairs_prefix argument:
    same output, cheaper plan); (3) rank the target buckets' rows only
    (a window over ~n/buckets rows per target) and pick the in-bucket
    rank.  Two driver hops of bucket-count arrays versus a full-data
    sort+exchange; at 10^12 rows the histogram pass is map-side
    combined into ``buckets`` longs per task.  Degenerate all-equal
    columns short-circuit after round 1."""
    import math

    vals = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .where(F.col(value_col).isNotNull())
    )
    vals = vals.persist()
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).collect()[0]
    n, mn, mx = int(stats["n"]), float(stats["mn"]), float(stats["mx"])
    ks = sorted({(q * (n - 1)) // 1_000_000 for q in q_ppms})
    spark = df.sparkSession
    if mn == mx:
        vals.unpersist()
        return spark.createDataFrame(
            [(q, mn) for q in sorted(q_ppms)], "q_ppm long, value double"
        )
    width = (mx - mn) / buckets
    bexpr = F.least(
        F.floor((F.col("v") - F.lit(mn)) / F.lit(width)),
        F.lit(buckets - 1),
    ).cast("long")
    hist = dict(
        (int(r["b"]), int(r["c"]))
        for r in vals.select(bexpr.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    targets = {}  # bucket -> [(k, in-bucket rank)]
    cum = 0
    ki = 0
    for b in range(buckets):
        c = hist.get(b, 0)
        while ki < len(ks) and cum + c > ks[ki]:
            targets.setdefault(b, []).append((ks[ki], ks[ki] - cum))
            ki += 1
        cum += c
    bucket_list = sorted(targets)
    sub = vals.withColumn("_b", bexpr).where(F.col("_b").isin(bucket_list))
    w = Window.partitionBy("_b").orderBy("v")
    ranked = sub.withColumn("_rn", F.row_number().over(w) - 1)
    picks = {}
    conds = None
    for b, pairs in targets.items():
        for k, rin in pairs:
            c = (F.col("_b") == b) & (F.col("_rn") == rin)
            conds = c if conds is None else (conds | c)
    rows = ranked.where(conds).select("_b", "_rn", "v").collect()
    by_key = {(int(r["_b"]), int(r["_rn"])): float(r["v"]) for r in rows}
    for b, pairs in targets.items():
        for k, rin in pairs:
            picks[k] = by_key[(b, rin)]
    vals.unpersist()
    out = [
        (q, picks[(q * (n - 1)) // 1_000_000]) for q in sorted(q_ppms)
    ]
    return spark.createDataFrame(out, "q_ppm long, value double")
