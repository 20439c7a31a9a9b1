"""KMV distinct sketch: exactness below k, estimator accuracy above k,
and the plan shape that makes it shuffle-light (partial
WindowGroupLimit below the exchange)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_spark.operators.sketches import KMV_HASH_SQL, kmv_distinct


def _hash(v: np.ndarray) -> np.ndarray:
    return (v * 2654435761 + 12345) % 4294967296


def test_kmv_exact_below_k(spark):
    rows = [(g, int(u)) for g in ("a", "b") for u in range(10)]
    df = spark.createDataFrame(rows, "grp string, user_id long")
    out = {
        r["grp"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(df, ["grp"], "user_id", k=32).collect()
    }
    assert out == {"a": (10, 10), "b": (10, 10)}


def test_kmv_estimate_matches_reference_formula(spark):
    rng = np.random.default_rng(3)
    users = rng.integers(0, 5000, 4000)
    df = spark.createDataFrame(
        [("g", int(u)) for u in users], "grp string, user_id long"
    )
    k = 32
    row = kmv_distinct(df, ["grp"], "user_id", k=k).collect()[0]
    hs = np.unique(_hash(np.unique(users)))
    kth = int(np.sort(hs)[k - 1])
    want = ((k - 1) * 4294967296) // kth
    assert row["n_kept"] == k
    assert row["est_distinct"] == want
    # estimator sanity: within 3/sqrt(k) relative error of the truth
    truth = len(np.unique(users))
    assert abs(row["est_distinct"] - truth) / truth < 3 / np.sqrt(k)


def test_kmv_duplicate_hash_collapse(spark):
    # two users hashing to the same value count once (KMV is defined
    # over the distinct HASH set)
    # h(u) = h(u + 2^32 / gcd) is impossible for distinct small ids, so
    # force a collision via the modulus: u and u + 4294967296 collide
    # only if the multiply wraps identically — instead just feed literal
    # duplicate users, which must also collapse
    rows = [("g", 7)] * 5 + [("g", 8)] * 3
    df = spark.createDataFrame(rows, "grp string, user_id long")
    row = kmv_distinct(df, ["grp"], "user_id", k=8).collect()[0]
    assert (row["n_kept"], row["est_distinct"]) == (2, 2)


def test_kmv_plan_has_partial_window_group_limit(spark):
    df = spark.range(1000).select(
        (F_col_id() % 10).alias("grp"), F_col_id().alias("user_id")
    )
    plan = (
        kmv_distinct(df, ["grp"], "user_id", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id")


def _pair_spec(vals_a, vals_b, k):
    """Pure-python replay of the merged-KMV pair estimator spec."""
    ha = set(np.unique(_hash(np.unique(vals_a))).tolist())
    hb = set(np.unique(_hash(np.unique(vals_b))).tolist())
    ka = set(sorted(ha)[:k])
    kb = set(sorted(hb)[:k])
    union = sorted(ka | kb)
    topk = union[:k]
    k_used = len(topk)
    matches = sum(1 for h in topk if h in ka and h in kb)
    est_j = matches * 1_000_000 // k_used
    if len(union) < k:
        est_u = len(union)
    else:
        est_u = ((k - 1) * 4294967296) // topk[-1]
    return k_used, matches, est_j, est_u


def test_kmv_pair_similarity_matches_spec(spark):
    from geo_spark.operators.sketches import kmv_pair_similarity

    rng = np.random.default_rng(7)
    groups = {
        "a": rng.integers(0, 900, 1500),
        "b": rng.integers(300, 1200, 1500),
        "c": rng.integers(0, 40, 200),  # below k: exact tier
    }
    rows = [(g, int(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, item long")
    k = 64
    got = {
        (r["g1"], r["g2"]): (
            r["k_used"],
            r["matches"],
            r["est_jaccard_ppm"],
            r["est_union"],
        )
        for r in kmv_pair_similarity(df, "grp", "item", k=k).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for g1, g2 in got:
        assert got[(g1, g2)] == _pair_spec(groups[g1], groups[g2], k), (
            g1,
            g2,
        )


def test_kmv_pair_jaccard_accuracy(spark):
    from geo_spark.operators.sketches import kmv_pair_similarity

    rng = np.random.default_rng(11)
    a = np.unique(rng.integers(0, 2000, 3000))
    b = np.unique(rng.integers(1000, 3000, 3000))
    truth = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    df = spark.createDataFrame(rows, "grp string, item long")
    row = kmv_pair_similarity(df, "grp", "item", k=256).collect()[0]
    est = row["est_jaccard_ppm"] / 1e6
    assert abs(est - truth) < 3.0 / np.sqrt(256) + 0.02
    assert abs(row["est_union"] - len(np.union1d(a, b))) < 0.25 * len(
        np.union1d(a, b)
    )


def _md5_mod(v, salt: str, mod: int) -> int:
    import hashlib

    h = hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:13]
    return int(h, 16) % mod


def test_md5_mod_sql_matches_python(spark):
    from geo_spark.operators.sketches import md5_mod_sql

    df = spark.createDataFrame([(i,) for i in range(50)], "v long")
    got = [
        r["h"]
        for r in df.select(
            F_expr(md5_mod_sql("v", "s7", 997)).alias("h")
        ).orderBy("v").collect()
    ]
    assert got == [_md5_mod(i, "s7", 997) for i in range(50)]


def test_md5_mod_duckdb_twin():
    import duckdb

    from geo_spark.operators.sketches import md5_mod_duckdb_sql

    expr = md5_mod_duckdb_sql("v", "s7", 997)
    got = duckdb.sql(
        f"SELECT {expr} AS h FROM (SELECT unnest(range(50)) AS v) ORDER BY v"
    ).fetchall()
    assert [g[0] for g in got] == [_md5_mod(i, "s7", 997) for i in range(50)]


def _cms_spec(rows, depth, width):
    """Pure-python CMS: dict[(grp, d, bucket)] -> count."""
    c = {}
    for g, it in rows:
        for d in range(depth):
            b = _md5_mod(it, f"cms{d}", width)
            c[(g, d, b)] = c.get((g, d, b), 0) + 1
    return c


def test_cms_sketch_matches_spec(spark):
    from geo_spark.operators.sketches import cms_sketch

    rng = np.random.default_rng(5)
    rows = [("g", int(v)) for v in rng.integers(0, 30, 500)] + [
        ("h", int(v)) for v in rng.integers(0, 10, 200)
    ]
    df = spark.createDataFrame(rows, "grp string, item long")
    got = {
        (r["grp"], r["d"], r["bucket"]): r["cnt"]
        for r in cms_sketch(df, ["grp"], "item", depth=3, width=64).collect()
    }
    assert got == _cms_spec(rows, 3, 64)


def test_cms_heavy_hitters_exact_and_superset(spark):
    """Output == true heavy hitters (exact counts), and est >= exact."""
    from collections import Counter

    from geo_spark.operators.sketches import cms_heavy_hitters

    rng = np.random.default_rng(9)
    # skewed: a few hot items over a wide tail (forces collisions at
    # width=32 so est > exact somewhere, yet output must stay exact)
    vals = list(rng.zipf(1.6, 4000) % 500)
    rows = [("g", int(v)) for v in vals]
    truth = {
        it: n for it, n in Counter(int(v) for v in vals).items() if n >= 50
    }
    df = spark.createDataFrame(rows, "grp string, item long")
    got = {
        r["item"]: (r["est_count"], r["n_exact"])
        for r in cms_heavy_hitters(
            df, ["grp"], "item", threshold=50, depth=3, width=32
        ).collect()
    }
    assert {k: v[1] for k, v in got.items()} == truth
    assert all(est >= ex for est, ex in got.values())


def test_bloom_semi_join_exact_and_fp_bound(spark):
    from geo_spark.operators.sketches import bloom_semi_join

    big = spark.createDataFrame([(i,) for i in range(20000)], "k long")
    probe = spark.createDataFrame(
        [(i * 7,) for i in range(500)], "pk long"
    )
    out = bloom_semi_join(big, "k", probe, "pk", bits_log2=14, n_hashes=4)
    got = sorted(r["k"] for r in out.collect())
    want = sorted({i * 7 for i in range(500)} & set(range(20000)))
    assert got == want  # no false negatives, refine removes positives


def test_bloom_prefilter_selectivity(spark):
    """The literal-array prefilter alone (before refine) passes members
    plus a small FP fraction — the scan-side work bound."""
    from geo_spark.operators.sketches import bloom_semi_join

    big = spark.createDataFrame([(i,) for i in range(20000)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(500)], "pk long")
    out = bloom_semi_join(big, "k", probe, "pk", bits_log2=16, n_hashes=4)
    # exactness (above) plus: with m=2^16, n=500, k=4 the classic FP
    # rate (1-e^{-kn/m})^k ~ 1.2e-6 -- candidate count == member count
    # almost surely; assert the refine output size as the contract
    assert out.count() == 500


def F_expr(s):
    from pyspark.sql import functions as F

    return F.expr(s)


def _hll_python(values, p=6):
    """Exact python replay of the HLL integer spec."""
    import hashlib

    from geo_spark.operators.sketches import _hll_alpha_ppm

    m = 1 << p
    r_bits = 52 - p
    pow_top = 1 << (r_bits + 1)
    regs = {}
    for v in values:
        h = int(hashlib.md5(f"hll:{v}".encode()).hexdigest()[:13], 16)
        j, w = h % m, h // m
        rank = r_bits + 1 if w == 0 else r_bits + 1 - w.bit_length()
        regs[j] = max(regs.get(j, 0), rank)
    s = sum(1 << (r_bits + 1 - r) for r in regs.values())
    s += (m - len(regs)) * pow_top
    alpha_n = (_hll_alpha_ppm(m) * m * m * pow_top) // 1_000_000
    return len(regs), alpha_n // s


def test_hll_matches_python_spec(spark):
    from geo_spark.operators.sketches import hll_distinct

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "grp": np.where(rng.integers(0, 2, 3000) == 0, "a", "b"),
            "v": rng.integers(0, 800, 3000).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["grp"]: (r["n_regs"], r["est_distinct"])
        for r in hll_distinct(df, ["grp"], "v", p=6).collect()
    }
    want = {
        g: _hll_python(sub["v"].tolist())
        for g, sub in pdf.groupby("grp")
    }
    assert got == want


def test_hll_accuracy_over_cardinalities():
    """Raw-estimator error within ~3 standard errors (1.04/sqrt(m))
    once past the linear-counting regime."""
    for true_n in (500, 2000, 10000):
        _, est = _hll_python(range(true_n), p=6)
        rel = abs(est - true_n) / true_n
        assert rel < 3 * 1.04 / (64 ** 0.5), (true_n, est)


def test_hll_registers_max_merge(spark):
    """Register tables of two halves max-merge to the whole's table —
    THE mergeability contract (what ships between partitions/windows)."""
    from geo_spark.operators.sketches import hll_registers

    vals = list(range(1000))
    half1 = spark.createDataFrame(
        [(0, v) for v in vals[:500]], "grp long, v long"
    )
    half2 = spark.createDataFrame(
        [(0, v) for v in vals[500:]], "grp long, v long"
    )
    whole = spark.createDataFrame(
        [(0, v) for v in vals], "grp long, v long"
    )
    r1 = {r["j"]: r["reg"] for r in hll_registers(half1, ["grp"], "v").collect()}
    r2 = {r["j"]: r["reg"] for r in hll_registers(half2, ["grp"], "v").collect()}
    rw = {r["j"]: r["reg"] for r in hll_registers(whole, ["grp"], "v").collect()}
    merged = {
        j: max(r1.get(j, 0), r2.get(j, 0)) for j in set(r1) | set(r2)
    }
    assert merged == rw


def test_exact_quantiles_differential(spark):
    """Histogram-selection quantiles == the sorted-array order
    statistic, on uniform, skewed, and duplicate-heavy data."""
    from geo_spark.operators.sketches import exact_quantiles

    rng = np.random.default_rng(71)
    cases = [
        rng.uniform(-5, 5, 4000),
        np.exp(rng.normal(0, 2, 3000)),           # heavy right tail
        np.repeat(rng.uniform(0, 1, 20), 150),    # massive duplicates
    ]
    qs = (100_000, 250_000, 500_000, 750_000, 990_000)
    for i, v in enumerate(cases):
        df = spark.createDataFrame([(float(x),) for x in v], "value double")
        got = {
            r["q_ppm"]: r["value"]
            for r in exact_quantiles(df, "value", qs, buckets=64).collect()
        }
        s = np.sort(v)
        want = {q: float(s[(q * (len(v) - 1)) // 1_000_000]) for q in qs}
        assert got == want, i


def test_exact_quantiles_degenerate(spark):
    from geo_spark.operators.sketches import exact_quantiles

    df = spark.createDataFrame([(3.5,)] * 50, "value double")
    got = exact_quantiles(df, "value", (500_000,)).collect()
    assert got[0]["value"] == 3.5
    one = spark.createDataFrame([(7.0,)], "value double")
    assert exact_quantiles(one, "value", (0, 1_000_000)).count() == 2
