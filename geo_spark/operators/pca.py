"""Dominant-direction extraction over embedding columns: power
iteration on the (centered, integer-quantized) Gram matrix, kept
bit-deterministic so an approximate linear-algebra operator gets an
exact SQL oracle — the same engine-portability contract as
operators/kmeans.py.

Why integer: distributed float sums are partition-order dependent, so a
naive float power iteration is not even self-reproducible, let alone
oracle-checkable.  Quantizing coordinates to floor((x+1)*1e6) (the
kmeans trick: non-negative ints), centering by the floor-mean, and
accumulating dot products as exact integers (Spark DECIMAL(38,0) sums /
DuckDB HUGEINT) makes every intermediate — and the final projections —
bitwise identical on any engine and any partitioning.  The quantization
perturbs the direction by O(1e-6), irrelevant for the use cases
(dedup/whitening/outlier screens over embeddings).

Scale shape per iteration: ONE in-row zip_with dot per vector (codegen,
no shuffle), then one skinny (dim, contribution) aggregate — dim rows
out — and a driver-side rescale of the dim-length iterate (the kmeans
centroid hop; it also cuts lineage).  Nothing ever shuffles the
embedding table itself.

No reference analog (akhenakh/geo is geometry-only); this extends the
embedding-analytics family (similarity.py, kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QSCALE = 1_000_000  # coordinate quantization, matches kmeans.py
VSCALE = 1_000_000  # iterate renormalization target


def _rescale(w: list[int]) -> list[int]:
    """v <- sign(w) * (|w| * VSCALE // max|w|) — exact ints, truncating
    division on the absolute value so Spark (driver python) and the
    DuckDB oracle (// on non-negative operands) agree bit-for-bit."""
    mx = max(abs(x) for x in w)
    if mx == 0:
        return [VSCALE] + [0] * (len(w) - 1)
    return [
        (1 if x >= 0 else -1) * ((abs(x) * VSCALE) // mx) for x in w
    ]


def pca_projections(
    embeddings: DataFrame,
    dim: int,
    iterations: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(key, proj): each vector's integer projection onto the dominant
    principal direction, found by ``iterations`` of quantized power
    iteration from the deterministic all-ones start.

    Spec (exact, engine-portable):
      q[i][d]  = floor((x[i][d] + 1) * 1e6)           — non-negative ints
      m[d]     = sum_i q[i][d] // n                    — floor mean
      c[i][d]  = q[i][d] - m[d]                        — centered
      v_0      = [1e6] * dim
      repeat:  dot_i = sum_d c[i][d] * v[d]            — exact int
               w[d]  = sum_i c[i][d] * dot_i           — exact int
               v     = sign(w) * (|w| * 1e6 // max|w|)
      proj_i   = sum_d c[i][d] * v[d]
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor((x.cast("double") + F.lit(1.0)) * QSCALE).cast(
            "long"
        ),
    )
    base = embeddings.select(F.col(key), q.alias("_q"))
    base = base.localCheckpoint()  # quantize once; iterations re-scan

    # floor means per dimension (one skinny shuffle)
    sums = (
        base.select(F.posexplode("_q").alias("d", "x"))
        .groupBy("d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    means = [0] * dim
    for r in sums:
        means[int(r["d"])] = int(r["s"]) // int(r["n"])
    m_arr = F.array(*[F.lit(m).cast("long") for m in means])
    centered = base.select(
        key,
        F.zip_with("_q", m_arr, lambda x, m: x - m).alias("_c"),
    )

    v = _power_iterate(centered, dim, iterations)
    return centered.select(key, _proj_col(v).alias("proj"))


def _proj_col(v: list[int]):
    """c · v as an exact long (|c|~2e6 × 1e6 × dim stays < 2^63)."""
    v_arr = F.array(*[F.lit(x).cast("long") for x in v])
    return F.aggregate(
        F.zip_with("_c", v_arr, lambda c, vv: c * vv),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _power_iterate(
    centered: DataFrame, dim: int, iterations: int
) -> list[int]:
    """``iterations`` rounds of the integer power-iteration spec over a
    (key, _c:array<long>) DataFrame; returns the final iterate."""
    v = [VSCALE] * dim
    for _ in range(iterations):
        dot = _proj_col(v)
        w_rows = (
            centered.select(F.posexplode("_c").alias("d", "c"), dot.alias("_dot"))
            .select(
                "d",
                (
                    F.col("c").cast("decimal(19,0)")
                    * F.col("_dot").cast("decimal(19,0)")
                ).alias("_contrib"),
            )
            .groupBy("d")
            .agg(F.sum("_contrib").alias("w"))
            .collect()
        )
        w = [0] * dim
        for r in w_rows:
            w[int(r["d"])] = int(r["w"])
        v = _rescale(w)
    return v


def pca_projections2(
    embeddings: DataFrame,
    dim: int,
    iterations: int = 2,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(key, proj1, proj2): projections onto the top TWO principal
    directions — the second found by exact-integer Hotelling deflation
    of the first, then the same power iteration on the deflated rows.

    Deflation spec (exact, engine-portable; v = first final iterate,
    V2 = Σ_d v[d]² computed as an exact driver-side int and inlined):

      num[i][d] = proj1_i * v[d]                    — exact (DECIMAL/HUGEINT;
                                                      ~1e20 overflows int64)
      c2[i][d]  = c[i][d] - sign(num) * (|num| // V2)

    i.e. c2 = c - (c·v / v·v) v with every division a truncating
    integer division on a NON-NEGATIVE numerator — the one form whose
    semantics Spark FLOOR-on-abs and DuckDB ``//``-on-abs share
    bit-for-bit (same discipline as ``_rescale``).  The O(1) rounding
    residue per coordinate perturbs the second direction by O(1e-6),
    matching the quantization floor everywhere else in this module.
    Scale shape: deflation is one in-row zip_with (no shuffle); the
    second component re-runs the same skinny (dim, contrib) aggregate."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor((x.cast("double") + F.lit(1.0)) * QSCALE).cast(
            "long"
        ),
    )
    base = embeddings.select(F.col(key), q.alias("_q"))
    base = base.localCheckpoint()

    sums = (
        base.select(F.posexplode("_q").alias("d", "x"))
        .groupBy("d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    means = [0] * dim
    for r in sums:
        means[int(r["d"])] = int(r["s"]) // int(r["n"])
    m_arr = F.array(*[F.lit(m).cast("long") for m in means])
    centered = base.select(
        key,
        F.zip_with("_q", m_arr, lambda x, m: x - m).alias("_c"),
    )

    v1 = _power_iterate(centered, dim, iterations)
    v2sq = sum(x * x for x in v1)  # ≤ dim·1e12: exact python int, inlined
    v1_arr = F.array(*[F.lit(x).cast("long") for x in v1])
    p1 = _proj_col(v1)

    def deflate(c, vv):
        num = p1.cast("decimal(38,0)") * vv.cast("decimal(38,0)")
        an = F.abs(num)
        v2l = F.lit(v2sq).cast("decimal(38,0)")
        # exact integral quotient: subtract the exact decimal remainder
        # first, so the decimal division yields an exact integer (a bare
        # floor(a/b) rounds half-up at scale 6 — wrong within 5e-7 of an
        # integer boundary, a real hazard at 1e5+ elements)
        quot = ((an - an % v2l) / v2l).cast("long")
        return c - F.when(num >= 0, quot).otherwise(-quot)

    defl = centered.select(
        key,
        p1.alias("proj1"),
        F.zip_with("_c", v1_arr, deflate).alias("_c"),
    )
    defl = defl.localCheckpoint()  # second iteration re-scans

    u = _power_iterate(defl, dim, iterations)
    return defl.select(key, "proj1", _proj_col(u).alias("proj2"))
