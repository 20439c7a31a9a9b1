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

    v = [VSCALE] * dim
    for _ in range(iterations):
        v_arr = F.array(*[F.lit(x).cast("long") for x in v])
        dot = F.aggregate(
            F.zip_with("_c", v_arr, lambda c, vv: c * vv),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
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

    v_arr = F.array(*[F.lit(x).cast("long") for x in v])
    proj = F.aggregate(
        F.zip_with("_c", v_arr, lambda c, vv: c * vv),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return centered.select(key, proj.alias("proj"))
