"""Quantized logistic-style classifier training over a DataFrame.

The missing "train the quality classifier on the corpus itself" piece of
the LLM-data-pipeline family (alongside the Naive-Bayes scorer in
operators/text.py): batch gradient descent where EVERY quantity is an
int64, so the whole optimization replays bitwise in any engine — the
contract query's DuckDB oracle unrolls the same iterations as chained
CTEs and matches hash-for-hash.

Numerics (all integer, all engine-portable):

* features ``x_j`` are small ints (the contract uses per-mille text
  ratios, centered by fixed offsets so gradients don't all point the
  same way); labels are 0/1.
* the link is the hard sigmoid ``p = clamp(H/2 + z >> shift, 0, H)``
  with ``H = 2^16`` and ``z = sum_j w_j x_j``; the floor-shift of the
  possibly-negative ``z`` is computed as ``shiftright(z + C, shift) - K``
  with ``C = K << shift`` and ``K = 2^32`` — adding a multiple of
  ``2^shift`` commutes with the shift exactly, and ``z + C`` is
  non-negative, so JVM ``shiftright``, DuckDB ``//`` and Python ``//``
  all agree (the division-floor discipline from PLANS.md).
* gradient ``g_j = sum(p - y*H) * x_j`` is an exact int64 SUM —
  order-independent, unlike a float sum, which is what makes the
  distributed aggregation deterministic.
* the driver-side update ``w_j -= trunc(g_j / (n * lr_den))`` uses
  TRUNCATING division (sign-split integer division, no floats), because
  that is what both SQL engines do on integer operands: Spark ``div``
  truncates toward zero and — measured, contrary to its float ``//``
  semantics — DuckDB's integer ``//`` truncates too (``-7//2 = -3``).
  Python's ``//`` floors, so the operator must NOT use it on the
  (frequently negative) gradients.

Scale shape: the feature projection is computed once and cached; each
iteration is ONE partially-aggregatable d-column SUM (map-side combine,
no shuffle of rows — only d longs per partition cross the wire) and the
driver holds d weights.  At 100 TB that is K scans of a cached skinny
projection with an 8-long all-reduce per pass — the same discipline as
operators/kmeans.py (k x dim centroid hops).

No reference analog (the reference is a geometry library); public
knowledge: standard batch GD + hard-sigmoid quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

H = 1 << 16
HALF = H >> 1
_K = 1 << 32


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero (SQL semantics; Python
    ``//`` floors and would disagree on negative gradients)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _p_expr(w: list[int], feature_cols: list[str], shift: int):
    z = None
    for wj, c in zip(w, feature_cols):
        term = F.lit(int(wj)) * F.col(c).cast("long")
        z = term if z is None else z + term
    c_off = F.lit(_K << shift)
    floor_div = F.shiftright(z + c_off, shift) - F.lit(_K)
    return F.greatest(F.lit(0), F.least(F.lit(H), F.lit(HALF) + floor_div))


def logreg_train_quantized(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    iters: int = 20,
    lr_den: int = 200,
    shift: int = 12,
) -> tuple[list[int], int, int]:
    """Train on integer features / 0-1 labels; returns
    ``(weights, n_correct_final, n_rows)``.

    ``df`` is materialized once (localCheckpoint) so the K passes scan
    a cached skinny projection instead of re-deriving features.  Raises
    if any weight grows past the offset-trick budget (|z| must stay
    below ``_K << shift``), so the exactness contract cannot silently
    decay.
    """
    cols = [F.col(c).cast("long").alias(c) for c in feature_cols]
    feats = df.select(F.col(label_col).cast("long").alias("_y"), *cols)
    feats = feats.localCheckpoint(eager=True)

    d = len(feature_cols)
    w = [0] * d
    n = None
    budget = (_K << shift) // 2
    for _ in range(int(iters)):
        err = _p_expr(w, feature_cols, shift) - F.col("_y") * F.lit(H)
        aggs = [
            F.sum(err * F.col(c)).alias(f"g{j}")
            for j, c in enumerate(feature_cols)
        ]
        row = feats.agg(*aggs, F.count(F.lit(1)).alias("n")).collect()[0]
        n = int(row["n"])
        if n == 0:
            raise ValueError("empty training input")
        w = [
            int(w[j]) - _trunc_div(int(row[f"g{j}"]), n * int(lr_den))
            for j in range(d)
        ]
        zmax = sum(abs(int(wj)) for wj in w) * (1 << 20)
        if zmax >= budget:
            raise OverflowError(
                "weights exceed the floor-shift offset budget; lower the "
                "learning rate or raise the offset"
            )

    z = None
    for wj, c in zip(w, feature_cols):
        term = F.lit(int(wj)) * F.col(c)
        z = term if z is None else z + term
    pred = (z >= 0).cast("long")
    n_correct = int(
        feats.agg(
            F.sum((pred == F.col("_y")).cast("long")).alias("ok")
        ).collect()[0]["ok"]
    )
    return w, n_correct, n
