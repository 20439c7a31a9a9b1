"""Trail-network topology: GPS traces -> snapped junction graph.

The road-network-from-traces construction (the distributed Builder
use-case, reference s2/builder.go:1-140's snap-and-assemble contract
applied to a corpus of trajectories instead of one geometry): every
consecutive event pair per user is a segment, both endpoints snap to
integer E-coordinate sites (kernel/builder.snap_latlng_e semantics,
s2/builder_snapper.go:355-505 — rounding half away from zero per
s2/util.go:21), segments between distinct sites become weighted
undirected edges, and connected components over the junction graph
(operators/dedup.dedup_clusters — the same large-star/small-star
routine that resolves near-dup clusters) identify the disconnected
sub-networks.

Scale shape (the 10^12-row deployment):

- Snapping is pure native SQL (round half away from zero is a CASE +
  FLOOR — whole-stage codegen, zero Python), applied per segment row;
  no distinct-point pre-pass is needed because the aggregate below
  collapses duplicates anyway.
- The segment pass is one window (LEAD over user, time) — partitioned
  by user, so state per task is one trajectory, never the corpus.
- The edge table aggregates to DISTINCT (site, site) pairs with a
  multiplicity weight: the only full-data shuffle carries (u, v) long
  pairs, and the graph the components routine sees is bounded by the
  number of occupied site pairs, not by trace length.
- Components run alternating large-star/small-star rounds (O(log^2 n)
  bound), each two groupBy-min + equi-join passes over the edge table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# MAX_EXP = 7 is the largest exponent whose packed site key fits int64:
# max |key| = (180*10^e) * (360*10^e + 1) + 360*10^e  ->  ~6.5e18 at e=7,
# ~6.5e20 at e=8 (past int64 max 9.22e18).  In non-ANSI Spark the long
# arithmetic would wrap SILENTLY at e>=8, colliding site keys and
# corrupting the junction graph, so the bound is a hard ValueError.
MIN_EXP = 0
MAX_EXP = 7


def snap_site_cols(
    lat: Column, lng: Column, exponent: int = 0
) -> tuple[Column, Column]:
    """(ilat, ilng) integer E-coordinate columns — the native-SQL twin
    of kernel/builder.snap_latlng_e (round half away from zero),
    codegen-inlined so snapping never leaves the JVM."""
    if not MIN_EXP <= exponent <= MAX_EXP:
        raise ValueError(
            f"exponent {exponent} out of [{MIN_EXP}, {MAX_EXP}] "
            "(site keys overflow int64 beyond E7)"
        )
    s = float(10**exponent)

    def rnd(v: Column) -> Column:
        v = v.cast("double") * s
        return (
            F.when(v >= 0, F.floor(v + 0.5))
            .otherwise(-F.floor(-v + 0.5))
            .cast("long")
        )

    return rnd(lat), rnd(lng)


def site_key_col(ilat: Column, ilng: Column, exponent: int = 0) -> Column:
    """One BIGINT per site: (ilat + 90s) * (360s + 1) + (ilng + 180s)
    — collision-free over the valid E-coordinate ranges (lng in
    (-180, 180]; a wrapped -180 and 180 are distinct sites by design,
    callers normalizing the antimeridian do so upstream).  Injective
    only while the key fits int64, i.e. exponent <= MAX_EXP=7."""
    if not MIN_EXP <= exponent <= MAX_EXP:
        raise ValueError(
            f"exponent {exponent} out of [{MIN_EXP}, {MAX_EXP}] "
            "(site keys overflow int64 beyond E7)"
        )
    s = 10**exponent
    return (ilat + 90 * s) * (360 * s + 1) + (ilng + 180 * s)


def trail_network_edges(
    df: DataFrame,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    latlng: tuple[str, str] = ("lat", "lng"),
    exponent: int = 0,
) -> DataFrame:
    """(u, v, n_segments): the weighted undirected junction graph.
    u < v site keys; segments whose endpoints snap to the SAME site
    (sub-resolution moves) are dropped — they carry no topology."""
    w = Window.partitionBy("_u").orderBy(*[F.col(c) for c in order_cols])
    la, ln = F.col(latlng[0]), F.col(latlng[1])
    ila, iln = snap_site_cols(la, ln, exponent)
    pts = df.select(
        F.col(user_col).alias("_u"),
        *[F.col(c) for c in order_cols],
        site_key_col(ila, iln, exponent).alias("_site"),
    )
    seg = pts.select(
        F.col("_site").alias("_a"),
        F.lead("_site").over(w).alias("_b"),
    ).where(F.col("_b").isNotNull() & (F.col("_a") != F.col("_b")))
    return (
        seg.select(
            F.least("_a", "_b").alias("u"),
            F.greatest("_a", "_b").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_segments"))
    )


def network_components(edges: DataFrame) -> DataFrame:
    """(rep, n_junctions, n_edges, n_segments): one row per connected
    sub-network, rep = min site key in the component.  Components via
    the shared large-star/small-star routine (O(log^2 n) round
    bound); the two rollup joins attach labels to the bounded edge
    table, never to raw segments."""
    from geo_spark.operators.dedup import dedup_clusters

    e = edges.persist()
    labels = dedup_clusters(
        e.select(F.col("u").alias("da"), F.col("v").alias("db")), key="site"
    )
    junc = labels.groupBy("rep").agg(F.count(F.lit(1)).alias("n_junctions"))
    per_edge = (
        e.join(labels.withColumnRenamed("site", "u"), "u")
        .groupBy("rep")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("n_segments").alias("n_segments"),
        )
    )
    out = junc.join(per_edge, "rep").select(
        "rep", "n_junctions", "n_edges", "n_segments"
    )
    out = out.localCheckpoint()
    e.unpersist()
    return out
