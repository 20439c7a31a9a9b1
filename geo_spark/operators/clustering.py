"""Density-based spatial clustering (DBSCAN) over point tables.

The spatial-only sibling of the spacetime co-occurrence join
(operators/spacetime.py) feeding the same connected-components engine
that resolves near-dup document clusters (operators/dedup.py:
dedup_clusters) — the classic "cluster the geotagged events / pages"
workload (reference scope: the within-distance query family of
s2/edge_query.go composed into DBSCAN semantics; the reference has no
clustering operator, this is part of the training-data-pipeline surface
the engine adds on top).

DBSCAN definition implemented (deterministic variant):

- ``|N_eps(p)| >= min_pts`` counting p itself makes p a **core** point
  (degree >= min_pts - 1 over strict neighbors);
- clusters are connected components of the core-core eps-graph;
- a non-core point within eps of >= 1 core is a **border** point and
  joins the cluster of its minimum-rep core neighbor (standard DBSCAN
  leaves border assignment order-dependent; taking the MIN rep makes
  the result a pure function of the input, which the SQL oracle
  replays);
- everything else is noise (not returned).

Scale shape (100 TB):

- eps-pairs come from the banded cell equi-join of spacetime.py minus
  the time axis: home cell at the finest level with MinWidth >= eps,
  probes = 9-neighborhood via the DISTINCT-cell adjacency broadcast,
  chord^2 refine in pure codegen.  No theta join, no Python per pair.
- degrees / core flags are one groupBy over the pair set;
- components run large-star/small-star rounds (O(log^2 n) bound,
  rounds, dedup_clusters) — no driver-side graph;
- border attachment is one more equi-join + min-groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geo_spark.functions import sql as s2sql
from geo_spark.functions.s2 import s2_cellid, s2_xyz
from geo_spark.kernel.regions import chord2_from_angle
from geo_spark.operators.dedup import dedup_clusters
from geo_spark.operators.spacetime import _neighbor_table, spacetime_level


def within_distance_pairs(
    points: DataFrame,
    radius_rad: float,
    key: str = "event_id",
    latlng: tuple[str, str] = ("lat", "lng"),
    level: int | None = None,
) -> DataFrame:
    """Self-join: unordered (a, b, chord2), a < b, spherical distance
    <= radius.  Banded cell equi-join + codegen refine (see module
    docstring); exactly-once via canonicalized-pair dedup, mirroring
    spacetime_join's corner-asymmetry rationale."""
    if level is None:
        level = spacetime_level(radius_rad)
    limit2 = chord2_from_angle(radius_rad)
    src = points.select(key, *latlng)
    want_parts = points.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < want_parts:
        src = src.repartition(want_parts)
    p3 = F.col("_p3")
    base = (
        src.withColumn("_p3", s2_xyz(F.col(latlng[0]), F.col(latlng[1])))
        .withColumn(
            "cell",
            s2sql.parent(s2_cellid(F.col(latlng[0]), F.col(latlng[1])), level),
        )
        .select(
            key,
            p3["x"].alias("x"),
            p3["y"].alias("y"),
            p3["z"].alias("z"),
            "cell",
        )
    )
    nbr = _neighbor_table(base.select("cell"))
    probes = base.join(F.broadcast(nbr), "cell").select(
        key, "x", "y", "z", "pcell"
    )
    home = base.select(
        F.col(key).alias("_bk"),
        F.col("x").alias("_bx"),
        F.col("y").alias("_by"),
        F.col("z").alias("_bz"),
        F.col("cell").alias("_bcell"),
    )
    chord2 = (
        (F.col("x") - F.col("_bx")) * (F.col("x") - F.col("_bx"))
        + (F.col("y") - F.col("_by")) * (F.col("y") - F.col("_by"))
        + (F.col("z") - F.col("_bz")) * (F.col("z") - F.col("_bz"))
    )
    return (
        probes.join(home, F.col("pcell") == F.col("_bcell"))
        .where(F.col(key) != F.col("_bk"))
        .withColumn("chord2", chord2)
        .where(F.col("chord2") <= F.lit(limit2))
        .select(
            F.least(F.col(key), F.col("_bk")).alias("a"),
            F.greatest(F.col(key), F.col("_bk")).alias("b"),
            "chord2",
        )
        .groupBy("a", "b")
        .agg(F.min("chord2").alias("chord2"))
    )


def geo_dbscan(
    points: DataFrame,
    eps_rad: float,
    min_pts: int,
    key: str = "event_id",
    latlng: tuple[str, str] = ("lat", "lng"),
    level: int | None = None,
) -> DataFrame:
    """(key, cluster, role): DBSCAN over the sphere.  ``cluster`` is the
    minimum core-point id of the component; ``role`` is 'core' or
    'border'; noise points are omitted."""
    pairs = within_distance_pairs(points, eps_rad, key, latlng, level)
    pairs = pairs.select("a", "b").persist()
    adj = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = adj.groupBy("a").agg(F.count(F.lit(1)).alias("n"))
    cores = deg.where(F.col("n") >= min_pts - 1).select(
        F.col("a").alias("id")
    )
    core_edges = (
        pairs.join(cores.select(F.col("id").alias("a")), "a")
        .join(cores.select(F.col("id").alias("b")), "b")
        .select(F.col("a").alias("da"), F.col("b").alias("db"))
    )
    comp = dedup_clusters(core_edges, docs=cores, key="id")
    core_rows = comp.select(
        F.col("id").alias(key),
        F.col("rep").alias("cluster"),
        F.lit("core").alias("role"),
    )
    border_rows = (
        adj.join(cores.select(F.col("id").alias("b")), "b")
        .join(
            comp.select(F.col("id").alias("b"), F.col("rep")), "b"
        )
        .join(cores.select(F.col("id").alias("a")), "a", "left_anti")
        .groupBy("a")
        .agg(F.min("rep").alias("cluster"))
        .select(
            F.col("a").alias(key),
            "cluster",
            F.lit("border").alias("role"),
        )
    )
    return core_rows.unionByName(border_rows)
