"""Benchmark harness: headline pipelines at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

Headline work (the north-star surface):
  pages_pipeline   read -> geotag extract -> S2 encode -> tile counts
  pages_pip_join   pages x 50 city loops (covering join + parity refine)
  + a representative subset of the driver-contract queries.

The deterministic pages table is materialized once per size under /tmp
(input prep, not engine work — the target cluster reads Iceberg).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "q_s2_tile_faceij_l8",
    "q_tpch_q1",
    "q_cap_join_counts",
    "q_loop_pip_join",
    "q_knn_cities",
    "q_knn_ring_events",
    "q_minhash_lsh_pairs",  # the scale path; exact ngram join is the sf0.01 oracle query
    "q_cosine_topk",
    "q_hex_tile_counts",
    "q_stratified_sample",  # mixture sampling: partial WindowGroupLimit plan
    "q_geohash_rollup",  # byte-exact web-grid tokens, pure codegen projection
    "q_domain_stats",  # URL -> registered-domain rollup, native SQL
    "q_spacetime_pairs",  # banded (cell, time-bucket) pair join
    "q_link_pagerank",  # 3 power iterations, one shuffle each
    "q_geo_sessions",  # per-user sessionization, one shuffle, no Python
    "q_tile_user_kmv",  # KMV distinct-users-per-tile sketch, rank-k window
    "q_repetition_signals",  # Gopher repetition filters, zero Python nodes
    "q_tfidf_topk",  # tf*ln(N/df) keywords, partial WindowGroupLimit
    "q_weighted_sample",  # A-ES weighted draw, partial WindowGroupLimit
    "q_event_map_match",  # GPS snap: covering candidates + argmin refine
    "q_zonal_stats",  # raster->vector zonal aggregation per cap zone
    "q_event_asof",  # as-of attribution: union-and-carry single shuffle
    "q_trending_tiles",  # decayed trending: one map-combined shuffle
    "q_heavy_hitters",  # Count-Min probe + exact refine
    "q_reverse_geocode",  # PIP assign + broadcast nearest-centroid fallback
    "q_crawl_pipeline",  # WARC parse -> robots policy -> dedup -> rollup
    "q_link_trustrank",  # personalized PageRank, one shuffle/iter
    "q_bigram_nll",  # corpus bigram LM scoring, integer fixed-point
    "q_weighted_paths",  # delta-frontier Bellman-Ford, frontier-sized rounds
    "q_redirect_resolve",  # pointer jumping, O(log chain) self-joins
    "q_host_graph",  # domain-pair count + reciprocity self-join
    "q_snapshot_diff",  # full-outer diff over skinny (key, fp) rows
    "q_cdc_apply",  # struct-max merge, no window sort
    "q_tf_dot_pairs",  # posting-list join with stop-term valve
    "q_salted_pip_join",  # Zipfian hot-cell fixture through auto_salt_layer
    "q_semantic_dedup",  # SemDeDup: kmeans -> in-cluster cosine -> CC
    "q_hmm_map_match",  # Viterbi trace snap: trajectory-sized DP groups
    "q_zorder_layout",  # equi-depth curve layout + skipping manifest
    "q_toponym_resolve",  # gazetteer geocoding, two broadcast stages
    "q_kneser_ney_nll",  # KN-smoothed bigram LM scoring
    "q_incremental_dedup",  # new-batch probe of a persisted LSH index
    "q_topic_clusters",  # text -> JL sign vectors -> Lloyd k-means chain
    "q_mercator_tiles",  # Mercator projection + zoom-4 tile assignment
    "q_tile_slope",  # Horn-stencil gradient, scatter-form raster algebra
    "q_trail_network",  # snap -> junction graph -> large/small-star CC
    "q_region_route_length",  # covering-join clip+measure overlay
    "q_tile_trend_band",  # Sen slope + rank confidence band, portable isqrt
    "q_tile_changepoint",  # exact-integer CUSUM argmax, windows only
    "q_emerging_hotspots",  # per-day Gi* x Mann-Kendall classification
    "q_quality_drift",  # per-source quality trend monitor
]


def throttle_probe(n: int = 4096) -> float:
    """Canonical VM-health probe (VERDICT r4 task 4): one float64
    ``n x n`` matmul, timed after a small warm-up.  On this sandbox a
    healthy window reads ~0.5-0.8 s; >1.5 s means the shared VM is
    throttled and wall-clock numbers from that window are suspect
    (BASELINE.md §5).  Emitted in the bench JSON as ``probe_s`` so
    BENCH_r{N}.json is interpretable without PLANS.md."""
    import numpy as np

    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 512))
    w @ w  # warm BLAS / fault code pages
    a = rng.standard_normal((n, n))
    t0 = time.monotonic()
    a @ a
    return round(time.monotonic() - t0, 3)


def bench_session(cpus: int, master: str | None = None):
    """Bench session: task sizing scaled to the small fixture so the
    parallelism profile matches the 100 TB deployment (there, default
    128 MB scan partitions give each core full batches; at 82 MB total
    the default would yield ~5 tasks and idle 27 of 32 cores).  ``master``
    overrides the default local[cpus] (e.g. local-cluster[4,8,3072] for
    the multi-JVM scaling protocol)."""
    from geo_spark.session import get_spark

    spark = get_spark(master=master or f"local[{cpus}]", shuffle_partitions=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def materialize_pages(spark, n_pages: int, cpus: int) -> str:
    from geo_spark.sources.pages import synth_pages

    path = f"/tmp/geo_spark_bench/pages_{n_pages}"
    if not os.path.exists(path + "/_SUCCESS"):
        synth_pages(spark, n_pages, partitions=cpus * 4).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_pages_pipeline(spark, pages_path: str) -> int:
    from geo_spark.operators.tiling import tile_counts
    from geo_spark.sources.extract import extract_encode

    pages = spark.read.parquet(pages_path)
    return tile_counts(extract_encode(pages), 10, sort=False).count()


def run_encode_kernel(spark, n_rows: int, cpus: int) -> int:
    """Compute-bound engine job: ids -> deterministic lat/lng (codegen) ->
    full Hilbert encode (vectorized UDF) -> level-10 tile count with
    map-side combine.  ~16 bytes/row of Arrow traffic vs ~350 ns/row of
    kernel arithmetic, so this isolates engine+dispatch scaling from the
    sandbox's saturated memory bandwidth (BASELINE.md §5)."""
    from pyspark.sql import functions as F

    from geo_spark.functions import sql as s2sql
    from geo_spark.functions.s2 import s2_cellid
    from geo_spark.operators.geo_noise import with_geo_noise

    df = with_geo_noise(
        spark.range(0, n_rows, 1, cpus * 4).withColumnRenamed("id", "row_id"),
        "row_id",
    )
    enc = df.withColumn("cell_id", s2_cellid(F.col("lat"), F.col("lng")))
    return (
        enc.groupBy(s2sql.parent(F.col("cell_id"), 10).alias("tile"))
        .count()
        .count()
    )


def run_pip_kernel(spark, n_rows: int, cpus: int, n_verts: int = 256) -> int:
    """Compute-dominated engine job: each row runs the crossing-parity
    containment test against a 256-vertex loop (~n_verts triage ops per
    row vs 16 bytes of Arrow traffic — compute:bandwidth ~400:1).  This
    is the dense-PIP-refine workload class; it tracks raw CPU scaling
    where the extract/encode path is capped by the sandbox's memory
    bandwidth (BASELINE.md §5)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geo_spark.kernel import cellid as ckm
    from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside
    from geo_spark.operators.geo_noise import with_geo_noise
    from geo_spark.sources.layers import regular_loop_vertices

    verts = regular_loop_vertices(30.0, 10.0, 1.0, n_verts)  # ~continent-size
    oi = loop_origin_inside(verts)

    df = with_geo_noise(
        spark.range(0, n_rows, 1, cpus * 4).withColumnRenamed("id", "row_id"),
        "row_id",
    )

    def fn(batches):
        import numpy as np

        for pdf in batches:
            x, y, z = ckm.latlng_to_xyz(
                pdf["lat"].to_numpy(np.float64), pdf["lng"].to_numpy(np.float64)
            )
            pts = np.stack([x, y, z], axis=1)
            inside = loop_contains_points(verts, oi, pts)
            yield pd.DataFrame({"n": [int(inside.sum())]})

    return int(df.mapInPandas(fn, "n long").agg(F.sum("n")).collect()[0][0])


def run_tile_kernel_jvm(spark, n_rows: int, cpus: int, level: int = 8) -> int:
    """Pure-JVM engine job (zero Python workers): ids -> deterministic
    lat/lng -> the S2 quadratic-projection chain (xyz -> face -> u,v ->
    s,t -> i,j) entirely in Spark SQL expressions -> groupBy
    (face, i>>k, j>>k) tile counts.  Grouping by shifted (face, i, j) is
    mathematically identical to grouping by Parent(cell_id, level)
    (Hilbert numbering permutes within a level, never regroups), so this
    IS the tile pipeline's semantics on the engine's native-SQL path —
    whole-stage codegen, values in registers, the job class that
    multiplies with executors even on the bandwidth-starved sandbox."""
    from pyspark.sql import functions as F

    from geo_spark.operators.geo_noise import LAT_SQL, LNG_SQL

    shift = 30 - level
    df = (
        spark.range(0, n_rows, 1, cpus * 4)
        .withColumnRenamed("id", "row_id")
        .selectExpr(
            f"{LAT_SQL.format(id='row_id')} as lat",
            f"{LNG_SQL.format(id='row_id')} as lng",
        )
        .selectExpr(
            "cos(radians(lng))*cos(radians(lat)) as x",
            "sin(radians(lng))*cos(radians(lat)) as y",
            "sin(radians(lat)) as z",
        )
        .selectExpr(
            "*",
            "CASE WHEN abs(x) > abs(y) AND abs(x) > abs(z) THEN 0 "
            "     WHEN abs(y) > abs(z) THEN 1 ELSE 2 END as axis",
        )
        .selectExpr(
            "*",
            "axis + CASE WHEN (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0 "
            "            THEN 3 ELSE 0 END as face",
        )
        .selectExpr(
            "face",
            "CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z "
            "          WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END as u",
            "CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z "
            "          WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END as v",
        )
        .selectExpr(
            "face",
            "CASE WHEN u >= 0 THEN 0.5*sqrt(1+3*u) ELSE 1-0.5*sqrt(1-3*u) END as s",
            "CASE WHEN v >= 0 THEN 0.5*sqrt(1+3*v) ELSE 1-0.5*sqrt(1-3*v) END as t",
        )
        .selectExpr(
            "face",
            "CAST(least(greatest(floor(1073741824.0*s), 0), 1073741823) AS BIGINT) as i",
            "CAST(least(greatest(floor(1073741824.0*t), 0), 1073741823) AS BIGINT) as j",
        )
    )
    return (
        df.groupBy(
            "face",
            F.shiftrightunsigned("i", shift).alias("ti"),
            F.shiftrightunsigned("j", shift).alias("tj"),
        )
        .count()
        .count()
    )


def build_city_layer(spark):
    from geo_spark.operators.spatial_join import build_layer
    from geo_spark.sources.layers import city_loop_regions

    return build_layer(spark, city_loop_regions(50), max_cells=8)


def run_pages_pip_join(spark, pages_path: str, layer=None) -> int:
    """Join throughput: layer prep is a once-per-deployment cost, so pass
    a prebuilt layer to time the scan->extract->join->refine path alone."""
    from geo_spark.operators.spatial_join import spatial_join
    from geo_spark.sources.extract import extract_encode

    if layer is None:
        layer = build_city_layer(spark)
    pages = spark.read.parquet(pages_path)
    enc = extract_encode(pages, keep=("url",))
    return spatial_join(
        enc, layer, point_key="url", latlng=("lat", "lng")
    ).count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))

    import __spark_entry__ as entrymod
    from geo_spark.session import get_spark

    spark = bench_session(cpus)

    probes: dict[str, float] = {"start": throttle_probe()}
    timings: dict[str, float] = {}
    raw_runs: dict[str, list] = {}
    pages_path = materialize_pages(spark, n_pages, cpus)

    # Warm-up: Python-worker imports + JIT are per-deployment costs, not
    # per-job throughput; steady state is the number a cluster sustains.
    # Flagship metric: best of FIVE timed runs with the spread recorded
    # (this shared VM's burst windows vary identical runs up to 3x,
    # BASELINE.md §5 — on an idle box the same job reaches 0.82s /
    # 1.23M pages/s; the extra reps let the bench find an uncontended
    # window inside the longer suite run).
    run_pages_pipeline(spark, pages_path)
    flagship_runs = []
    for _ in range(5):
        t0 = time.monotonic()
        n_tiles = run_pages_pipeline(spark, pages_path)
        flagship_runs.append(round(time.monotonic() - t0, 3))
    dt = min(flagship_runs)
    timings["pages_pipeline"] = round(dt, 3)
    pages_per_sec = round(n_pages / dt, 1)
    probes["post_flagship"] = throttle_probe()

    t0 = time.monotonic()
    layer = build_city_layer(spark)
    timings["city_layer_build"] = round(time.monotonic() - t0, 3)
    # First execution of the join plan pays one-time costs (join-stage
    # codegen, broadcast build, worker module imports) plus whatever
    # burst window this shared VM is in (BASELINE.md §5: identical runs
    # vary up to 3x).  Steady state is what a cluster sustains: warm
    # once untimed, then record the better of two timed runs.
    run_pages_pip_join(spark, pages_path, layer)
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        n_join = run_pages_pip_join(spark, pages_path, layer)
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    timings["pages_pip_join"] = round(best, 3)

    queries = entrymod.queries()
    ring_stats: list = []
    knn_tier = "broadcast_ring"  # 5000 targets routes the middle tier
    def run_ring(stats: list) -> None:
        # run the ring path directly so per-round stats land in the
        # bench record (rounds + seconds each); since round 3 the 5000-
        # target fixture routes the shuffle-free broadcast-ring tier, so
        # stats stay empty (no driver-synchronized rounds exist)
        from pyspark.sql import functions as F

        from geo_spark.operators.geo_noise import with_geo_noise
        from geo_spark.operators.knn import knn_join

        ev = with_geo_noise(
            spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id"),
            "event_id",
        )
        tg = with_geo_noise(
            spark.range(5000).select(F.col("id").alias("tid")), "(tid + 500000)"
        )
        knn_join(
            ev,
            tg,
            k=3,
            point_key="event_id",
            target_key="tid",
            straggler_brute_cells=25_000_000,
            stats=stats,
        ).count()

    # Steady state, same rationale as the pip join: best of two timed
    # runs per headline query (the VM's burst windows otherwise dominate
    # first executions).
    for name in HEADLINE_QUERIES:
        best = None
        runs = []
        for attempt in range(2):
            t0 = time.monotonic()
            if name == "q_knn_ring_events":
                stats: list = []
                run_ring(stats)
            else:
                queries[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            runs.append(round(dt, 3))
            if best is None or dt < best:
                best = dt
                if name == "q_knn_ring_events":
                    ring_stats = stats
        timings[name] = round(best, 3)
        raw_runs[name] = runs

    probes["end"] = throttle_probe()
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment pipeline wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "pages_per_sec": pages_per_sec,
                "pages_pipeline_runs": flagship_runs,
                "n_pages": n_pages,
                "n_tiles": n_tiles,
                "pip_join_rows": n_join,
                "knn_tier": knn_tier,
                "knn_ring_rounds": ring_stats,
                "cpus": cpus,
                # VM-health attribution (VERDICT r4 task 4): matmul probe
                # at start / after flagship / at end.  Healthy ~0.5-0.8s;
                # >1.5s = throttled window, wall-clock numbers suspect.
                "probe_s": probes,
                "query_runs": raw_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
