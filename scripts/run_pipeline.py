"""The flagship production job, spark-submit-able:

    spark-submit --py-files geo_spark.zip scripts/run_pipeline.py \
        --pages /path/pages --out /path/tiles --tile-level 10

pages (url, warc_ts, html, text, lang) -> geotag extract -> S2 encode ->
[optional PIP join vs the city-loop layer] -> tile assignment ->
partitioned write (bucketed by coarse tile) with the per-partition
lineage manifest — re-running after a crash redoes only missing buckets
(plans/manifest.py), the north rule's idempotent-resume contract.

In-sandbox the same file runs under plain python (it builds its own
session); under spark-submit the session comes from the launcher.
Build the --py-files archive with scripts/make_pyfiles.sh.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet dir")
    ap.add_argument("--out", required=True, help="output tiles parquet dir")
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--tile-level", type=int, default=10)
    ap.add_argument("--bucket-level", type=int, default=4)
    ap.add_argument("--join-city-loops", action="store_true")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument(
        "--backend",
        choices=("parquet", "iceberg"),
        default="parquet",
        help="storage backend: parquet dirs + manifest sidecar (default) "
        "or an Iceberg hadoop catalog (--pages/--out become table names; "
        "requires iceberg-spark-runtime on the classpath and "
        "--iceberg-warehouse)",
    )
    ap.add_argument("--iceberg-warehouse", default=None)
    args = ap.parse_args()
    manifest = args.manifest or (args.out.rstrip("/") + ".manifest.jsonl")

    from geo_spark.functions import sql as s2sql
    from geo_spark.plans.manifest import verify_manifest, write_with_manifest
    from geo_spark.session import get_spark
    from geo_spark.sources.extract import extract_encode

    from geo_spark.sources.catalog import iceberg_confs, read_table, write_table

    extra_confs = (
        iceberg_confs(args.iceberg_warehouse)
        if args.backend == "iceberg" and args.iceberg_warehouse
        else {}
    )
    spark = get_spark(
        app="geo_spark_pipeline", master=f"local[{args.cpus}]", confs=extra_confs
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.monotonic()
    pages = read_table(spark, args.pages, backend=args.backend)
    # text rides through untouched — byte-identical per url is the
    # engine's per-row invariant (BASELINE.json input_hint), asserted in
    # tests/test_pipeline_spark.py::test_text_byte_identical_passthrough.
    enc = extract_encode(pages, keep=("url", "text"))
    tiled = enc.withColumns(
        {
            "tile": s2sql.parent(F.col("cell_id"), args.tile_level),
            "bucket": s2sql.parent(F.col("cell_id"), args.bucket_level),
        }
    )

    if args.join_city_loops:
        from geo_spark.operators.spatial_join import build_layer, spatial_join
        from geo_spark.sources.layers import city_loop_regions

        layer = build_layer(spark, city_loop_regions(50), max_cells=8)
        hits = spatial_join(
            tiled, layer, point_key="url", latlng=("lat", "lng")
        ).withColumnRenamed("geom_id", "polygon_id")
        tiled = tiled.join(hits, "url", "left")

    if args.backend == "iceberg":
        # the catalog owns data + lineage atomically: the manifest
        # summary rides as table properties on the snapshot commit
        n_rows = tiled.count()
        write_table(
            tiled,
            args.out,
            backend="iceberg",
            partition_by=("bucket",),
            properties={"geo_spark.rows": str(n_rows)},
        )
        m, bad = {"_iceberg": {"rows": n_rows}}, []
    else:
        m = write_with_manifest(tiled, args.out, "bucket", manifest)
        bad = verify_manifest(spark, args.out, "bucket", manifest)
    report = {
        "out": args.out,
        "backend": args.backend,
        "manifest": manifest,
        "buckets": len(m),
        "rows": sum(e["rows"] for e in m.values()),
        "manifest_mismatches": bad,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(report))
    if bad:
        raise SystemExit(f"manifest verification failed for buckets: {bad}")
    spark.stop()


if __name__ == "__main__":
    main()
