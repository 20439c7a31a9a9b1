"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The flagship spatial pipeline (pages -> geotag extract -> S2 leaf encode ->
tile assignment -> per-tile counts) is timed over a deterministic synthetic
pages table sized to the scale factor, giving the BASELINE.json
pages/sec throughput number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))

    import __spark_entry__ as entrymod
    from geo_spark.session import get_spark
    from geo_spark.sources.pages import synth_pages
    from geo_spark.sources.extract import extract_encode
    from geo_spark.operators.tiling import tile_counts

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # Materialize the deterministic pages table once (generation is input
    # prep, not engine work — on the target cluster pages is an Iceberg
    # table already on disk).
    pages_path = f"/tmp/geo_spark_bench/pages_{n_pages}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        synth_pages(spark, n_pages, partitions=cpus * 4).write.mode("overwrite").parquet(
            pages_path
        )

    # Flagship: pages/sec through read -> geotag extract -> S2 encode ->
    # tile assignment -> per-tile counts.
    t0 = time.monotonic()
    pages = spark.read.parquet(pages_path)
    out = tile_counts(extract_encode(pages), 10)
    n_tiles = out.count()
    dt = time.monotonic() - t0
    timings["pages_pipeline"] = round(dt, 3)
    pages_per_sec = round(n_pages / dt, 1)

    for name, fn in entrymod.queries().items():
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.monotonic() - t0, 3)

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
                "n_pages": n_pages,
                "n_tiles": n_tiles,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
