"""Hilbert-range data-skipping demo (SURVEY.md §4 strategy #8).

Writes the encoded pages table twice — range-partitioned + sorted by the
biased cell id, and shuffled — then queries one spatial region as the OR
of ``[RangeMin, RangeMax]`` predicates over its covering cells (the
table form of CellUnion containment).  Reports, from the parquet footers
(pyarrow, deterministic — no timing noise):

  - row groups whose [min, max] cell statistics intersect the ranges
    (these are the only groups a reader touches: Spark pushes the range
    predicates down, see the PushedFilters line printed below), and
  - the same count on the shuffled layout (≈ no skipping).

Usage: python scripts/pruning_demo.py [--pages 500000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq


def covering_ranges(region, max_cells=16):
    from geo_spark.kernel import cellid as ck
    from geo_spark.kernel.coverer import RegionCoverer

    cells = RegionCoverer(max_cells=max_cells).covering(region)
    out = []
    for c in cells:
        arr = np.array([c], dtype=np.uint64)
        lo = int(ck.to_signed(ck.range_min(arr))[0])
        hi = int(ck.to_signed(ck.range_max(arr))[0])
        out.append((lo, hi))
    return sorted(out)


def rowgroup_stats(path: str, col: str):
    groups = []
    for fname in os.listdir(path):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            groups.append((st.min, st.max, md.row_group(g).num_rows))
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=500_000)
    args = ap.parse_args()

    from bench import bench_session
    from geo_spark.kernel.regions import Cap
    from geo_spark.sources.extract import extract_encode
    from geo_spark.sources.pages import synth_pages

    spark = bench_session(16)
    enc = extract_encode(synth_pages(spark, args.pages, partitions=64)).select(
        "url", "cell_id"
    )

    sorted_path = "/tmp/geo_spark_prune/sorted"
    shuffled_path = "/tmp/geo_spark_prune/shuffled"
    (
        enc.repartitionByRange(16, "cell_id")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .parquet(sorted_path)
    )
    (
        enc.repartition(16)
        .write.mode("overwrite")
        .option("parquet.block.size", 1 << 20)
        .parquet(shuffled_path)
    )

    region = Cap.from_center_angle(48.85, 2.35, 0.05)  # ~300 km around Paris
    ranges = covering_ranges(region)
    pred = " OR ".join(f"(cell_id BETWEEN {lo} AND {hi})" for lo, hi in ranges)

    report = {"n_pages": args.pages, "n_ranges": len(ranges)}
    for label, path in (("sorted", sorted_path), ("shuffled", shuffled_path)):
        groups = rowgroup_stats(path, "cell_id")
        touched = [
            n for lo_g, hi_g, n in groups
            if any(lo_g <= hi and hi_g >= lo for lo, hi in ranges)
        ]
        df = spark.read.parquet(path).where(pred)
        report[label] = {
            "row_groups": len(groups),
            "row_groups_touched": len(touched),
            "rows_in_touched_groups": sum(touched),
            "matching_rows": df.count(),
        }
        if label == "sorted":
            plan = df._jdf.queryExecution().executedPlan().toString()
            pushed = [
                ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln
            ]
            report["pushed_filters_sample"] = (
                pushed[0][:200] if pushed else "(not shown in plan)"
            )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
