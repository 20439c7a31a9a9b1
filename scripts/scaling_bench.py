"""Two-parallelism scaling benchmark (BASELINE.json north_rule evidence).

The rule's N->4N executor criterion cannot use a real cluster in this
sandbox, so the same flagship job (pages -> geotag extract -> S2 encode
-> tile counts, plus the pages x city-loops PIP join) runs at local[8]
and local[32] on the identical materialized input; we report throughput
at both and the scaling efficiency  eff = (T_8 / T_32) / 4.

Each configuration runs in a fresh JVM subprocess (no cache leakage);
best-of-N wall times reduce shared-box noise.  Results are appended to
BASELINE.md under '## Measured scaling'.

Usage: python scripts/scaling_bench.py [--pages 1000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from bench import bench_session, build_city_layer, materialize_pages, run_pages_pipeline, run_pages_pip_join, run_encode_kernel, run_pip_kernel, run_tile_kernel_jvm

cpus = {cpus}
spark = bench_session(cpus, master={master!r})
path = materialize_pages(spark, {pages}, cpus)
layer = build_city_layer(spark)
# Warmup: pay Python-worker imports and JIT outside the timed window.
run_pages_pipeline(spark, path)
run_pages_pip_join(spark, path, layer)
run_encode_kernel(spark, {pages}, cpus)
run_pip_kernel(spark, {pages} // 4, cpus)
run_tile_kernel_jvm(spark, {pages}, cpus)
t0 = time.monotonic(); run_pages_pipeline(spark, path); t1 = time.monotonic()
run_pages_pip_join(spark, path, layer); t2 = time.monotonic()
run_encode_kernel(spark, {pages} * 4, cpus); t3 = time.monotonic()
run_pip_kernel(spark, {pages}, cpus); t4 = time.monotonic()
run_tile_kernel_jvm(spark, {pages} * 16, cpus); t5 = time.monotonic()
print("RESULT " + json.dumps({{"pipeline": t1 - t0, "join": t2 - t1, "encode": t3 - t2, "pip_kernel": t4 - t3, "jvm_tile": t5 - t4}}))
spark.stop()
"""


def run_once(cpus: int, pages: int, master: str | None = None) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, pages=pages, master=master)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument(
        "--cluster",
        action="store_true",
        help="multi-JVM protocol: N = local-cluster[1,low,...] vs "
        "4N = local-cluster[high/low,low,...] — one executor JVM per "
        "'node', so task dispatch parallelizes per-executor as on a "
        "real cluster (the single-JVM local[k] dispatch artifact, "
        "BASELINE.md §5, is out of the loop)",
    )
    ap.add_argument("--exec-mem-mb", type=int, default=3072)
    args = ap.parse_args()

    masters: dict[int, str | None] = {args.low: None, args.high: None}
    if args.cluster:
        n_exec = args.high // args.low
        masters[args.low] = f"local-cluster[1,{args.low},{args.exec_mem_mb}]"
        masters[args.high] = f"local-cluster[{n_exec},{args.low},{args.exec_mem_mb}]"

    # Interleave configs (H,L,H,L,...): the sandbox VM's CPU delivery is
    # bursty, so consecutive same-config runs would bias whichever config
    # ran first; min-of-interleaved gives each config its best window.
    all_runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for _ in range(args.reps):
        for cpus in (args.high, args.low):
            all_runs[cpus].append(run_once(cpus, args.pages, masters[cpus]))
    best = {
        cpus: {
            "pipeline": min(r["pipeline"] for r in runs),
            "join": min(r["join"] for r in runs),
            "encode": min(r.get("encode", float("inf")) for r in runs),
            "pip_kernel": min(r.get("pip_kernel", float("inf")) for r in runs),
            "jvm_tile": min(r.get("jvm_tile", float("inf")) for r in runs),
            "runs": runs,
        }
        for cpus, runs in all_runs.items()
    }

    factor = args.high / args.low
    low_label = masters[args.low] or f"local[{args.low}]"
    high_label = masters[args.high] or f"local[{args.high}]"
    report = {
        "n_pages": args.pages,
        "low_cpus": args.low,
        "high_cpus": args.high,
        "low_master": low_label,
        "high_master": high_label,
        "pipeline": {
            "low_sec": round(best[args.low]["pipeline"], 2),
            "high_sec": round(best[args.high]["pipeline"], 2),
            "low_pages_per_sec": round(args.pages / best[args.low]["pipeline"]),
            "high_pages_per_sec": round(args.pages / best[args.high]["pipeline"]),
            "speedup": round(best[args.low]["pipeline"] / best[args.high]["pipeline"], 2),
            "efficiency": round(
                best[args.low]["pipeline"] / best[args.high]["pipeline"] / factor, 3
            ),
        },
        "pip_join": {
            "low_sec": round(best[args.low]["join"], 2),
            "high_sec": round(best[args.high]["join"], 2),
            "speedup": round(best[args.low]["join"] / best[args.high]["join"], 2),
            "efficiency": round(
                best[args.low]["join"] / best[args.high]["join"] / factor, 3
            ),
        },
        "encode_kernel": {
            "low_sec": round(best[args.low]["encode"], 2),
            "high_sec": round(best[args.high]["encode"], 2),
            "rows": args.pages * 4,
            "speedup": round(best[args.low]["encode"] / best[args.high]["encode"], 2),
            "efficiency": round(
                best[args.low]["encode"] / best[args.high]["encode"] / factor, 3
            ),
        },
        "pip_kernel": {
            "low_sec": round(best[args.low]["pip_kernel"], 2),
            "high_sec": round(best[args.high]["pip_kernel"], 2),
            "rows": args.pages,
            "speedup": round(
                best[args.low]["pip_kernel"] / best[args.high]["pip_kernel"], 2
            ),
            "efficiency": round(
                best[args.low]["pip_kernel"] / best[args.high]["pip_kernel"] / factor,
                3,
            ),
        },
        "jvm_tile": {
            "low_sec": round(best[args.low]["jvm_tile"], 2),
            "high_sec": round(best[args.high]["jvm_tile"], 2),
            "rows": args.pages * 16,
            "speedup": round(
                best[args.low]["jvm_tile"] / best[args.high]["jvm_tile"], 2
            ),
            "efficiency": round(
                best[args.low]["jvm_tile"] / best[args.high]["jvm_tile"] / factor, 3
            ),
        },
    }
    print(json.dumps(report))

    baseline = os.path.join(REPO, "BASELINE.md")
    marker = "## Measured scaling"
    section = (
        f"\n{marker} ({low_label} vs {high_label}, "
        f"{args.pages:,} pages, best of {args.reps})\n\n"
        f"| job | {args.low} cores | {args.high} cores | speedup | efficiency vs {factor:.0f}x |\n"
        f"|---|---|---|---|---|\n"
        f"| pages pipeline (extract->encode->tile counts) | "
        f"{report['pipeline']['low_sec']}s ({report['pipeline']['low_pages_per_sec']:,}/s) | "
        f"{report['pipeline']['high_sec']}s ({report['pipeline']['high_pages_per_sec']:,}/s) | "
        f"{report['pipeline']['speedup']}x | {report['pipeline']['efficiency']} |\n"
        f"| pages x 50 city loops PIP join | "
        f"{report['pip_join']['low_sec']}s | {report['pip_join']['high_sec']}s | "
        f"{report['pip_join']['speedup']}x | {report['pip_join']['efficiency']} |\n"
        f"| encode kernel ({report['encode_kernel']['rows']:,} rows) | "
        f"{report['encode_kernel']['low_sec']}s | {report['encode_kernel']['high_sec']}s | "
        f"{report['encode_kernel']['speedup']}x | {report['encode_kernel']['efficiency']} |\n"
        f"| dense PIP refine ({report['pip_kernel']['rows']:,} rows x 256-vertex loop) | "
        f"{report['pip_kernel']['low_sec']}s | {report['pip_kernel']['high_sec']}s | "
        f"{report['pip_kernel']['speedup']}x | {report['pip_kernel']['efficiency']} |\n"
        f"| native-SQL tile kernel (pure JVM codegen, {report['jvm_tile']['rows']:,} rows) | "
        f"{report['jvm_tile']['low_sec']}s | {report['jvm_tile']['high_sec']}s | "
        f"{report['jvm_tile']['speedup']}x | {report['jvm_tile']['efficiency']} |\n"
    )
    # APPEND, never truncate: earlier sections (notably the multi-JVM
    # below-the-wall protocol, the authoritative N->4N evidence) must
    # survive re-measures — truncating at the first marker once wiped
    # them (session-6 incident).
    with open(baseline, "a") as f:
        f.write(section)


if __name__ == "__main__":
    main()
