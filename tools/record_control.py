"""Record same-commit solo-control crawl numbers into BENCH/control.json.

The driver's per-round bench is a single shot on a shared host whose
throughput band is ±2x (BENCH/ANALYSIS.md entries 22/33/34/36). This
tool measures the SAME crawl leg bench.py runs, solo, N times, and
writes {sha, runs:[urls_per_sec...], median} next to the bench so every
BENCH_rXX.json carries its own host-band evidence (bench.py embeds the
file as the "control" field).

Usage: python tools/record_control.py [n_runs] [size]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    size = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_CRAWL_SIZE", "medium"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench

    runs = []
    for i in range(n):
        spark = bench.build_session(cpus, f"crawl-control-{i}")
        spark.sparkContext.setLogLevel("ERROR")
        r = bench.run_crawl_bench(spark, size)
        spark.stop()
        print(f"control run {i}: {r}", file=sys.stderr)
        runs.append(r["urls_per_sec"])

    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=ROOT, capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "sha": sha,
        "size": size,
        "cpus": cpus,
        "runs_urls_per_sec": runs,
        "median_urls_per_sec": round(statistics.median(runs), 2),
        "note": "solo same-commit crawl-leg controls; read the driver's "
        "single-shot crawl.urls_per_sec against this band",
    }
    path = os.path.join(ROOT, "BENCH", "control.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
