"""Profile the bench.py crawl leg: per-phase wall clock via
SPARK_GRAFT_PROFILE, toggling predistill — diagnosis harness for the
r2 sf0.1 bench regression (VERDICT r2 #3).

Usage: python tools/profile_crawl_bench.py [size] [waves] [predistill(0|1)]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["SPARK_GRAFT_PROFILE"] = "1"

from bench import build_session, run_crawl_bench  # noqa: E402


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "medium"
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    predistill = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import bench as bench_mod
    import shutil

    from cocrawler_spark.config import CrawlConfig
    from cocrawler_spark.plans.crawl import CrawlEngine
    from cocrawler_spark.sources.corpus import (
        read_documents,
        read_robots_src,
        read_seed_parquet,
    )
    from cocrawler_spark.synth import generate_parquet

    spark = build_session(cpus, "profile-crawl")
    spark.sparkContext.setLogLevel("ERROR")

    data_dir = os.path.join(REPO, ".data", "benchweb")
    paths = generate_parquet(data_dir, size=size, seed=42)
    cfg = CrawlConfig(
        max_depth=4, wave_budget_seconds=1e9, max_waves=waves, flaky_mod=10
    )
    state_root = (
        "/dev/shm/spark_graft_bench" if os.path.isdir("/dev/shm") else
        os.path.join(REPO, ".data")
    )
    os.makedirs(state_root, exist_ok=True)
    state = os.path.join(state_root, f"profstate_{size}")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(
        spark,
        cfg,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=state,
        lean=True,
        predistill=predistill,
    )
    t0 = time.time()
    eng.run(max_waves=waves)
    elapsed = time.time() - t0
    print(json.dumps({
        "size": size, "waves": waves, "predistill": predistill,
        "urls": eng.total_fetched, "elapsed_sec": round(elapsed, 2),
        "urls_per_sec": round(eng.total_fetched / elapsed, 2),
    }))
    for (w, label, sec) in eng.prof:
        print(f"  wave {w:2d}  {label:22s} {sec:8.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
