"""spark-submit driver for a packaged crawl — the north_rule's
"run via spark-submit --py-files" deployment shape.

This script deliberately contains NO sys.path edits: when launched as

    spark-submit --py-files dist/cocrawler_spark.zip tools/submit_crawl.py \
        [size] [waves] [out.json]

from a NEUTRAL working directory (not the repo root), every
`cocrawler_spark.*` import below resolves from the zip that
spark-submit shipped — the same mechanism that distributes the package
to executors on a real cluster — so a green run proves the package is
self-contained: no repo-relative file access, no module that only
imports when the source tree is the cwd, and every pandas/Arrow UDF
pickles and re-imports on workers from the zipimport path.

Prints one JSON line: {"size", "waves", "total_fetched", "seen_total",
"frontier_remaining", "sha_order"} where sha_order is a digest over the
(wave, seq, url) crawl order — comparable across deployment shapes (the
packaged run must produce the IDENTICAL crawl to an in-tree run; the
equality is asserted by tools/package_pyfiles.py's --check mode).
"""

from __future__ import annotations

import hashlib
import json
import sys
import tempfile


def main() -> None:
    size = sys.argv[1] if len(sys.argv) > 1 else "small"
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out = sys.argv[3] if len(sys.argv) > 3 else ""

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("packaged-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from cocrawler_spark.config import CrawlConfig
    from cocrawler_spark.plans.crawl import CrawlEngine
    from cocrawler_spark.sources.corpus import (
        read_documents,
        read_robots_src,
        read_seed_parquet,
    )
    from cocrawler_spark.synth import generate_parquet

    with tempfile.TemporaryDirectory(prefix="pyfiles_crawl_") as td:
        paths = generate_parquet(f"{td}/web", size=size, seed=42)
        eng = CrawlEngine(
            spark,
            CrawlConfig(max_depth=4, max_waves=waves),
            documents=read_documents(spark, paths["documents"]),
            robots_src=read_robots_src(spark, paths["robots_src"]),
            seeds=read_seed_parquet(spark, paths["seeds"]),
            state_dir=f"{td}/state",
        )
        eng.seed_frontier()
        w = 1
        while w <= waves and eng.frontier_count > 0:
            eng.run_wave(w)
            w += 1
        order = [
            (r["wave"], r["seq"], r["url"])
            for r in eng.output("crawl_order").select("wave", "seq", "url").collect()
        ]
        order.sort()
        sha = hashlib.sha256(
            "\n".join(f"{w}\t{s}\t{u}" for w, s, u in order).encode()
        ).hexdigest()
        res = {
            "size": size,
            "waves": waves,
            "total_fetched": eng.total_fetched,
            "seen_total": eng.summary()["seen_total"],
            "frontier_remaining": eng.summary()["frontier_remaining"],
            "sha_order": sha,
        }
    print(json.dumps(res))
    if out:
        with open(out, "w") as f:
            json.dump(res, f)
    spark.stop()


if __name__ == "__main__":
    main()
