"""Round-6 optimization helper bench (NOT the driver contract; bench.py
is frozen).

Modes:
  python bench_extra.py explain <outdir> [names...]   # write explain("formatted") per query
  python bench_extra.py time <n_reps> [names...]      # noop-sink timing per query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32). Uses the same session config as bench.py so plans and
timings are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, build_session  # noqa: E402


def main():
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus, "cocrawler-spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    qs = entry_mod.queries()

    if mode == "explain":
        spark.conf.set("spark.sql.maxPlanStringLength", str(512 * 1024))
        outdir = sys.argv[2]
        names = sys.argv[3:] or HEADLINE
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(txt)
            print(name, "ok", flush=True)
    elif mode == "time":
        reps = int(sys.argv[2])
        names = sys.argv[3:] or HEADLINE
        # warmup (same as bench.py)
        spark.range(10000).select(
            "id", F.md5(F.col("id").cast("string")).alias("h")
        ).groupBy((F.col("id") % 8).alias("g")).count().write.format(
            "noop"
        ).mode("overwrite").save()
        out = {}
        for name in names:
            samples = []
            for _ in range(reps):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.time() - t0, 3))
            out[name] = samples
            print(json.dumps({name: samples}), flush=True)
        print(json.dumps({"sf_dir": sf_dir, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
