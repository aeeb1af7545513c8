"""Memory-bandwidth roofline for the scaling-efficiency caveat.

The surviving hot loops of the crawl bench at high core counts are
bandwidth-bound (parquet decode, shuffle rows, Arrow batches, hash-agg
probes — BENCH/ANALYSIS entries 14/23). This tool measures the one
machine fact that argument rests on: aggregate memory bandwidth as a
function of pinned core count. If bandwidth stops scaling past K
cores, no plan change can make a bandwidth-bound stage scale past K on
this box — that ceiling, not the plan's parallelism, is what the
local[8]-vs-local[32] pairing measures.

Method: per worker process, a STREAM-triad-like numpy kernel
(a = b + 0.5*c over 64 MiB float64 arrays, far larger than LLC) run
for a fixed wall window; workers are taskset-pinned to distinct CPUs
(same pinning as tools/bench_scaling.py legs). Reported GB/s counts
3 arrays × 8 bytes moved per element per pass (write-allocate traffic
ignored, same convention at every core count, so ratios are exact).

Usage: python tools/roofline.py [out.json]   (runs 1,4,8,16,32 cores)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N = 8 * 1024 * 1024  # 64 MiB per array, 3 arrays per worker
WINDOW_S = 4.0


def _worker(cpu: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    b = np.random.default_rng(cpu).random(N)
    c = np.random.default_rng(cpu + 1).random(N)
    a = np.empty_like(b)
    # warmup
    np.add(b, 0.5 * c, out=a)
    passes = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < WINDOW_S:
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
        passes += 1
    dt = time.perf_counter() - t0
    # per pass: read b, read c, write a (+ temp traffic identical
    # across runs) → 3 arrays × N × 8 bytes
    q.put((passes * 3 * N * 8) / dt)


def measure(cores: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(cores)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates) / 1e9


REPEATS = 3  # host noise (steal time) only subtracts: report best-of-N
             # as the machine's bandwidth capability at each core count


def main():
    out = {}
    for cores in (1, 4, 8, 16, 32):
        if cores > os.cpu_count():
            break
        gbs = max(measure(cores) for _ in range(REPEATS))
        out[cores] = round(gbs, 2)
        print(f"{cores:>2} cores: {gbs:8.2f} GB/s  "
              f"({gbs / out[1]:.2f}x vs 1 core, "
              f"{gbs / cores:.2f} GB/s/core)", flush=True)
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "roofline.json",
    )
    with open(path, "w") as f:
        json.dump({"triad_gbs_by_cores": out, "array_mib": 64,
                   "window_s": WINDOW_S}, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
