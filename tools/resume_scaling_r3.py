"""One-shot resume driver for the round-3 scaling run: the 4-core leg
completed before the orchestrator was stopped (its subprocess JSON is
on disk); run the remaining legs and assemble the full 4-leg report."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools import bench_scaling as bs

size, waves = "xxl", 5
legs = {}
with open(os.path.join(bs.REPO, ".data", "scaling_4.json")) as f:
    legs[4] = json.load(f)
for n in (8, 16, 32):
    legs[n] = bs.run_level_subprocess(n, size, waves)
bs.write_report(size, waves, legs)
