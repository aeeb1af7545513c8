"""Round-3 scaling run driver: all four legs on ONE commit (VERDICT r2
dinged pairing provenance; mixing code versions across legs re-creates
it). Runs legs largest-pairing-first (8, 16, 32, 4) so the
driver-named 8v32 pairing lands even if the slow 4-core leg is cut
short; the report is (re)assembled after every leg that completes a
full pairing. Records the git SHA each leg ran."""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools import bench_scaling as bs

size, waves = "xxl", 5
sha = subprocess.run(
    ["git", "rev-parse", "--short", "HEAD"], cwd=bs.REPO,
    capture_output=True, text=True,
).stdout.strip()
legs = {}
for n in (8, 16, 32, 4):
    legs[n] = bs.run_level_subprocess(n, size, waves)
    legs[n]["git_sha"] = sha
    if (8 in legs and 32 in legs) or (4 in legs and 16 in legs):
        bs.write_report(size, waves, legs)
