"""Package cocrawler_spark for spark-submit --py-files and prove the
packaged deployment produces the IDENTICAL crawl to an in-tree run.

north_rule: "... runs via spark-submit --py-files on a multi-executor
cluster ...". The cluster itself is out of sandbox reach, but the
DEPLOYMENT SHAPE is not: this tool builds the distributable zip, then
launches tools/submit_crawl.py twice —

  (a) packaged: spark-submit --py-files dist/cocrawler_spark.zip, with
      the working directory set to a temp dir so NOTHING resolves from
      the source tree ('' and the script dir are the only implicit
      sys.path entries, and neither contains the package); every import
      and every executor-side UDF unpickle must come from the zip, the
      exact mechanism a real cluster uses to ship the package;
  (b) in-tree: the same driver with PYTHONPATH=<repo>, no zip.

Both runs crawl the same deterministic synthetic web; the tool asserts
their full JSON summaries — including sha_order, a digest over every
(wave, seq, url) of the crawl order — are equal. Deployment packaging
is thereby equality-tested like any other physical-path variant (the
same standard the broadcast/shuffle/co-partitioned fetch joins are held
to).

Usage:
  python tools/package_pyfiles.py            # build + both runs + check
  python tools/package_pyfiles.py --build    # just (re)build the zip
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")
ZIP = os.path.join(DIST, "cocrawler_spark.zip")
SIZE = os.environ.get("SPARK_GRAFT_PYFILES_SIZE", "small")
WAVES = int(os.environ.get("SPARK_GRAFT_PYFILES_WAVES", "3"))


def build_zip() -> str:
    os.makedirs(DIST, exist_ok=True)
    src = os.path.join(REPO, "cocrawler_spark")
    entries = []
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                entries.append((os.path.relpath(p, REPO), p))
    entries.sort()
    with zipfile.ZipFile(ZIP, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, p in entries:
            # fixed timestamp: the zip is a build artifact; identical
            # sources must produce a byte-identical artifact
            zi = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            with open(p, "rb") as fh:
                z.writestr(zi, fh.read())
    return ZIP


def _run(packaged: bool, workdir: str) -> dict:
    submit = shutil.which("spark-submit") or "spark-submit"
    out = os.path.join(workdir, f"res_{'zip' if packaged else 'tree'}.json")
    script = os.path.join(REPO, "tools", "submit_crawl.py")
    cmd = [submit, "--master", "local[8]", "--driver-memory", "8g"]
    if packaged:
        cmd += ["--py-files", ZIP]
    cmd += [script, SIZE, str(WAVES), out]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    if not packaged:
        env["PYTHONPATH"] = REPO
    # cwd is a temp dir in BOTH runs: the packaged run must not see the
    # source tree at all; the in-tree run gets it via PYTHONPATH only.
    err = os.path.join(workdir, f"err_{'zip' if packaged else 'tree'}.log")
    with open(err + ".out", "w") as so, open(err, "w") as se:
        subprocess.run(
            cmd, check=True, cwd=workdir, env=env, stdout=so, stderr=se,
        )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    build_zip()
    print(f"built {ZIP} ({os.path.getsize(ZIP)} bytes)")
    if "--build" in sys.argv:
        return
    with tempfile.TemporaryDirectory(prefix="pyfiles_check_") as td:
        a = _run(packaged=True, workdir=td)
        b = _run(packaged=False, workdir=td)
    # explicit comparison BEFORE any success output (a bare assert is a
    # no-op under python -O, and printing first would report success on
    # a divergence — ADVICE r4)
    if a != b:
        print(json.dumps({"packaged": a, "in_tree": b}))
        raise SystemExit(f"packaged vs in-tree crawl diverged: {a} != {b}")
    print(json.dumps({"packaged": a, "in_tree": b}))
    print("OK: packaged (--py-files) crawl ≡ in-tree crawl "
          f"(sha_order {a['sha_order'][:16]}…, {a['total_fetched']} pages)")


if __name__ == "__main__":
    main()
