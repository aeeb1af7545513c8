"""Iceberg-style snapshot catalog over Parquet + JSON manifests.

Real Iceberg jars are not available in this sandbox (SURVEY.md §0.4),
so this module supplies the subset of semantics the crawl needs —
append-only table deltas, atomic snapshot commit, rollback-by-ignoring
uncommitted files, per-partition lineage — behind a seam small enough
that a real Iceberg catalog (``spark.read.format('iceberg')`` +
``writeTo(...).append()``) drops in on a real cluster.

Reference analog: cocrawler's pickle checkpoint of seen set + queue +
ridealong + stats (cocrawler/__init__.py — save/load†, datalayer†),
replaced by: every wave commits a JSON manifest listing, per table,
the delta files valid as of that wave plus per-partition row counts
and content hashes (north_rule: "resumable from Iceberg snapshot
checkpoints with per-partition lineage"). Commit is atomic via
write-tmp + os.replace; a crash between table writes and commit leaves
orphan files that the next resume simply never references.

Layout:
    root/tables/<name>/w<wave>-<mode>/*.parquet   (mode: delta|full)
    root/manifests/m<wave>.json

Manifest extras carried by the engine: total_fetched / seen_total /
done (run state), bloom_format (bucket-routing version of the
snapshot's bitmaps), and config (the full CrawlConfig the snapshot was
produced under — resume() refuses a semantically different config).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        import threading

        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "tables"), exist_ok=True)
        self._pending: dict[str, dict] = {}
        # stage() may be called from the engine's writer thread pool —
        # independent table writes per wave overlap instead of running
        # as ~10 sequential driver-blocking jobs
        self._lock = threading.Lock()

    # -- write side ---------------------------------------------------------

    def _table_dir(self, name: str, wave: int, mode: str) -> str:
        return os.path.join(self.root, "tables", name, f"w{wave:05d}-{mode}")

    def stage(
        self,
        name: str,
        df: DataFrame,
        wave: int,
        mode: str = "delta",
        lineage: bool = False,
        partition_by: Optional[list[str]] = None,
    ) -> DataFrame:
        """Write a table version for `wave` (uncommitted until commit()).

        mode='delta'  → this wave's rows append to prior deltas
        mode='full'   → this version replaces all prior versions
        Returns the re-read DataFrame (fresh lineage — this is also the
        iterative loop's lineage truncation point).
        """
        path = self._table_dir(name, wave, mode)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        entry = {"path": path, "mode": mode}
        if lineage:
            # per-partition row counts + an order-insensitive crc over the
            # leading (key) column — cheap enough to run every wave; a
            # full-row digest would json-serialize the table
            back = self.spark.read.parquet(path)
            key = back.columns[0]
            per_part = (
                back.withColumn("_p", F.spark_partition_id())
                .groupBy("_p")
                .agg(
                    F.count("*").alias("rows"),
                    F.sum(F.crc32(F.col(key).cast("string"))).alias("crc"),
                )
                .collect()
            )
            entry["partitions"] = [
                {"id": int(r["_p"]), "rows": int(r["rows"]), "crc": int(r["crc"] or 0)}
                for r in sorted(per_part, key=lambda r: r["_p"])
            ]
            entry["rows"] = sum(p["rows"] for p in entry["partitions"])
        with self._lock:
            self._pending[name] = entry
        return self.spark.read.parquet(path)

    def staged_rows(self, name: str) -> int:
        """Row count of a staged (not yet committed) lineage table.

        Raises (KeyError) if `name` was not staged this wave or was
        staged without lineage=True — callers use this for loop control,
        where a silent 0 default would terminate a crawl early."""
        with self._lock:
            entry = self._pending[name]
            if "rows" not in entry:
                raise KeyError(
                    f"table '{name}' was staged without lineage; no row count"
                )
            return int(entry["rows"])

    def commit(
        self, wave: int, extra: Optional[dict] = None, base: Optional[dict] = None
    ) -> dict:
        """Atomically publish all staged tables as snapshot `wave`.

        The manifest carries the *cumulative* file list per table:
        the BASE snapshot's entries plus this wave's staged versions
        (full versions reset the list). `base` must be the manifest this
        run is extending — chaining from the globally-latest manifest
        would, after a rollback-resume, append re-staged paths onto the
        abandoned run's list and double-read those deltas.
        """
        prev = base if base is not None else self.latest_manifest()
        tables: dict[str, dict] = {}
        if prev:
            tables = {k: dict(v) for k, v in prev["tables"].items()}
        for name, entry in self._pending.items():
            if entry["mode"] == "full":
                tables[name] = {"paths": [entry["path"]]}
            else:
                paths = [p for p in tables.get(name, {}).get("paths", [])
                         if p != entry["path"]]
                tables[name] = {"paths": paths + [entry["path"]]}
            for k in ("partitions", "rows"):
                if k in entry:
                    tables[name][k] = entry[k]
        manifest = {"wave": wave, "tables": tables}
        if extra:
            manifest.update(extra)
        final = os.path.join(self.root, "manifests", f"m{wave:05d}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, final)  # atomic commit point
        self._pending = {}
        return manifest

    # -- read side ------------------------------------------------------------

    def latest_manifest(self) -> Optional[dict]:
        mdir = os.path.join(self.root, "manifests")
        names = sorted(n for n in os.listdir(mdir) if n.endswith(".json"))
        if not names:
            return None
        with open(os.path.join(mdir, names[-1])) as f:
            return json.load(f)

    def manifest_at(self, wave: int) -> Optional[dict]:
        path = os.path.join(self.root, "manifests", f"m{wave:05d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def load(self, name: str, manifest: Optional[dict] = None) -> Optional[DataFrame]:
        m = manifest or self.latest_manifest()
        if not m or name not in m["tables"]:
            return None
        paths = m["tables"][name]["paths"]
        return self.spark.read.parquet(*paths)
