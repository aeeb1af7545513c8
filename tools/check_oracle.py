"""Local mimic of the driver's correctness gate: run each queries()[k]
in Spark and oracle_sql()[k] in DuckDB on the same sf dir; compare row
count, column names, and the order-insensitive multiset of row values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if v is None:
        return "\x00<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    return repr(v)


def run(sf_dir: str, only: list[str]):
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = only or sorted(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            if name in oracles:
                # Driver-harness invariant (COVERAGE.md §grading): graded
                # outputs must be scalar columns only — the driver
                # canonicalizes rows via a pandas sort over all columns,
                # which throws `unhashable type` on array/map/struct cells.
                from pyspark.sql.types import ArrayType, MapType, StructType

                bad = [
                    f.name
                    for f in sdf.schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType, StructType))
                ]
                if bad:
                    failures.append(name)
                    print(
                        f"  {name}: NONSCALAR graded output columns {bad} — "
                        "scalar-encode (concat_ws / posexplode) before grading"
                    )
                    continue
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                tuple(norm(r[c]) for c in scols) for r in srows
            )
            if name not in oracles:
                print(f"  {name}: rows={len(srows)} (no oracle — rows-only)")
                continue
            ddf = con.execute(oracles[name]).fetch_arrow_table()
            dcols_raw = ddf.column_names
            dcols = sorted(dcols_raw)
            drows = ddf.to_pylist()
            dset = sorted(
                tuple(norm(r[c]) for c in dcols) for r in drows
            )
            ok_cols = scols == dcols
            ok_n = len(sset) == len(dset)
            ok_v = sset == dset
            status = "OK" if (ok_cols and ok_n and ok_v) else "MISMATCH"
            print(f"  {name}: {status} rows={len(sset)}/{len(dset)} cols={'ok' if ok_cols else (scols, dcols)}")
            if not (ok_cols and ok_n and ok_v):
                failures.append(name)
                if ok_cols:
                    sonly = [x for x in sset if x not in set(dset)][:3]
                    donly = [x for x in dset if x not in set(sset)][:3]
                    print(f"    spark-only: {sonly}")
                    print(f"    duck-only:  {donly}")
        except Exception as e:
            failures.append(name)
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} OK; failures: {failures}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    sys.exit(1 if run(sf, only) else 0)
