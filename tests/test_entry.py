"""Driver-contract smoke tests for __spark_entry__.py.

The full Spark-vs-DuckDB cross-check is tools/check_oracle.py (run at
sf0.001/sf0.01); here we pin the contract shape and a fast subset.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_contract_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # at most a handful of rows-only ops
    assert len(set(qs) - set(oracles)) <= 3


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "seq", "doc_id", "url", "host", "priority", "rand", "rn", "slot",
    ]
    # seq is a valid 1..n prefix of the global order
    seqs = sorted(r["seq"] for r in rows)
    assert seqs == list(range(1, len(rows) + 1))


@pytest.mark.parametrize(
    "name",
    ["scheme_filter", "seen_anti_join", "politeness_slotting", "dedup_simhash",
     "text_langid", "ann_topk_bruteforce", "ann_ivf_topk"],
)
def test_query_vs_duckdb_subset(spark, name):
    import duckdb

    from tools.check_oracle import TABLES, norm

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sdf = entry_mod.queries()[name](spark, SF)
    scols = sorted(sdf.columns)
    sset = sorted(tuple(norm(r[c]) for c in scols) for r in sdf.collect())
    tbl = con.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
    dcols = sorted(tbl.column_names)
    dset = sorted(tuple(norm(r[c]) for c in dcols) for r in tbl.to_pylist())
    assert scols == dcols
    assert sset == dset
