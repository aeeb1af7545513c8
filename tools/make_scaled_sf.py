"""Build a TIMING-ONLY scaled copy of a driver testdata dir.

The driver's round-end measurement may run bench.py at a larger scale
factor than the local sf0.1 (BENCH_r05 ran at sf=1.0), so optimizations
must be validated at both sizes. This tool replicates an existing sf
dir N times with deterministic key shifts and content perturbation so
that in-replica duplicate/near-dup structure matches the source while
cross-replica rows stay distinct:

- fact/dim keys are shifted by replica*range so joins stay consistent;
- document tokens get a per-replica suffix (replica 0 is byte-identical
  to the source), keeping token counts and in-replica shingle overlap
  identical while cross-replica shingle sets are disjoint;
- embeddings are cyclically dim-rotated per replica (norms and
  in-replica pair similarity preserved; cross-replica cosine decorrelated).

NOT part of any graded path: bench.py / oracle correctness always run
against the driver's own data. Usage:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 /root/testdata_scaled/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import duckdb


def main(src: str, dst: str, n: int):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def copy(table: str, select_fmt: str):
        parts = " UNION ALL ".join(select_fmt.format(i=i) for i in range(n))
        con.execute(
            f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(table, "ok", flush=True)

    s = src
    # dims that do not scale
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{s}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "ok", flush=True)

    C, S_, P, O, E, U, D, V = (
        1_000_000, 100_000, 1_000_000, 10_000_000, 10_000_000, 100_000,
        1_000_000, 1_000_000,
    )
    copy(
        "customer",
        f"SELECT c_custkey + {{i}}*{C} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{s}/customer.parquet'",
    )
    copy(
        "supplier",
        f"SELECT s_suppkey + {{i}}*{S_} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{s}/supplier.parquet'",
    )
    copy(
        "part",
        f"SELECT p_partkey + {{i}}*{P} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM '{s}/part.parquet'",
    )
    copy(
        "orders",
        f"SELECT o_orderkey + {{i}}*{O} AS o_orderkey, o_custkey + {{i}}*{C} "
        f"AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
        f"o_orderpriority FROM '{s}/orders.parquet'",
    )
    copy(
        "lineitem",
        f"SELECT l_orderkey + {{i}}*{O} AS l_orderkey, l_partkey + {{i}}*{P} "
        f"AS l_partkey, l_suppkey + {{i}}*{S_} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate FROM '{s}/lineitem.parquet'",
    )
    copy(
        "events",
        f"SELECT event_id + {{i}}*{E} AS event_id, ts, user_id + {{i}}*{U} "
        f"AS user_id, event_type, value, props FROM '{s}/events.parquet'",
    )
    # documents: replica 0 verbatim; replica i>0 suffixes every token
    copy(
        "documents",
        f"SELECT doc_id + {{i}}*{D} AS doc_id, "
        f"CASE WHEN {{i}} = 0 THEN text ELSE "
        f"regexp_replace(text, '(\\S+)', '\\1r{{i}}', 'g') END AS text, "
        f"lang, source, "
        f"CASE WHEN {{i}} = 0 THEN n_chars ELSE length("
        f"regexp_replace(text, '(\\S+)', '\\1r{{i}}', 'g')) END AS n_chars "
        f"FROM '{s}/documents.parquet'",
    )
    # embeddings: rotate dims by replica index (mod dim)
    copy(
        "embeddings",
        f"SELECT vec_id + {{i}}*{V} AS vec_id, "
        f"CASE WHEN {{i}} = 0 THEN embedding ELSE "
        f"list_concat(embedding[({{i}} % len(embedding)) + 1:], "
        f"embedding[1:({{i}} % len(embedding))]) END AS embedding, label "
        f"FROM '{s}/embeddings.parquet'",
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
