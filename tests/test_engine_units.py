"""Parity tests: JVM-side column expressions vs pure-Python cores."""

import pandas as pd
from pyspark.sql import functions as F

from cocrawler_spark.functions.parse import (
    content_sha1_col,
    content_sha1_py,
    extract_outlinks_py,
    extract_outlinks_udf,
    redirect_target_col,
    redirect_target_py,
)
from cocrawler_spark.functions.urls import (
    canonicalize_one,
    special_redirect_str,
    with_canonical,
)
from cocrawler_spark.operators.redirects import special_redirect_col
from cocrawler_spark.synth import generate


def _spans_rows(web, n=40):
    urls = sorted(web.docs)[:n]
    return [(u, web.docs[u]) for u in urls]


def test_canonicalize_udf_parity(spark, tiny_web):
    raws = list(tiny_web.seeds) + [
        "http://H0.test:80/p/1#x", "/rel/path", "../up", "mailto:a@b",
        "https://h1.test/p/2?q=%7e", "", None,
    ]
    bases = [None] * len(tiny_web.seeds) + [
        None, "http://h2.test/a/b", "http://h2.test/a/b/c", None, None, None, None,
    ]
    df = spark.createDataFrame(
        list(zip(raws, bases)), "raw string, base string"
    )
    out = {
        (r["raw"], r["base"]): (r["url"], r["surt"], r["host"])
        for r in with_canonical(df, "raw", base_col="base").collect()
    }
    for raw, base in zip(raws, bases):
        c = canonicalize_one(raw if raw is not None else "", base)
        assert out[(raw, base)] == (c.url, c.surt, c.host), (raw, base)


def test_outlinks_and_sha1_parity(spark, tiny_web):
    rows = _spans_rows(tiny_web)
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {
        r["doc_id"]: (r["out"], r["sha"], r["rt"])
        for r in df.select(
            "doc_id",
            extract_outlinks_udf()(F.col("spans")).alias("out"),
            content_sha1_col(F.col("spans")).alias("sha"),
            redirect_target_col(F.col("spans")).alias("rt"),
        ).collect()
    }
    for doc_id, spans in rows:
        exp = extract_outlinks_py(spans)
        out, sha, rt = got[doc_id]
        assert [(o["target"], o["kind"], o["span_offset"]) for o in out] == [
            (e["target"], e["kind"], e["span_offset"]) for e in exp
        ], doc_id
        assert sha == content_sha1_py(spans), doc_id
        assert rt == redirect_target_py(spans), doc_id


def test_redirect_target_noisy_parity(spark):
    """clean_link parity JVM↔Python on noisy redirect targets (quotes,
    backslashes, internal tabs/newlines) — synth never emits these, so
    this pins the r1 divergence (F.trim vs clean_link) explicitly."""
    noisy = [
        '  "http://t.test/a"  ',
        "\thttp://t.test/b\\\n",
        "'http://t.test/c'",
        "http://t.\nte\tst/d",
        "   ",
        None,
    ]
    rows = [
        (f"d{i}", [{"kind": "redirect", "text": t, "media_ref": None, "offset": 0}])
        for i, t in enumerate(noisy)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {
        r["doc_id"]: r["rt"]
        for r in df.select(
            "doc_id", redirect_target_col(F.col("spans")).alias("rt")
        ).collect()
    }
    for doc_id, spans in rows:
        exp = redirect_target_py(spans)
        assert (got[doc_id] or "") == (exp or ""), (doc_id, got[doc_id], exp)


def test_special_redirect_col_parity(spark):
    pairs = [
        ("http://a.test/p", "http://a.test/p#x"),
        ("http://a.test:80/p", "http://a.test/p"),
        ("http://a.test/p", "http://www.a.test/p"),
        ("http://www.a.test/p", "http://a.test/p"),
        ("http://a.test/p", "https://a.test/p"),
        ("https://a.test/p", "http://a.test/p"),
        ("http://a.test/p", "https://www.a.test/p"),
        ("http://www.a.test/p", "https://a.test/p"),
        ("http://a.test/p", "http://b.test/q"),
        ("http://a.test/p?x=1", "http://a.test/p?x=2"),
        ("http://a.test/p", "http://a.test/other"),
    ]
    df = spark.createDataFrame(pairs, "f string, t string")
    df = with_canonical(df, "f", prefix="from_")
    df = with_canonical(df, "t", prefix="to_")
    df = df.withColumn(
        "kind",
        special_redirect_col(
            F.col("from_scheme"), F.col("from_host"), F.col("from_surt"),
            F.col("from_path"), F.col("from_query"),
            F.col("to_scheme"), F.col("to_host"), F.col("to_surt"),
            F.col("to_path"), F.col("to_query"),
        ),
    )
    got = {(r["f"], r["t"]): r["kind"] for r in df.collect()}
    for f, t in pairs:
        assert got[(f, t)] == special_redirect_str(f, t), (f, t)


def test_global_seq(spark):
    from cocrawler_spark.operators.ordering import with_global_seq

    rows = [(i % 7, f"k{i:04d}") for i in range(500)]
    df = spark.createDataFrame(rows, "p int, k string").repartition(13)
    keep = []
    out = with_global_seq(df, ["p", "k"], persisted=keep)
    got = [(r["p"], r["k"]) for r in out.orderBy("seq").collect()]
    seqs = [r["seq"] for r in out.orderBy("seq").collect()]
    assert got == sorted(rows)
    assert seqs == list(range(1, 501))
    for d in keep:
        d.unpersist()


def test_sized_write_partitioning(spark):
    from cocrawler_spark.plans.crawl import CrawlEngine

    df = spark.range(1000).repartition(32)
    # tiny known delta -> one task/file
    assert CrawlEngine._sized(df, 500).rdd.getNumPartitions() == 1
    # mid-size -> ceil(rows/200k) tasks
    assert CrawlEngine._sized(df, 450_000).rdd.getNumPartitions() == 3
    # huge estimate -> coalesce(n >= partitions) is a no-op
    assert CrawlEngine._sized(df, 50_000_000).rdd.getNumPartitions() == 32
    # unknown -> untouched
    assert CrawlEngine._sized(df, None).rdd.getNumPartitions() == 32


def test_with_grouped_cumsum_matches_per_group_fold(spark):
    """with_grouped_cumsum: per-group inclusive running totals equal a
    pure-Python fold for every group, independent of input partitioning
    and with groups big enough to span several range partitions."""
    from cocrawler_spark.operators.ordering import with_grouped_cumsum

    rows = [
        (i, ["train", "val", "test"][i % 7 % 3], (i * 13) % 9 + 1)
        for i in range(1, 301)
    ]
    df = spark.createDataFrame(rows, "id long, split string, w long")
    got = {
        (r["split"], r["id"]): r["cum"]
        for r in with_grouped_cumsum(
            df.repartition(11), ["split"], ["id"], "w", num_partitions=8
        ).collect()
    }
    assert len(got) == 300
    acc: dict = {}
    for i, s, w in sorted(rows):
        acc[s] = acc.get(s, 0) + w
        assert got[(s, i)] == acc[s], (s, i, got[(s, i)], acc[s])
    # a second partitioning must not change any value
    got2 = {
        (r["split"], r["id"]): r["cum"]
        for r in with_grouped_cumsum(
            df.repartition(3), ["split"], ["id"], "w", num_partitions=16
        ).collect()
    }
    assert got2 == got


def test_grouped_cumsum_join_path_at_1000_groups(spark):
    """VERDICT r3 next-round #5: the offsets-table JOIN path must equal
    both the literal path and a pure-Python fold at 10^3 groups (where
    the literal map is exactly what we must NOT build), and the auto
    dispatch must route there above the ceiling."""
    from cocrawler_spark.operators import ordering as od

    n_groups = 1000
    rows = [
        (i, f"g{(i * 7) % n_groups:04d}", (i * 13) % 9 + 1)
        for i in range(1, 4001)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    join_out = {
        (r["grp"], r["id"]): r["cum"]
        for r in od.with_grouped_cumsum(
            df.repartition(7), ["grp"], ["id"], "w",
            num_partitions=16, offsets_via="join",
        ).collect()
    }
    assert len(join_out) == 4000
    acc: dict = {}
    for i, g, w in sorted(rows):
        acc[g] = acc.get(g, 0) + w
        assert join_out[(g, i)] == acc[g], (g, i)
    lit_out = {
        (r["grp"], r["id"]): r["cum"]
        for r in od.with_grouped_cumsum(
            df.repartition(5), ["grp"], ["id"], "w",
            num_partitions=16, offsets_via="literal",
        ).collect()
    }
    assert lit_out == join_out
    # auto: 1000 groups x partitions > ceiling -> join path (no plan
    # literal map); spot-check by plan string absence of a create_map
    auto_df = od.with_grouped_cumsum(
        df, ["grp"], ["id"], "w", num_partitions=16, offsets_via="auto"
    )
    plan = auto_df._jdf.queryExecution().optimizedPlan().toString()
    assert "map(" not in plan.lower() or "keys:" not in plan.lower()
    auto_out = {(r["grp"], r["id"]): r["cum"] for r in auto_df.collect()}
    assert auto_out == join_out
