"""Unit tests: sitemap parsing edge cases + A-ES weighted sampling
properties (the driver oracle pair covers sf0.01 equality; these pin
malformed-input behavior and the statistical/determinism contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocrawler_spark.operators.curation import weighted_sample_topk
from cocrawler_spark.sources.corpus import parse_sitemaps


def test_parse_sitemaps_edges(spark):
    xml = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.test/1</loc><priority>0.8</priority></url>
  <url>
    <loc>
      http://a.test/2
    </loc>
    <lastmod>2024-01-02</lastmod>
  </url>
  <url><loc></loc><priority>0.5</priority></url>
  <url><priority>0.9</priority></url>
  <url><loc>http://a.test/3</loc><priority>bogus</priority></url>
</urlset>"""
    df = spark.createDataFrame([("s1", xml)], ["sm_id", "xml"])
    rows = {r["url"]: r for r in parse_sitemaps(df).collect()}
    # empty-loc and loc-less entries dropped; 3 survive
    assert set(rows) == {"http://a.test/1", "http://a.test/2", "http://a.test/3"}
    assert rows["http://a.test/1"]["priority"] == 0.8
    assert rows["http://a.test/1"]["lastmod"] is None
    # multi-line whitespace around loc trimmed
    assert rows["http://a.test/2"]["lastmod"] == "2024-01-02"
    assert rows["http://a.test/2"]["priority"] is None
    # unparseable priority -> NULL, row kept
    assert rows["http://a.test/3"]["priority"] is None
    # passthrough column survives the explode
    assert all(r["sm_id"] == "s1" for r in rows.values())


def test_parse_sitemap_index_edges(spark):
    from cocrawler_spark.sources.corpus import parse_sitemap_index

    xml = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.test/s1.xml</loc><lastmod>2024-02-03</lastmod></sitemap>
  <sitemap>
    <loc>
      http://a.test/s2.xml
    </loc>
  </sitemap>
  <sitemap><loc></loc></sitemap>
  <sitemap><lastmod>2024-01-01</lastmod></sitemap>
</sitemapindex>"""
    df = spark.createDataFrame([("i1", xml)], ["src", "xml"])
    rows = {r["sitemap_url"]: r for r in parse_sitemap_index(df).collect()}
    assert set(rows) == {"http://a.test/s1.xml", "http://a.test/s2.xml"}
    assert rows["http://a.test/s1.xml"]["lastmod"] == "2024-02-03"
    assert rows["http://a.test/s2.xml"]["lastmod"] is None
    assert all(r["src"] == "i1" for r in rows.values())
    # urlset leaves are NOT index entries
    leaf = '<urlset><url><loc>http://a.test/p</loc></url></urlset>'
    assert parse_sitemap_index(
        spark.createDataFrame([("x", leaf)], ["src", "xml"])
    ).count() == 0


def test_weighted_sample_proportional_and_deterministic(spark):
    # 200 heavy docs (w=50) + 800 light (w=1): heavy docs should
    # dominate a k=100 draw (each heavy doc ~50x the inclusion odds).
    rows = [(i, 50 if i < 200 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    take = weighted_sample_topk(df, weight_col="w", k=100, id_col="id", seed=3)
    got = sorted(r["id"] for r in take.collect())
    heavy = sum(1 for i in got if i < 200)
    assert len(got) == 100
    assert heavy > 70  # E[heavy] ≈ 92 under A-ES; 70 is ~5 sigma slack
    # determinism under repartitioning: same survivors, same ranks
    take2 = weighted_sample_topk(
        df.repartition(13, "w"), weight_col="w", k=100, id_col="id", seed=3
    )
    a = sorted((r["id"], r["aes_rank"]) for r in take.collect())
    b = sorted((r["id"], r["aes_rank"]) for r in take2.collect())
    assert a == b
    # a different seed draws a different set
    take_s9 = weighted_sample_topk(df, weight_col="w", k=100, id_col="id", seed=9)
    assert sorted(r["id"] for r in take_s9.collect()) != got


def test_weighted_sample_strata_and_nonpositive(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", float(i % 7) - 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    out = weighted_sample_topk(
        df, weight_col="w", k=5, id_col="id", stratum_col="g", seed=0
    ).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
        assert r["w"] > 0  # non-positive weights excluded
    assert sorted(by_g) == ["a", "b"]
    for g, rs in by_g.items():
        assert len(rs) == 5
        assert sorted(r["aes_rank"] for r in rs) == [1, 2, 3, 4, 5]


def test_normalize_text_unicode(spark):
    from cocrawler_spark.functions.text import (
        normalize_text_py,
        normalize_text_sql,
        normalize_text_udf,
    )

    cases = [
        "Café  du\xa0Parc",      # decomposed + NBSP + run
        "\t å b \r\n",           # å decomposed, CRLF, edge ws
        "plain ascii",
        "",
    ]
    expect = ["Caf\u00e9 du Parc", "\u00e5 b", "plain ascii", ""]
    import unicodedata
    assert all(unicodedata.normalize("NFC", c) != c for c in cases[:2])
    assert [normalize_text_py(c) for c in cases] == expect
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "s"])
    got = {r["i"]: r["n"] for r in
           df.select("i", normalize_text_udf()(df["s"]).alias("n")).collect()}
    assert [got[i] for i in range(len(cases))] == expect
    # DuckDB twin parity on the same cases
    import duckdb
    con = duckdb.connect()
    for c, e in zip(cases, expect):
        lit = "'" + c.replace("'", "''") + "'"
        assert con.execute(f"SELECT {normalize_text_sql(lit)}").fetchone()[0] == e


def test_robots_sitemap_directives_extract(spark):
    from cocrawler_spark.functions.robots import sitemap_urls_col

    txt = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.test/s1.xml\n"
        "  SITEMAP:   http://a.test/s2.xml  \n"
        "sitemap-not: http://a.test/nope.xml\n"
        "#Sitemap: http://a.test/comment.xml\n"
    )
    df = spark.createDataFrame([(txt,)], ["t"])
    got = df.select(sitemap_urls_col(df["t"]).alias("u")).collect()[0]["u"]
    assert got == ["http://a.test/s1.xml", "http://a.test/s2.xml"]


def test_weighted_sample_unstratified_two_phase_matches_direct(spark):
    # the sharded global top-k must equal a direct sort by the same key
    rows = [(i, float(1 + i % 9)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = sorted(
        (r["id"], r["aes_rank"])
        for r in weighted_sample_topk(df, weight_col="w", k=25, id_col="id", seed=5).collect()
    )
    # direct: compute the key in-driver with the same formula
    from cocrawler_spark.functions.text import md5_hash64_col
    keyed = df.select(
        "id",
        (F.log(
            (F.pmod(md5_hash64_col(F.concat(F.col("id").cast("string"), F.lit(":5"))),
                    F.lit(1_000_000)) + F.lit(0.5)) / F.lit(1e6)
        ) / F.col("w")).alias("key"),
    ).collect()
    direct = sorted(
        (r["id"], i + 1)
        for i, r in enumerate(sorted(keyed, key=lambda r: (-r["key"], r["id"])))
        if i < 25
    )
    assert got == direct
