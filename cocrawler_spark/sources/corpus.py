"""Input readers: interleaved corpus, robots source, seed list.

Reference analogs: cocrawler/seeds.py — expand_seeds_config† (text file,
'#' comments, scheme defaulting happens in canonicalize) and the aiohttp
fetch path (cocrawler/fetcher.py†) whose sandbox analog is the documents
table itself (SURVEY.md §1 row 8: a fetch = equi-join on doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Interleaved (doc_id, spans) corpus. Columns are pruned by Catalyst
    at the scan, so callers selecting only doc_id never read span bytes."""
    return spark.read.parquet(path)


def read_robots_src(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def robots_src_from_txt(
    df: DataFrame,
    txt_col: str = "robots_txt",
    host_col: str = "host",
    agent: str = "cocrawler",
    default_ttl_waves: int = 3,
) -> DataFrame:
    """Raw per-host robots.txt bodies → the structured robots_src
    schema the engine's broadcast robots join consumes
    (host, crawl_delay, ttl_waves, allow, disallow).

    The parse is the full REP text parser
    (functions/robots.py:parse_robots_txt_udf — RFC 9309 group
    selection for ``agent``), Arrow-batched over |hosts| rows — never
    |urls|. ``ttl_waves`` is an engine scheduling knob with no REP
    wire form, so every parsed row gets ``default_ttl_waves`` (a real
    deployment would derive it from HTTP cache headers at fetch time).
    Engine-equality of text-parsed vs structured robots is pinned in
    tests/test_engine_oracle.py."""
    from ..functions.robots import parse_robots_txt_udf

    parsed = df.select(
        F.col(host_col).alias("host"),
        parse_robots_txt_udf(agent)(F.col(txt_col)).alias("r"),
    )
    return parsed.select(
        "host",
        F.col("r.crawl_delay").alias("crawl_delay"),
        F.lit(int(default_ttl_waves)).cast("int").alias("ttl_waves"),
        F.col("r.allow").alias("allow"),
        F.col("r.disallow").alias("disallow"),
    )


def read_seed_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("url")


def read_seed_text(spark: SparkSession, path: str) -> DataFrame:
    """Text seed list: one URL per line, '#' comments, blank lines skipped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter((F.col("url") != "") & (~F.col("url").startswith("#")))
    )


def parse_sitemaps(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Sitemap (urlset) ingestion: explode each sitemap XML document
    into one row per ``<url>`` entry with its ``<loc>`` (required,
    whitespace-trimmed), ``<priority>`` (double, NULL when absent) and
    ``<lastmod>`` (string, NULL when absent).

    Reference analog: a crawler's sitemap seed path (robots.txt
    `Sitemap:` lines feeding the frontier). Pure JVM regex chain —
    regexp_extract_all over the ``<url>`` blocks, then per-block field
    extracts — so the whole parse stays in whole-stage codegen; at
    10^10 sitemap entries this is a map-only operator (zero shuffles)
    whose output unions straight into the seed/candidate stream.
    Entries with an empty ``<loc>`` are dropped. Sitemap INDEX files
    (`<sitemapindex>` of nested sitemap locs) are one recursion of the
    same parse — callers loop parse → fetch → parse; the engine seam is
    the candidate stream, so no special casing here.

    All non-xml columns pass through unchanged.
    """
    passthrough = [c for c in df.columns if c != xml_col]
    blocks = df.select(
        *passthrough,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), 1)
        ).alias("_blk"),
    )
    loc = F.regexp_extract("_blk", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    prio = F.regexp_extract("_blk", r"<priority>\s*([0-9.eE+-]+)\s*</priority>", 1)
    lastmod = F.regexp_extract("_blk", r"<lastmod>\s*([^<\s]+)\s*</lastmod>", 1)
    return (
        blocks.select(
            *passthrough,
            loc.alias("url"),
            F.when(prio != "", prio.cast("double")).alias("priority"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("url") != "")
    )


def parse_sitemap_index(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Sitemap INDEX ingestion: explode each ``<sitemapindex>`` XML
    document into one row per nested ``<sitemap>`` entry with its
    ``<loc>`` (required, trimmed) and ``<lastmod>`` (NULL when absent).

    The nesting recursion is: parse_sitemap_index → fetch each loc →
    parse_sitemaps (urlset leaves). Sitemap indexes are capped at
    50 000 entries per file by the protocol, so the explode fan-out is
    bounded; like parse_sitemaps this is a map-only JVM regex chain —
    zero shuffles, whole-stage codegen throughout. Entries with an
    empty ``<loc>`` are dropped; non-xml columns pass through.
    """
    passthrough = [c for c in df.columns if c != xml_col]
    blocks = df.select(
        *passthrough,
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1
            )
        ).alias("_blk"),
    )
    loc = F.regexp_extract("_blk", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract("_blk", r"<lastmod>\s*([^<\s]+)\s*</lastmod>", 1)
    return (
        blocks.select(
            *passthrough,
            loc.alias("sitemap_url"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("sitemap_url") != "")
    )
