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


def read_seed_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("url")


def read_seed_text(spark: SparkSession, path: str) -> DataFrame:
    """Text seed list: one URL per line, '#' comments, blank lines skipped."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter((F.col("url") != "") & (~F.col("url").startswith("#")))
    )
