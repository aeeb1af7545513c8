"""All fixed StructTypes of the engine — declared once, never inferred
(SURVEY.md §1: the reference's schema is implicit in dict shapes; ours is
explicit so every state table and shuffle has a stable wire schema).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- the interleaved corpus (BASELINE.json:input_hint, authoritative) ------
SPAN = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN)),
    ]
)

# --- frontier: one row per queued URL (ridealong analog, SURVEY §1 row 1) --
FRONTIER = StructType(
    [
        StructField("url", StringType()),
        StructField("surt", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("priority", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("tries", IntegerType()),
        StructField("is_seed", BooleanType()),
        StructField("via", StringType()),  # 'seed' | 'link' | 'embed' | 'redirect' | 'retry'
    ]
)

SEEN = StructType([StructField("surt", StringType())])

ROBOTS = StructType(
    [
        StructField("host", StringType()),
        StructField("fetched_wave", IntegerType()),
        StructField("crawl_delay", DoubleType()),
        StructField("allow", ArrayType(StringType())),
        StructField("disallow", ArrayType(StringType())),
    ]
)

ROBOTS_SRC = StructType(
    [
        StructField("host", StringType()),
        StructField("crawl_delay", DoubleType()),
        StructField("ttl_waves", IntegerType()),
        StructField("disallow", ArrayType(StringType())),
        StructField("allow", ArrayType(StringType())),
    ]
)

CRAWL_ORDER = StructType(
    [
        StructField("wave", IntegerType()),
        StructField("seq", LongType()),
        StructField("surt", StringType()),
        StructField("url", StringType()),
    ]
)

FETCHED_CONTENT = StructType(
    [
        StructField("wave", IntegerType()),
        StructField("url", StringType()),
        StructField("surt", StringType()),
        StructField("status", IntegerType()),
        StructField("sha1", StringType()),
        StructField("n_spans", IntegerType()),
    ]
)

REDIRECTS = StructType(
    [
        StructField("wave", IntegerType()),
        StructField("from_url", StringType()),
        StructField("from_surt", StringType()),
        StructField("to_url", StringType()),
        StructField("to_surt", StringType()),
        StructField("kind", StringType()),  # special_redirect class or 'redirect'
    ]
)

METRICS = StructType(
    [
        StructField("wave", IntegerType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),  # 'sum' | 'max'
        StructField("value", DoubleType()),
    ]
)

SEEDS = StructType([StructField("url", StringType())])
