"""Chunk-level (paragraph-granularity) exact dedup
(operators/dedup.py: chunk_col / duplicated_chunk_stats / chunk_dedup)
vs a pure-Python reference, plus edge cases (empty text, partial final
chunk, self-repetition) and partition invariance."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocrawler_spark.operators.dedup import (
    chunk_col,
    chunk_dedup,
    duplicated_chunk_stats,
)

W = 3  # chunk width in words for the tests

DOCS = [
    (1, "a b c d e f g"),            # chunks: "a b c", "d e f", "g"
    (2, "a b c x y z"),              # shares "a b c" with doc 1
    (3, "d e f d e f"),              # self-repeated chunk
    (4, "q r s"),                    # unique single chunk
    (5, ""),                         # empty
]


def _py_chunks(text, w=W):
    words = text.split(" ") if text else []
    if not words or words == [""]:
        words = [x for x in text.split(" ") if True] if text else []
    return [" ".join(words[i : i + w]) for i in range(0, len(words), w)]


def _df(spark, parts=None):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def test_chunk_col(spark):
    got = {
        r["doc_id"]: r["chunks"]
        for r in _df(spark)
        .select("doc_id", chunk_col(F.col("text"), W).alias("chunks"))
        .collect()
    }
    # Spark split("") yields [""] (size 1) — one empty chunk, matching
    # DuckDB string_split semantics; documents with empty text are a
    # caller-side filter concern.
    assert got[1] == ["a b c", "d e f", "g"]
    assert got[2] == ["a b c", "x y z"]
    assert got[3] == ["d e f", "d e f"]
    assert got[5] == [""]


def test_duplicated_chunk_stats(spark):
    got = {
        r["id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_ratio"])
        for r in duplicated_chunk_stats(_df(spark), "text", "doc_id", W).collect()
    }
    # global chunk frequencies: "a b c"x2, "d e f"x3 (doc1 + doc3 twice),
    # "g"x1, "x y z"x1, "q r s"x1, ""x1
    assert got[1] == (3, 2, round(2 / 3, 6))
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 2, 1.0)
    assert got[4] == (1, 0, 0.0)


def test_chunk_dedup_first_occurrence_wins(spark):
    got = {
        r["id"]: (r["text_deduped"], r["n_kept"], r["n_total"])
        for r in chunk_dedup(_df(spark), "text", "doc_id", W).collect()
    }
    # winner per chunk = min (id, pos):
    #   "a b c" -> (1,0); "d e f" -> (1,1); "g" -> (1,2)
    #   "x y z" -> (2,1); "q r s" -> (4,0); "" -> (5,0)
    assert got[1] == ("a b c d e f g", 3, 3)
    assert got[2] == ("x y z", 1, 2)
    assert got[3] == ("", 0, 2)
    assert got[4] == ("q r s", 1, 1)


def test_partition_invariance(spark):
    a = sorted(
        duplicated_chunk_stats(_df(spark, 1), "text", "doc_id", W).collect()
    )
    b = sorted(
        duplicated_chunk_stats(_df(spark, 5), "text", "doc_id", W).collect()
    )
    assert a == b
