"""Search-index by-products of a crawl: inverted-index postings stats
and per-target anchor-text rollups.

A production crawler feeds an indexer; these are the two index-side
aggregations that are pure crawl output (no ranker needed):

* ``inverted_postings`` — term-level postings statistics (document
  frequency, total term frequency) from the token explode. The
  vocabulary table every downstream index build / stopword list /
  idf model starts from.

* ``anchor_text_topk`` — the classic anchor-text signal: for each link
  TARGET, the top-k most frequent anchor strings pointing at it
  (anchor text describes the target better than the target's own
  text — the original web-search insight). Input is the (target,
  anchor) pair list the outlink parser emits.

Scale notes (10^10-link regime): both are explode → partial-agg →
shuffle-on-key shapes. Term and target keys are Zipf-skewed; the
groupBy sums are map-side-combined so hot keys arrive pre-reduced,
and the anchor top-k window partitions by (target) AFTER the pair
counts are aggregated — the window input is |distinct pairs|, not
|links|. No global sorts, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cocrawler_spark.functions.text import tokens_col


def inverted_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    min_df: int = 1,
) -> DataFrame:
    """(term, df, total_tf): per-term document frequency and total
    term frequency over the corpus, keeping terms with df >= min_df.

    Plan: token explode → groupBy(id, term) for per-doc tf (map-side
    combine absorbs within-doc repeats) → groupBy(term) for df +
    total_tf. Two shuffles, both on pre-aggregated rows.
    """
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    )
    tf = tok.groupBy("id", "term").agg(F.count("*").alias("tf"))
    out = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out


def anchor_text_topk(
    links: DataFrame,
    target_col: str = "target",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """(target, anchor, n, rank): each target's top-k anchor strings by
    frequency; deterministic ties by (n desc, anchor asc).

    Plan: groupBy(target, anchor) count (map-side combine soaks the
    hot-target skew) → per-target window top-k over the aggregated
    pairs. The window partition is bounded by a target's DISTINCT
    anchor vocabulary, not its in-link count, so mega-popular hosts
    don't produce mega-partitions.
    """
    counts = (
        links.filter(
            F.col(target_col).isNotNull() & F.col(anchor_col).isNotNull()
        )
        .groupBy(
            F.col(target_col).alias("target"),
            F.col(anchor_col).alias("anchor"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("target").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("target", "anchor", "n", "rank")
    )
