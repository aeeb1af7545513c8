"""Per-host politeness/budget ranking — with exact two-phase skew salting.

The reference serializes fetches per host with a time-per-host dict
(cocrawler/scheduler.py†). Our wave rendering needs, per host, the
rank of every frontier item under the priority order
(priority, rand, surt) — a `row_number() over (partition by host ...)`.
At 10^10 scale a hot host concentrates one window partition on one
task (AQE does NOT split window skew), so this module provides an
EXACT salted equivalent (SURVEY.md §7 hard-part #4):

  1. bucket = floor(rand / (2^60 / S)) — a RANGE bucket of the rand
     tiebreaker, so buckets are ordered and rank offsets compose;
  2. local row_number within (host, priority, bucket) — hot hosts now
     spread across S × |priorities| tasks;
  3. per-(host, priority, bucket) counts (tiny) → running offsets via a
     window over the counts table (rows = hosts × priorities × S);
  4. rn = local + offset — bit-identical to the unsalted window
     (tests/test_state_ops.py asserts equality), politeness semantics
     untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RAND_SPACE = 2 ** 60  # keyed_hash64 range


def with_per_host_rank(
    df: DataFrame, salt_buckets: int = 0, rn_col: str = "_rn"
) -> DataFrame:
    """Attach per-host rank under (priority, rand, surt) order.

    salt_buckets == 0 → plain window (fine below ~10^5 rows/host).
    salt_buckets > 0  → exact two-phase salted rank for hot hosts.
    """
    if salt_buckets <= 0:
        w = Window.partitionBy("host").orderBy("priority", "rand", "surt")
        return df.withColumn(rn_col, F.row_number().over(w))

    width = RAND_SPACE // salt_buckets
    df = df.withColumn("_rb", (F.col("rand") / F.lit(width)).cast("int"))
    wl = Window.partitionBy("host", "priority", "_rb").orderBy("rand", "surt")
    df = df.withColumn("_local", F.row_number().over(wl))
    counts = df.groupBy("host", "priority", "_rb").agg(F.count("*").alias("_cnt"))
    wo = (
        Window.partitionBy("host")
        .orderBy("priority", "_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0))
    ).select("host", "priority", "_rb", "_off")
    out = df.join(F.broadcast(offsets), ["host", "priority", "_rb"], "left")
    return out.withColumn(rn_col, (F.col("_local") + F.col("_off")).cast("int")).drop(
        "_rb", "_local", "_off"
    )
