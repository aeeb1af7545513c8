"""Global total-order operators — the priority-queue analog.

Reference analog: cocrawler/scheduler.py — an asyncio.PriorityQueue of
(priority, rand, surt) tuples†. A distributed engine must never funnel
the frontier through one node to get a total order, so:

- `with_global_seq` assigns a global 1-based rank over arbitrary sort
  keys using range partitioning (sampled boundaries) + per-partition
  local ranks + a driver-side cumulative offset of per-partition counts
  — O(rows/partitions) per task, no single-partition sort, the same
  technique Spark's own sortBy+zipWithIndex idiom uses but staying in
  the DataFrame API.
- At 1000-executor scale the range exchange is one shuffle of the
  (already politeness-filtered) fetchable slice; the count pass rides
  the persisted exchange output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def with_global_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    num_partitions: int | None = None,
    persisted: list | None = None,
    total_out: dict | None = None,
) -> DataFrame:
    """Attach a global 1-based dense sequence following `order_cols`.

    The range-partitioned intermediate is persisted so the count pass
    and the rank pass share one shuffle; it is appended to `persisted`
    (if given) for the caller to unpersist at end of wave. The count
    pass already knows the total row count — callers that need it get
    it for free via `total_out['total']` instead of a second count job.
    """
    p = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    part = (
        df.repartitionByRange(int(p), *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if persisted is not None:
        persisted.append(part)
    counts = {r["_pid"]: r["cnt"] for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    if total_out is not None:
        total_out["total"] = sum(counts.values())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        mapping = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
    else:
        mapping = F.create_map()
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (
        part.withColumn("_local", F.row_number().over(w))
        .withColumn(seq_col, (F.col("_local") + F.coalesce(mapping[F.col("_pid")], F.lit(0))).cast("long"))
        .drop("_pid", "_local")
    )
    return out


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
    persisted: list | None = None,
) -> DataFrame:
    """Attach the global running total of `sum_col` following
    `order_cols` (inclusive of the current row) — the distributed
    prefix sum. Same two-pass shape as with_global_seq: range
    partition on the order keys, per-partition PARTIAL SUMS collected
    to the driver (O(partitions) rows, never data), then a
    per-partition window cumsum shifted by the driver-computed offset.
    No single-partition window at any size.

    The range-partitioned intermediate is persisted so both passes
    share one shuffle; appended to `persisted` (if given) for the
    caller to unpersist after materialization."""
    p = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    part = (
        df.repartitionByRange(int(p), *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if persisted is not None:
        persisted.append(part)
    sums = {
        r["_pid"]: r["s"]
        for r in part.groupBy("_pid")
        .agg(F.sum(sum_col).alias("s"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)
    if offsets:
        mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    else:
        mapping = F.create_map()
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.withColumn("_local", F.sum(sum_col).over(w))
        .withColumn(
            out_col,
            (F.col("_local") + F.coalesce(mapping[F.col("_pid")], F.lit(0))).cast("long"),
        )
        .drop("_pid", "_local")
    )
