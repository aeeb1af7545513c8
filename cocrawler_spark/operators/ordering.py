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


# (group, partition) offset pairs above this go through the broadcast
# join path instead of plan literals — a literal map's plan-string cost
# grows linearly with entries and is re-parsed on every optimization.
GROUPED_CUMSUM_LITERAL_GROUP_CEILING = 256


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


def with_grouped_cumsum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    sum_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
    persisted: list | None = None,
    offsets_via: str = "auto",
) -> DataFrame:
    """Per-group running total of `sum_col` following `order_cols`
    WITHIN each group (inclusive) — the grouped prefix sum, for groups
    far too large for a single window partition (e.g. packing a corpus
    per train/val/test split). Range-partition on (group, order) keys
    so each group's rows are contiguous across partitions, derive the
    per-(partition, group) partial sums (O(partitions + groups) rows —
    a boundary partition holds at most 2 groups' partials beyond its
    own), and shift each partition's local window cumsum by the offset
    for its (group, partition) pair.

    Two physical paths for the offsets, same semantics (equality +
    property tests pin them against each other and a Python mirror):
    - ``literal``: collect the partials, compile the offset map into
      the plan — cheapest when group cardinality is small (splits,
      languages, shards; ≤ GROUPED_CUMSUM_LITERAL_GROUP_CEILING keys).
    - ``join``: offsets stay a DataFrame (window prefix sum over the
      partials, broadcast-joined back) — no driver round-trip, no plan
      literals; the path for 10³+ groups (per-domain packing, per-host
      quotas) where a literal map would bloat the plan string.
    ``offsets_via='auto'`` probes the partials' size (one count over a
    bounded limit of the already-persisted input) and dispatches.
    Group values must render identically via str() and CAST(string)
    (strings and integers do) — literal path only."""
    from collections import defaultdict

    if offsets_via not in ("auto", "literal", "join"):
        raise ValueError(f"offsets_via: {offsets_via}")
    p = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    keys = [F.col(c) for c in list(group_cols) + list(order_cols)]
    part = (
        df.repartitionByRange(int(p), *keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if persisted is not None:
        persisted.append(part)
    sums = part.groupBy("_pid", *group_cols).agg(F.sum(sum_col).alias("s"))
    if offsets_via == "auto":
        ceil = GROUPED_CUMSUM_LITERAL_GROUP_CEILING
        probe = sums.limit(ceil + 1).count()
        offsets_via = "literal" if probe <= ceil else "join"
    if offsets_via == "join":
        woff = (
            Window.partitionBy(*group_cols)
            .orderBy(F.col("_pid").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = sums.select(
            "_pid",
            *group_cols,
            F.coalesce(F.sum("s").over(woff), F.lit(0)).cast("long").alias("_goff"),
        )
        w = (
            Window.partitionBy("_pid", *group_cols)
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            part.withColumn("_local", F.sum(sum_col).over(w))
            .join(F.broadcast(offs), ["_pid", *group_cols])
            .withColumn(out_col, (F.col("_local") + F.col("_goff")).cast("long"))
            .drop("_pid", "_local", "_goff")
        )
    rows = sums.collect()
    per_group: dict = defaultdict(list)
    for r in rows:
        gkey = "\x00".join(str(r[c]) for c in group_cols)
        per_group[gkey].append((int(r["_pid"]), int(r["s"] or 0)))
    offsets = {}
    for gkey, lst in per_group.items():
        acc = 0
        for pid, sm in sorted(lst):
            offsets[f"{gkey}\x00{pid}"] = acc
            acc += sm
    if offsets:
        mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    else:
        mapping = F.create_map()
    mkey = F.concat_ws(
        "\x00",
        *[F.col(c).cast("string") for c in group_cols],
        F.col("_pid").cast("string"),
    )
    w = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.withColumn("_local", F.sum(sum_col).over(w))
        .withColumn(
            out_col,
            (F.col("_local") + F.coalesce(mapping[mkey], F.lit(0))).cast("long"),
        )
        .drop("_pid", "_local")
    )
