"""Connected-components clustering over near-dup candidate pairs.

Near-dup dedup at training-data scale is transitive: if A~B and B~C,
the three docs are ONE boilerplate family even when A and C never share
an LSH bucket. The pairwise min-id survivor rule used by the one-pass
pipeline stage (plans/pipeline.py) under-collapses exactly those
chains, so the standard production shape is: LSH candidate pairs →
connected components → keep one representative per component.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC'14) — the
MapReduce/Spark-native CC algorithm. Each round is two hash-shuffle
groupBys (no global sort, no driver-side graph); rounds needed is
O(log² n) worst case and 2-3 in practice for the shallow, dense
components near-dup graphs produce. This is the same algorithmic shape
GraphFrames' connectedComponents uses; implemented here directly on
DataFrames so the repo carries no extra dependency.

Determinism: the fixed point is unique (every node ends pointing at
its component's minimum id), so the result is independent of iteration
count, partitioning, and scheduling. Convergence is detected by an
order-invariant checksum (count + sum of xxhash64 over the canonical
edge set); the fixed point is a genuine fixed point of both stars, so
a checksum match after a small-star round is a true convergence test
up to 64-bit multiset-hash collision.

Scale notes (10^10-doc regime): edges are (long, long)-width rows; the
only wide ops per round are two groupBys keyed by node id — uniform by
construction when ids are hashes, Zipf-skewed when one component is a
mega boilerplate family, in which case large-star is the degree
splitter: it re-points every high node of a star at the component min,
so no single groupBy key accumulates more than that node's current
neighbors, shrinking every round. Pair inputs should already be
mega-bucket-capped (operators/dedup.py max_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edge set → edges (v, m(u)) for every neighbor v > u, where
    m(u) = min(N(u) ∪ {u}). Connects every large neighbor to the
    smallest node seen around u."""
    nbrs = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("_mv"), F.col("u")).alias("m"))
    )
    return (
        nbrs.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Canonicalized (u,v), u > v → edges (x, m) re-pointing u and all
    its smaller neighbors at m = min(N⁻(u) ∪ {u})."""
    canon = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = canon.groupBy("u").agg(F.min("v").alias("m"))  # all v < u ⇒ m < u
    small_nbrs = (
        canon.join(mins, "u")
        .select(F.col("v").alias("x"), "m")
        .filter(F.col("x") != F.col("m"))
    )
    selfs = mins.select(F.col("u").alias("x"), "m")  # u > m always
    return (
        small_nbrs.union(selfs)
        .select(F.col("x").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # decimal accumulator: a long sum of 64-bit hashes overflows under
    # ANSI arithmetic; decimal(38,0) is exact to ~10^19 edges
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Undirected edge list → (id, component) for every node appearing
    in `pairs`, with component = the minimum node id of its connected
    component. Ids must be orderable (long or string).

    Returns one row per distinct node, including component roots
    (root rows have id == component).
    """
    spark = pairs.sparkSession
    # localCheckpoint per round: each iteration self-joins the previous
    # edge set twice, so without lineage truncation the LOGICAL plan
    # doubles-squares every round and Catalyst's re-analysis cost grows
    # exponentially (measured: rounds 0/1/2 at 3.5s/2.6s/8.5s, round 3
    # unbounded). Caching alone does not truncate the plan. Checkpoint
    # blocks from prior rounds are freed eagerly below; a production
    # run over unreliable executors would checkpoint to the snapshot
    # catalog instead (reliable storage), same shape.
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _checksum(edges)
    if prev[0] == 0:
        return spark.createDataFrame([], "id long, component long").select(
            F.col("id").cast(pairs.schema[id_a].dataType).alias("id"),
            F.col("component").cast(pairs.schema[id_a].dataType).alias("component"),
        )
    # One star-round per checkpoint+checksum. Round 6 measured the
    # 2-rounds-per-batch variant (halve the convergence collects) and
    # REJECTED it: the pair graphs converge in 2-3 rounds, so batching
    # mostly runs extra star rounds past the fixed point — ~6 AQE
    # stages each — which costs more than the 1-job checksum it saves
    # (train_pipeline_keep_best interleaved A/B at sf0.1: batch-2
    # 6.6-17.5 s vs per-round 4.7-6.3 s).
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(nxt)
        edges.unpersist()  # free the previous round's checkpoint blocks
        edges = nxt
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # fixed point: every edge is (member, root) with member > root
    members = edges.select(
        F.col("u").alias("id"), F.col("v").alias("component")
    )
    roots = edges.select(F.col("v").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.unionByName(roots)


def keep_best_representative(
    docs: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup collapse with QUALITY-aware survivor selection: label
    docs with their connected component over the candidate-pair graph
    (docs in no pair are their own singleton component), then keep the
    highest-``quality_col`` doc per component (ties broken by min id).

    This is the production refinement of min-id dedup: when a
    boilerplate family holds one clean page and nine mirrors with
    injected ads, the training set should keep the CLEAN one, not the
    lexicographically first (CCNet/FineWeb-style pipelines pick per-
    cluster representatives by quality score for exactly this reason).

    Returns one row per component: (component, kept_id, <quality_col>,
    cluster_size).

    Plan: CC over the (long,long) edge list (see connected_components;
    pair inputs must already be bucket-capped), a left join of the
    |nodes|-sized label table onto docs, then ONE window over
    component — partition counts are component sizes, which the
    max_bucket cap bounds upstream, so no single task inherits a
    corpus-sized partition."""
    from pyspark.sql import Window

    comps = connected_components(pairs, id_a, id_b)
    labeled = (
        docs.join(comps, docs[id_col] == comps["id"], "left")
        .drop(comps["id"])
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
    )
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "cluster_size",
            F.count("*").over(Window.partitionBy("component")),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "component",
            F.col(id_col).alias("kept_id"),
            quality_col,
            "cluster_size",
        )
    )


def cc_oracle_sql(pairs_sql: str, id_a: str = "id_a", id_b: str = "id_b") -> str:
    """DuckDB twin: exact connected components of the pair set produced
    by `pairs_sql` via recursive min-label reachability — feasible at
    oracle scale (the recursion enumerates (node, reachable-node) pairs
    within each component), exact for grading."""
    return f"""
WITH RECURSIVE _pairs AS ({pairs_sql}),
_edges AS (
  SELECT {id_a} AS u, {id_b} AS v FROM _pairs WHERE {id_a} <> {id_b}
  UNION
  SELECT {id_b} AS u, {id_a} AS v FROM _pairs WHERE {id_a} <> {id_b}
),
_reach(id, r) AS (
  SELECT u, u FROM _edges
  UNION
  SELECT e.v, _reach.r FROM _reach JOIN _edges e ON e.u = _reach.id
)
SELECT id, MIN(r) AS component FROM _reach GROUP BY id
"""
