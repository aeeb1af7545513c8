"""SemDeDup: k-means embedding clustering + within-cluster semantic
near-dup collapse (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023).

The published pipeline shape: cluster the corpus embeddings with
k-means, then look for near-duplicate PAIRS only *inside* each cluster
— the cluster bound is what makes semantic dedup feasible at web scale
(pairwise work is sum of squared cluster sizes, not n²). At 10^10 docs
k grows with n (k ≈ n/10⁴ keeps clusters ~10⁴), so the within-cluster
join stays bounded; an optional ``max_cluster`` cap drops pathological
clusters from the pair stage exactly like operators/dedup.py's
``max_bucket``.

Spark-first shapes:
- Lloyd iteration = one narrow map (assign: argmin squared-L2 against
  k·dim plan literals — zero shuffle) + one hash-shuffle groupBy
  (centroid update: posexplode → avg per (cluster, dim)). The k·dim
  centroid table is collected to the driver per iteration (k≤10³,
  dim≤10³ → ≤8 MB — a dim table, not data).
- The pair stage is a cluster-keyed self-equi-join (shuffle key =
  cluster id), never a cross product.

Determinism / oracle parity: init centroids are the k smallest-id
vectors (no RNG); every updated centroid element and every distance is
ROUND(·, 6)-ed before use, so the ~1e-13 summation-order noise between
Spark's and DuckDB's float folds cannot flip an assignment; argmin
ties break on the lower cluster id. The DuckDB twin (semdedup_sql /
kmeans_sql) unrolls the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine_col


def _sqdist_lit(vec, cent: list[float]):
    """Squared L2 between an array column and a literal centroid —
    left-fold in double, same element order as the DuckDB twin."""
    arr = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(
            vec, arr,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec) + centroid literals → (id, cluster). Pure map: the
    argmin over k literal centroids is an array_min over (rounded
    distance, cluster-id) structs — no shuffle, no UDF."""
    structs = [
        F.struct(
            F.round(_sqdist_lit(F.col(vec_col), cv), 6).alias("d"),
            F.lit(int(c)).alias("c"),
        )
        for c, cv in cents
    ]
    best = F.array_min(F.array(*structs))
    return emb.select(
        F.col(id_col).alias("id"), best["c"].cast("long").alias("cluster")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's: init = the k smallest-id vectors, then
    ``iters - 1`` assign + per-(cluster, dim)-mean update rounds (each
    centroid element rounded to 6 dp) — the caller's final
    ``kmeans_assign`` is assignment round ``iters``, matching the SQL
    twin's a{iters-1} CTE. Returns [(cluster_id, centroid)] — clusters
    that lose all members drop out, exactly as in the SQL twin."""
    init = emb.orderBy(F.col(id_col).asc()).limit(k).select(vec_col).collect()
    cents = [(j, [float(x) for x in r[vec_col]]) for j, r in enumerate(init)]
    for _ in range(iters - 1):
        assigned = kmeans_assign(emb, cents, vec_col, id_col)
        ex = assigned.join(
            emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")),
            "id",
        ).select("cluster", F.posexplode(F.col("_v").cast("array<double>")))
        rows = (
            ex.groupBy("cluster", "pos")
            .agg(F.round(F.avg("col"), 6).alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in rows:
            by_c.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["m"])
        cents = [
            (c, [d[i] for i in sorted(d)]) for c, d in sorted(by_c.items())
        ]
    return cents


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int | None = None,
) -> DataFrame:
    """(id, vec) → (id, cluster) of the docs that SURVIVE semantic
    dedup: within each final k-means cluster, candidate pairs
    (id_a < id_b) with cosine ≥ ``threshold`` drop the larger id
    (min-id survivor, matching every other dedup stage in the repo).
    ``max_cluster`` (optional) exempts oversized clusters from the
    pair stage — they pass through undeduped but loggable, never
    quadratic."""
    cents = kmeans_fit(emb, k, iters, vec_col, id_col)
    assigned = kmeans_assign(emb, cents, vec_col, id_col)
    withv = assigned.join(
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")),
        "id",
    )
    if max_cluster is not None:
        from pyspark.sql import Window

        wc = Window.partitionBy("cluster")
        withv = withv.withColumn("_cn", F.count("*").over(wc)).filter(
            F.col("_cn") <= int(max_cluster)
        )
    a = withv.select(
        "cluster", F.col("id").alias("id_a"), F.col("_v").alias("va")
    )
    b = withv.select(
        "cluster", F.col("id").alias("id_b"), F.col("_v").alias("vb")
    )
    pairs = a.join(b, "cluster").filter(F.col("id_a") < F.col("id_b"))
    losers = (
        pairs.withColumn(
            "cos",
            cosine_col(
                F.col("va").cast("array<double>"),
                F.col("vb").cast("array<double>"),
            ),
        )
        .filter(F.round(F.col("cos"), 6) >= float(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return assigned.join(losers, "id", "left_anti")


# ---------------------------------------------------------------------------
# DuckDB twins: the same iterations unrolled as chained CTEs
# ---------------------------------------------------------------------------
def _sq_sql(vec_expr: str, cent_expr: str) -> str:
    d = f"(CAST({vec_expr}[i] AS DOUBLE) - {cent_expr}[i])"
    return f"list_sum(list_transform(range(1, len({vec_expr}) + 1), i -> {d} * {d}))"


def kmeans_ctes(
    tbl: str = "embeddings",
    vec: str = "embedding",
    id_: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> tuple[str, str]:
    """Returns (cte_text, final_assign_name): c0 = k smallest-id
    vectors, then per iteration aN (argmin assignment, ROUND(d,6) +
    cluster-id tiebreak) and cN+1 (per-dim ROUND(AVG,6) means)."""
    parts = [
        f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_}) - 1 AS c, CAST({vec} AS DOUBLE[]) AS v
  FROM (SELECT {id_}, {vec} FROM {tbl} ORDER BY {id_} LIMIT {k}))"""
    ]
    for it in range(iters):
        dist = _sq_sql(f"e.{vec}", "c.v")
        parts.append(f"""a{it} AS (
  SELECT {id_}, cluster FROM (
    SELECT e.{id_}, c.c AS cluster,
           ROW_NUMBER() OVER (PARTITION BY e.{id_}
             ORDER BY ROUND({dist}, 6) ASC, c.c ASC) AS rn
    FROM {tbl} e CROSS JOIN c{it} c)
  WHERE rn = 1)""")
        if it < iters - 1:
            parts.append(f"""c{it + 1} AS (
  SELECT c, list(m ORDER BY i) AS v FROM (
    SELECT a.cluster AS c, t.i, ROUND(AVG(CAST(e.{vec}[t.i] AS DOUBLE)), 6) AS m
    FROM a{it} a JOIN {tbl} e USING ({id_})
    CROSS JOIN range(1, {dim} + 1) t(i)
    GROUP BY a.cluster, t.i)
  GROUP BY c)""")
    return ",\n".join(parts), f"a{iters - 1}"


def semdedup_sql(
    tbl: str = "embeddings",
    vec: str = "embedding",
    id_: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.9,
    dim: int = 64,
) -> str:
    ctes, fin = kmeans_ctes(tbl, vec, id_, k, iters, dim)
    return f"""
WITH {ctes},
losers AS (
  SELECT DISTINCT b.{id_} AS id
  FROM {fin} a JOIN {fin} b ON a.cluster = b.cluster AND a.{id_} < b.{id_}
  JOIN {tbl} ea ON ea.{id_} = a.{id_}
  JOIN {tbl} eb ON eb.{id_} = b.{id_}
  WHERE ROUND(list_cosine_similarity(CAST(ea.{vec} AS DOUBLE[]),
                                     CAST(eb.{vec} AS DOUBLE[])), 6)
        >= {threshold})
SELECT f.{id_}, f.cluster
FROM {fin} f
WHERE f.{id_} NOT IN (SELECT id FROM losers)"""
