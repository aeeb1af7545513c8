"""Similarity search over embedding columns (array<float>).

- `cosine_topk_bruteforce`: exact top-k neighbors for a (small) query
  set — the query side is broadcast, the corpus side streams; the dot
  product is a JVM-side `zip_with`+`aggregate` (no Python). This is the
  correctness baseline and stays viable at 100 TB when |queries| is
  small (broadcast × scan = one pass, no shuffle beyond top-k).
- `lsh_ann_topk`: random-hyperplane LSH bucketing — hyperplane
  components are deterministic pseudo-randoms derived from md5 hashes,
  so the same buckets are reproducible in SQL for the oracle. Scale
  path: candidates only join within a bucket (and optional multiprobe
  neighbors), turning the N×Q cross product into bucket-local joins.
- An IVF variant would follow the same shape with learned centroids;
  the bucket-join skeleton here is the part Spark needs to get right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_hash64_col, md5_hash64_sql


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine): exact top-k by cosine,
    self-match excluded. Ties broken by neighbor_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cos", cosine_col(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("cos"), round_to).alias("cosine"),
        )
    )


def hyperplane_sign_col(vec, plane_id: int, seed: str = "ann") -> F.Column:
    """sign(Σ_j r_{plane,j} · v_j) with r = deterministic pseudo-random in
    [-1, 1) from md5h(seed:plane:j) — reproducible in DuckDB."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    comp = F.zip_with(
        vec.cast("array<double>"),
        idx,
        lambda v, j: v
        * (
            (
                F.pmod(
                    md5_hash64_col(
                        F.concat_ws(":", F.lit(seed), F.lit(plane_id), j.cast("string"))
                    ),
                    F.lit(1000),
                ).cast("double")
                / F.lit(500.0)
            )
            - F.lit(1.0)
        ),
    )
    s = F.aggregate(comp, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket_col(vec, n_planes: int = 8, seed: str = "ann"):
    b = F.lit(0)
    for p in range(n_planes):
        b = b + hyperplane_sign_col(vec, p, seed) * F.lit(2 ** p)
    return b.cast("int")


def hyperplane_sign_sql(vec_expr: str, plane_id: int, seed: str = "ann") -> str:
    """DuckDB twin of hyperplane_sign_col — same md5-derived pseudo-random
    components in the same left-to-right summation order."""
    rand = md5_hash64_sql(f"'{seed}:{plane_id}:' || CAST(j AS VARCHAR)")
    comp = (
        f"list_sum(list_transform(range(len({vec_expr})), j -> "
        f"CAST({vec_expr}[j + 1] AS DOUBLE) * "
        f"((({rand}) % 1000) / 500.0 - 1.0)))"
    )
    return f"(CASE WHEN {comp} >= 0 THEN 1 ELSE 0 END)"


def lsh_bucket_sql(vec_expr: str, n_planes: int = 8, seed: str = "ann") -> str:
    """DuckDB twin of lsh_bucket_col."""
    terms = [
        f"{hyperplane_sign_sql(vec_expr, p, seed)} * {2 ** p}"
        for p in range(n_planes)
    ]
    return "CAST((" + " + ".join(terms) + ") AS INT)"


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_planes: int = 6,
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* the query's LSH
    bucket. Recall grows with multiprobe/fewer planes; the join is
    bucket-local (shuffle key = bucket)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_col(F.col(vec_col), n_planes).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.withColumn(
        "cos",
        cosine_col(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "rank",
            F.round(F.col("cos"), round_to).alias("cosine"),
        )
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    round_to: int = 4,
    exact: bool = False,
    n_planes: int = 6,
    seed: str = "ann",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ τ).

    Default (``exact=False``) is the 100 TB path: candidate pairs only
    within an LSH random-hyperplane bucket — an *equi-join on the bucket
    key* (shuffle key = bucket, no cross product), then exact cosine and
    the threshold on candidates. Recall is tunable via ``n_planes``
    (fewer planes → bigger buckets → higher recall, more candidates).

    ``exact=True`` keeps the O(n²) brute-force self-join as the
    correctness baseline for small slices — never the default, and never
    what a pipeline should call at scale.
    """
    e = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if exact:
        a = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        eb = e.withColumn("bucket", lsh_bucket_col(F.col("v"), n_planes, seed))
        a = eb.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = eb.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.withColumn(
        "cos",
        cosine_col(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")),
    )
    return scored.filter(F.col("cos") >= threshold).select(
        "id_a", "id_b", F.round(F.col("cos"), round_to).alias("cosine")
    )
