"""Probabilistic sketches — count-min frequency and HyperLogLog
cardinality estimation, deterministic and engine-portable.

At 100 TB you constantly want "roughly how often / roughly how many
distinct" without paying an exact global shuffle per question: hot-token
detection before a dedup join, per-host URL cardinality for frontier
budgeting, vocabulary mass estimates for mixing weights. Both sketches
here are built from the repo's md5-based 60-bit hash so every register
value is bit-identical across Spark and DuckDB — the ESTIMATES are
graded by the driver's value-hash oracle like any exact operator.

Scale shapes:
- Count-min: the cell table is d·w integers (a few KB) produced by ONE
  hash-shuffle groupBy with full map-side combine (cells, not tokens,
  cross the wire after partial agg). The probe compiles the collected
  cells into plan literals — no second shuffle, no join, and the min
  over d rows is a scalar expression.
- HyperLogLog: registers are max-aggregated per (group, bucket) — one
  groupBy whose key space is |groups|·m — then folded to one row per
  group. Missing buckets contribute 2^0 each (m - n_present term), and
  the standard small-range linear-counting correction is applied
  identically on both engines.

References: Cormode & Muthukrishnan 2005 (count-min); Flajolet et al.
2007 (HyperLogLog). Constants (alpha_m) follow the paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_hash64_col, md5_hash64_sql, tokens_col, tokens_sql


# ---------------------------------------------------------------------------
# count-min sketch — token frequency estimation
# ---------------------------------------------------------------------------

def _cms_bucket_col(token, r: int, w: int):
    return F.pmod(
        md5_hash64_col(F.concat(F.lit(f"cms{r}:"), token)), F.lit(w)
    )


def _cms_bucket_sql(token_expr: str, r: str | int, w: int) -> str:
    h = md5_hash64_sql(f"'cms' || {r} || ':' || {token_expr}")
    return f"(({h}) % {w})"


def cms_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """(token, true_count, cms_count) for every distinct token: the
    count-min estimate (min over d rows of the token's cell count)
    next to the exact count. CMS never underestimates, so
    cms_count >= true_count always; equality when no collision.

    One token explode feeds BOTH the exact counts and the d·w cell
    table (posexplode of the d bucket ids, then one groupBy over at
    most d·w cells). The cells are collected (d·w ints — a dim table)
    and compiled into the probe as a literal map, so the estimate adds
    zero shuffles beyond the build."""
    tok = docs.select(F.explode(tokens_col(F.col(text_col))).alias("t"))
    buckets = tok.select(
        "t",
        F.posexplode(
            F.array(*[_cms_bucket_col(F.col("t"), r, w) for r in range(d)])
        ).alias("r", "b"),
    )
    cells = {
        (int(row["r"]), int(row["b"])): int(row["c"])
        for row in buckets.groupBy("r", "b").agg(F.count("*").alias("c")).collect()
    }
    mapping = F.create_map(
        *[
            F.lit(x)
            for (r, b), c in sorted(cells.items())
            for x in (r * w + b, c)
        ]
    )
    true_c = tok.groupBy("t").agg(F.count("*").alias("true_count"))
    est = F.least(
        *[
            mapping[F.lit(r * w) + _cms_bucket_col(F.col("t"), r, w)]
            for r in range(d)
        ]
    )
    return true_c.select(
        F.col("t").alias("token"),
        F.col("true_count").cast("long").alias("true_count"),
        est.cast("long").alias("cms_count"),
    )


def cms_token_counts_sql(
    text_expr: str = "text",
    tbl: str = "documents",
    d: int = 4,
    w: int = 256,
) -> str:
    """DuckDB twin of cms_token_counts (cells via CTE + bucket join
    instead of literals — same integers either way)."""
    probe_b = _cms_bucket_sql("tc.t", "r.r", w)
    build_b = _cms_bucket_sql("tok.t", "r.r", w)
    return f"""
WITH tok AS (SELECT unnest({tokens_sql(text_expr)}) AS t FROM {tbl}),
tc AS (SELECT t, COUNT(*) AS true_count FROM tok GROUP BY t),
cells AS (
  SELECT r.r AS r, {build_b} AS b, COUNT(*) AS c
  FROM tok CROSS JOIN range(0, {d}) r(r)
  GROUP BY 1, 2)
SELECT tc.t AS token,
       CAST(tc.true_count AS BIGINT) AS true_count,
       CAST(MIN(cells.c) AS BIGINT) AS cms_count
FROM tc CROSS JOIN range(0, {d}) r(r)
JOIN cells ON cells.r = r.r AND cells.b = {probe_b}
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# HyperLogLog — per-group distinct-count estimation
# ---------------------------------------------------------------------------

def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    group_col: str,
    val_col: str,
    m: int = 64,
) -> DataFrame:
    """(group, exact_distinct, hll_estimate): the HyperLogLog
    cardinality estimate per group next to the exact countDistinct
    (kept for grading; production would drop it — the sketch is the
    point). m must be a power of two; the md5 hash gives 60 bits:
    low log2(m) bits pick the register, the remaining W bits feed
    rho = leading-zero count + 1 (via the base-2 string length — no
    float log on integers). Small-range linear counting applied below
    2.5·m exactly as in Flajolet et al. 2007."""
    import math

    lg = int(math.log2(m))
    assert 2 ** lg == m, "m must be a power of two"
    W = 60 - lg
    h = md5_hash64_col(F.col(val_col).cast("string"))
    bucket = F.pmod(h, F.lit(m))
    wbits = F.floor(h / F.lit(m)).cast("long")
    bitlen = F.length(F.conv(wbits.cast("string"), 10, 2))
    rho = F.when(wbits == 0, F.lit(W + 1)).otherwise(F.lit(W + 1) - bitlen)
    regs = (
        df.select(F.col(group_col).alias("g"), bucket.alias("b"), rho.alias("rho"))
        .groupBy("g", "b")
        .agg(F.max("rho").alias("mx"))
    )
    alpha = _hll_alpha(m)
    per = regs.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("_s"),
        F.count("*").alias("_n"),
    )
    raw = F.lit(alpha * m * m) / (
        F.col("_s") + (F.lit(m) - F.col("_n"))  # absent registers: 2^0 each
    )
    zeros = F.lit(m) - F.col("_n")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    ex = df.groupBy(F.col(group_col).alias("g")).agg(
        F.countDistinct(val_col).alias("exact_distinct")
    )
    return ex.join(per, "g").select(
        F.col("g").alias("stratum"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_distinct_sql(
    group_expr: str,
    val_expr: str,
    tbl: str,
    m: int = 64,
) -> str:
    """DuckDB twin of hll_distinct — identical registers, estimator,
    and small-range correction."""
    import math

    lg = int(math.log2(m))
    W = 60 - lg
    alpha = _hll_alpha(m)
    h = md5_hash64_sql("CAST(v AS VARCHAR)")
    return f"""
WITH src AS (SELECT {group_expr} AS g, {val_expr} AS v FROM {tbl}),
hx AS (SELECT g, v, ({h}) AS h FROM src),
rr AS (
  SELECT g, h % {m} AS b,
         CASE WHEN h // {m} = 0 THEN {W + 1}
              ELSE {W + 1} - length(bin(h // {m})) END AS rho
  FROM hx),
regs AS (SELECT g, b, MAX(rho) AS mx FROM rr GROUP BY g, b),
per AS (SELECT g, SUM(pow(2.0, -mx)) AS s, COUNT(*) AS n FROM regs GROUP BY g),
ex AS (SELECT g, COUNT(DISTINCT v) AS exact_distinct FROM src GROUP BY g),
est AS (
  SELECT g, {alpha!r} * {m} * {m} / (s + ({m} - n)) AS raw, {m} - n AS zeros
  FROM per)
SELECT ex.g AS stratum,
       CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
       ROUND(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                  THEN {float(m)} * ln({float(m)} / zeros)
                  ELSE raw END, 4) AS hll_estimate
FROM ex JOIN est ON ex.g = est.g"""
