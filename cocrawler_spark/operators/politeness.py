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


def adaptive_crawl_delay(
    fetch_log: DataFrame,
    host_col: str = "host",
    latency_col: str = "latency_ms",
    status_col: str = "status",
    base_delay: float = 1.0,
    min_delay: float = 0.1,
    max_delay: float = 30.0,
    err_backoff: float = 4.0,
) -> DataFrame:
    """Next-epoch per-host crawl delay adapted from THIS epoch's fetch
    log — the server-load feedback loop robots.txt Crawl-delay cannot
    give (most hosts publish none, and a static value ignores
    overload). AIMD-flavored batch rule, deterministic and exact:

        load   = mean latency (s)             (slow server ⇒ back off)
        errs   = rate of 5xx/429 among fetches (overload signals)
        next   = clamp(max(base, 2·load) · (1 + err_backoff·errs),
                       min_delay, max_delay)

    A healthy fast host stays at ``base_delay``; a host whose responses
    slow to s seconds gets ≥ 2s between hits (the politeness rule of
    thumb: never occupy more than half a server's wall clock); error
    bursts multiply the delay up to ``max_delay``. The output feeds
    CrawlConfig politeness directly (the robots table's crawl_delay
    column has the same shape).

    NULL hygiene (ADVICE r4): a timed-out fetch logs NULL latency (and
    sometimes NULL status) — exactly the hosts that are struggling —
    so each mean uses its OWN non-null count as denominator:
    mean_latency over COUNT(latency), err_rate over COUNT(status).
    Dividing by COUNT(*) would silently deflate both for the failing
    hosts; dropping the rows entirely would erase a host whose every
    fetch timed out. A host with zero observed latencies contributes
    no load term (NULL mean_latency_ms, load treated as 0); zero
    observed statuses → err_rate 0.

    One groupBy(host): integer partial aggregates only, so the means
    are bit-deterministic under any partitioning (no float
    accumulation order). Map-side combine makes this scan-speed at
    10^10 fetch rows. Returns
    (host, n_fetches, err_rate, mean_latency_ms, next_delay), floats
    rounded to 6.
    """
    lat = F.col(latency_col).cast("long")
    is_err = (
        (F.col(status_col) >= 500) | (F.col(status_col) == 429)
    ).cast("long")
    g = fetch_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("n_fetches"),
        F.count(lat).alias("_n_lat"),
        F.sum(lat).alias("_lat_sum"),
        F.count(F.col(status_col)).alias("_n_status"),
        F.sum(is_err).alias("_errs"),
    )
    err_rate = F.when(
        F.col("_n_status") > 0,
        F.coalesce(F.col("_errs"), F.lit(0)) / F.col("_n_status"),
    ).otherwise(F.lit(0.0))
    mean_ms = F.when(
        F.col("_n_lat") > 0, F.col("_lat_sum") / F.col("_n_lat")
    )
    load_s = F.coalesce(mean_ms, F.lit(0.0)) / F.lit(1000.0)
    nxt = F.greatest(F.lit(float(base_delay)), F.lit(2.0) * load_s) * (
        F.lit(1.0) + F.lit(float(err_backoff)) * err_rate
    )
    nxt = F.least(F.lit(float(max_delay)), F.greatest(F.lit(float(min_delay)), nxt))
    return g.select(
        "host",
        "n_fetches",
        F.round(err_rate, 6).alias("err_rate"),
        F.round(mean_ms, 6).alias("mean_latency_ms"),
        F.round(nxt, 6).alias("next_delay"),
    )


def adaptive_crawl_delay_sql(
    host_expr: str,
    latency_expr: str,
    status_expr: str,
    from_clause: str,
    base_delay: float = 1.0,
    min_delay: float = 0.1,
    max_delay: float = 30.0,
    err_backoff: float = 4.0,
) -> str:
    """DuckDB twin of adaptive_crawl_delay (identical clamp/backoff
    arithmetic and per-column NULL denominators; integer partial
    aggregates keep it order-exact)."""
    return f"""
WITH fl AS (SELECT {host_expr} AS host, CAST({latency_expr} AS BIGINT) AS lat,
                   {status_expr} AS status
            FROM {from_clause}),
g AS (SELECT host, COUNT(*) AS n_fetches,
             COUNT(lat) AS n_lat, SUM(lat) AS lat_sum,
             COUNT(status) AS n_status,
             SUM(CAST(status >= 500 OR status = 429 AS BIGINT)) AS errs
      FROM fl GROUP BY host),
d AS (SELECT host, n_fetches,
             CASE WHEN n_status > 0
                  THEN COALESCE(errs, 0) * 1.0 / n_status
                  ELSE 0.0 END AS err_rate,
             CASE WHEN n_lat > 0
                  THEN lat_sum * 1.0 / n_lat END AS mean_ms
      FROM g)
SELECT host, n_fetches,
       ROUND(err_rate, 6) AS err_rate,
       ROUND(mean_ms, 6) AS mean_latency_ms,
       ROUND(least({float(max_delay)}, greatest({float(min_delay)},
             greatest({float(base_delay)},
                      2.0 * COALESCE(mean_ms, 0.0) / 1000.0)
             * (1.0 + {float(err_backoff)} * err_rate))), 6)
         AS next_delay
FROM d"""


# ---------------------------------------------------------------------------
# host-skew diagnostics
# ---------------------------------------------------------------------------

def host_skew_stats(
    df: DataFrame,
    host_col: str,
    group_col: str | None = None,
    topk: int = 10,
) -> DataFrame:
    """Per-group host-concentration diagnostics for the frontier: the
    numbers that tell a scheduler WHEN the skew machinery (salted
    politeness ranks, hot-host splitting, AQE skew joins) is actually
    load-bearing. Per group (e.g. wave):

    - ``n_hosts`` / ``total`` — distinct hosts and total rows
    - ``hhi`` — Herfindahl index Σ share² ∈ (0, 1]; 1/n_hosts when
      uniform, → 1 as one host dominates
    - ``top1_share`` / ``topk_share`` — largest-host and top-k share

    Determinism across engines: every aggregate is an INTEGER sum
    (Σ n, Σ n², max n, Σ top-k n — exact in 64-bit at any plausible
    group size), and floating point appears only in the final single
    division, so there is no summation-order noise for the ROUND(·,6)
    to paper over. One groupBy + one window sharing the same (group,
    host) exchange + one \\|groups\\|-row aggregate — scan-speed at
    10^10 frontier rows."""
    keys = [group_col] if group_col else []
    per_host = df.groupBy(
        *keys, F.col(host_col).alias("host")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy(*keys).orderBy(F.desc("n"), F.asc("host"))
    ranked = per_host.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy(*keys).agg(
        F.count("*").alias("n_hosts"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("_sq"),
        F.max("n").alias("_top1"),
        F.sum(
            F.when(F.col("rk") <= topk, F.col("n")).otherwise(F.lit(0))
        ).alias("_topk"),
    )
    return agg.select(
        *keys,
        "n_hosts",
        "total",
        F.round(F.col("_sq") / (F.col("total") * F.col("total")), 6).alias("hhi"),
        F.round(F.col("_top1") / F.col("total"), 6).alias("top1_share"),
        F.round(F.col("_topk") / F.col("total"), 6).alias("topk_share"),
    )


def host_skew_stats_sql(
    host_expr: str,
    from_clause: str,
    group_expr: str | None = None,
    topk: int = 10,
) -> str:
    """DuckDB twin of host_skew_stats. ``from_clause`` is a table or
    subquery EXPRESSION (e.g. ``"events"``) — the FROM keyword is
    emitted here, matching adaptive_crawl_delay_sql /
    dust_param_rules_sql conventions (ADVICE r4). Integer sums are
    cast to BIGINT (DuckDB SUM(BIGINT) widens to HUGEINT) and the
    products stay integer-exact before the single cast-to-double
    division."""
    if from_clause.lstrip().upper().startswith("FROM "):
        # the round-5 signature change made this a bare table/subquery
        # expression; a caller still passing the old "FROM ..." form
        # would only fail at execution with "FROM FROM ..." (ADVICE r5)
        raise ValueError(
            "from_clause is a table/subquery expression; do not include "
            "the FROM keyword"
        )
    g = f"{group_expr} AS grp, " if group_expr else ""
    gsel = "grp, " if group_expr else ""
    gby = "GROUP BY grp" if group_expr else ""
    part = "PARTITION BY grp" if group_expr else ""
    gout = "grp, " if group_expr else ""
    return f"""
WITH ph AS (SELECT {g}{host_expr} AS host, COUNT(*) AS n FROM {from_clause} GROUP BY {'grp, ' if group_expr else ''}host),
rk AS (SELECT *, ROW_NUMBER() OVER ({part} ORDER BY n DESC, host ASC) AS rk FROM ph),
ag AS (SELECT {gsel}CAST(COUNT(*) AS BIGINT) AS n_hosts,
              CAST(SUM(n) AS BIGINT) AS total,
              CAST(SUM(n * n) AS BIGINT) AS sq,
              CAST(MAX(n) AS BIGINT) AS top1,
              CAST(SUM(CASE WHEN rk <= {topk} THEN n ELSE 0 END) AS BIGINT) AS tk
       FROM rk {gby})
SELECT {gout}n_hosts, total,
       ROUND(CAST(sq AS DOUBLE) / CAST(total * total AS DOUBLE), 6) AS hhi,
       ROUND(CAST(top1 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS top1_share,
       ROUND(CAST(tk AS DOUBLE) / CAST(total AS DOUBLE), 6) AS topk_share
FROM ag"""
