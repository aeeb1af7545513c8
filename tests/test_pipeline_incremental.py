"""Incremental (stateful, per-batch) training pipeline: Spark plan vs
the pure-Python mirror, and the single-batch ≡ batch-pipeline
equivalence that pins the semantics."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

KNOBS = dict(
    min_tokens=1, min_alpha_ratio=0.0, min_stopword_ratio=0.0,
    langs=("en", "und"), minhash_k=8, bands=4, shingle_n=3,
)

B0 = [
    ("a1", "the quick brown fox jumps over the lazy dog"),
    ("a2", "pack my box with five dozen liquor jugs"),
    ("a3", "the quick brown fox jumps over the lazy dog"),  # exact dup of a1
]
B1 = [
    ("b1", "the quick brown fox jumps over the lazy dog"),  # exact dup, prior batch
    ("b2", "the quick brown fox jumps over the lazy cat"),  # near-dup of a1
    ("b3", "completely fresh words about spark adaptive execution"),
    ("b4", "completely fresh words about spark adaptive execution"),  # dup of b3
]
B2 = [
    ("c1", "pack my box with five dozen liquor jugs"),      # dup from batch 0
    ("c2", "yet another entirely different document body"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, text string")


def test_incremental_matches_mirror(spark):
    from cocrawler_spark.oracle.pipeline import incremental_pipeline_mirror
    from cocrawler_spark.plans.pipeline import train_data_pipeline_incremental

    out = train_data_pipeline_incremental(
        [_df(spark, b) for b in (B0, B1, B2)], **KNOBS
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["batch"], set()).add(r["id"])
    exp = incremental_pipeline_mirror(
        [dict(b) for b in (B0, B1, B2)], **KNOBS
    )
    assert [got.get(i, set()) for i in range(3)] == exp
    # the scenario exercises every rule: exact-dup across batches (b1,
    # c1 dropped), near-dup across batches (b2 dropped), within-batch
    # exact dup (a3, b4 dropped), and genuine survivors in every batch
    assert exp[0] and exp[1] and exp[2]
    assert "b1" not in exp[1] and "b2" not in exp[1] and "c1" not in exp[2]
    assert "b3" in exp[1] and "c2" in exp[2]


def test_incremental_single_batch_equals_batch_pipeline(spark):
    from cocrawler_spark.plans.pipeline import (
        train_data_pipeline,
        train_data_pipeline_incremental,
    )

    rows = B0 + [(i.replace("b", "x"), t) for i, t in B1]
    inc = train_data_pipeline_incremental([_df(spark, rows)], **KNOBS)
    batch = train_data_pipeline(
        _df(spark, rows), text_col="text", id_col="id",
        max_bucket=1024, **KNOBS
    )
    assert {r["id"] for r in inc.collect()} == {r["id"] for r in batch.collect()}


def test_incremental_order_sensitivity_is_first_seen(spark):
    """A later near-dup never evicts an earlier survivor, regardless of
    id order — first-seen wins across batches (the streaming rule)."""
    from cocrawler_spark.oracle.pipeline import incremental_pipeline_mirror

    early = {"z9": "the quick brown fox jumps over the lazy dog"}
    late = {"a0": "the quick brown fox jumps over the lazy dog"}
    exp = incremental_pipeline_mirror([early, late], **KNOBS)
    assert exp[0] == {"z9"} and exp[1] == set()


def test_incremental_pipeline_on_crawl_matches_mirror(spark, tiny_web, tmp_path):
    """End-to-end: crawl → per-wave incremental dedup/gates → committed
    train_docs. Per-batch surviving doc sets must equal the mirror run
    on the oracle simulator's per-wave fetched sets."""
    from cocrawler_spark.config import CrawlConfig
    from cocrawler_spark.functions.parse import text_of
    from cocrawler_spark.oracle.pipeline import incremental_pipeline_mirror
    from cocrawler_spark.oracle.simulator import simulate
    from cocrawler_spark.plans.pipeline import run_training_pipeline_incremental
    from tests.test_engine_oracle import CFG, build_engine

    e = build_engine(spark, tiny_web, CFG, tmp_path)
    e.run()
    out = run_training_pipeline_incremental(e, **KNOBS)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r["batch"], set()).add(r["id"])

    res = simulate(tiny_web, CFG)
    waves = sorted({w for (w, u, s, st, sha, ns) in res.fetched})
    batches = []
    for w in waves:
        batches.append(
            {
                u: text_of(tiny_web.docs[u])
                for (bw, u, s, st, sha, ns) in res.fetched
                if bw == w and st == 200
            }
        )
    exp = incremental_pipeline_mirror(batches, **KNOBS)
    assert [got.get(i, set()) for i in range(len(batches))] == exp
    assert sum(len(s) for s in exp) > 0
    # committed like every other state table
    reloaded = {(r["batch"], r["id"]) for r in e.output("train_docs").collect()}
    assert reloaded == {(i, x) for i, s in enumerate(exp) for x in s}
