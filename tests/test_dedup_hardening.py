"""Scale-hardening tests for the near-dup family (VERDICT r1 items 4-6, 9).

- mega-bucket fixture: thousands of byte-identical docs (the web-scale
  boilerplate case) must not blow up one task — pre-collapse reduces the
  family to one representative, and the bucket cap drops degenerate
  buckets with a countable (not silent) drop.
- default embedding near-dup plan must contain no cartesian /
  broadcast-nested-loop join.
- 64-bit simhash: sign-bit encoding round-trips through XOR/bit_count.
"""

import pytest
from pyspark.sql import functions as F

from cocrawler_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
    simhash_fingerprints,
)
from cocrawler_spark.operators.similarity import embedding_neardup_pairs


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """3000 byte-identical docs + 6 distinct near-dup docs."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(3000)]
    rows += [
        (9000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (9001, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (9002, "one two three four five six seven eight nine ten"),
        (9003, "one two three four five six seven eight nine eleven"),
        (9004, "completely different text with nothing shared at all here"),
        (9005, "yet another unrelated document body for the control group"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_precollapse_collapses_boilerplate(spark, boilerplate_docs):
    pairs = minhash_lsh_pairs(
        boilerplate_docs, "text", "doc_id", k=8, bands=4, precollapse=True
    ).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    # the 3000-identical family contributes at most ONE representative
    assert len([i for i in ids if i < 3000]) <= 1
    # near-dup pairs among the distinct docs still found
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (9000, 9001) in got
    assert (9002, 9003) in got


def test_minhash_bucket_cap_drops_and_logs(spark, boilerplate_docs):
    msgs = []
    pairs = minhash_lsh_pairs(
        boilerplate_docs, "text", "doc_id", k=8, bands=4,
        precollapse=False, max_bucket=100, log_fn=msgs.append,
    ).collect()
    # without precollapse the 3000-doc family shares every band; the cap
    # must drop those buckets (reported, not silent) — no pair from the
    # boilerplate family survives
    assert msgs and "dropped" in msgs[0]
    assert all(r["id_a"] >= 3000 or r["id_b"] >= 3000 for r in pairs)
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (9000, 9001) in got


def test_simhash_candidates_precollapse(spark, boilerplate_docs):
    pairs = simhash_candidates(
        boilerplate_docs, "text", "doc_id", bits=64, band_bits=16,
        precollapse=True, max_bucket=100,
    ).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert len([i for i in ids if i < 3000]) <= 1
    # near-identical docs share at least one 16-bit band
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (9000, 9001) in got
    for r in pairs:
        assert 0 <= r["hamming"] <= 64


def test_ngram_hot_shingle_cap(spark):
    # 30 docs all containing one hot shingle + 2 genuine near-dups
    hot = "common boiler plate"
    rows = [(i, f"{hot} unique{i} filler{i} words{i} here{i}") for i in range(30)]
    rows += [
        (100, "genuine near duplicate pair shares many shingles indeed"),
        (101, "genuine near duplicate pair shares many shingles today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    msgs = []
    pairs = ngram_jaccard_pairs(
        df, "text", "doc_id", shingle_n=3, threshold=0.2,
        max_df=10, log_fn=msgs.append,
    ).collect()
    assert msgs and "dropped" in msgs[0]
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got
    # the hot-shingle-only docs share nothing after the cap
    assert all(not (a < 100 and b < 100) for a, b in got)


def test_embedding_neardup_default_plan_no_cartesian(spark):
    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = embedding_neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    exact_plan = (
        embedding_neardup_pairs(df, exact=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" in exact_plan or "BroadcastNestedLoopJoin" in exact_plan


def test_simhash64_sign_bit(spark):
    # craft docs until one lands with bit63 set (negative fingerprint);
    # XOR/bit_count must still give sane Hamming distances
    rows = [(i, f"token{i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = simhash_fingerprints(df, "text", "doc_id", bits=64).collect()
    assert len(fps) == 20
    vals = [r["simhash"] for r in fps]
    assert any(v < 0 for v in vals), "expected some fingerprints with bit 63 set"
    assert any(v >= 0 for v in vals)
    # self-distance zero, symmetric distance via Python int math matches
    a, b = vals[0], vals[1]
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    got = (
        df.sparkSession.createDataFrame([(a, b)], "x long, y long")
        .select(F.bit_count(F.col("x").bitwiseXOR(F.col("y"))).alias("h"))
        .collect()[0]["h"]
    )
    assert got == ham
