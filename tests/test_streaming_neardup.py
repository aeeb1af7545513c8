"""Streaming MinHash-LSH near-dup dedup (streaming/curation.py):
per-bucket occupancy in REAL streaming state (applyInPandasWithState)
+ the stateless per-batch reduction must keep exactly what the batch
incremental pipeline (plans/pipeline.py IncrementalPipelineState)
keeps on the same batch split."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocrawler_spark.streaming.curation import atomic_drop
from tests.test_pipeline_incremental import B0, B1, B2

# a batch with a WITHIN-batch near-dup pair (not exact) plus a unique
B3 = [
    ("e1", "pack my box with five dozen liquor mugs"),   # near-dup of a2
    ("e2", "an entirely new sentence mentioning structured streaming"),
    ("e3", "an entirely new sentence mentioning structured streaming state"),
]

LSH = dict(minhash_k=8, bands=4, shingle_n=3)


def test_band_keys_col_matches_batch(spark):
    """The per-row band-key column is value-identical to the batch
    explode+groupBy band_keys on the same docs."""
    from cocrawler_spark.operators.dedup import band_keys, band_keys_col

    df = spark.createDataFrame(B0 + B1 + B2 + B3, "id string, text string")
    batch = {
        (r["id"], r["band"], r["bkey"])
        for r in band_keys(df, "text", "id", k=8, bands=4, shingle_n=3).collect()
    }
    perrow = {
        (r["id"], r["bb"]["band"], r["bb"]["bkey"])
        for r in df.select(
            "id", F.explode(band_keys_col(F.col("text"), 8, 4, 3)).alias("bb")
        ).collect()
    }
    assert perrow == batch and len(batch) == len(B0 + B1 + B2 + B3) * 4


def test_neardup_stream_matches_incremental_state(spark, tmp_path):
    """4 micro-batches through the streaming bucket state + per-batch
    reduction == IncrementalPipelineState.step on the same split (with
    quality gates neutralized so only the dedup rules are compared)."""
    from cocrawler_spark.plans.pipeline import IncrementalPipelineState
    from cocrawler_spark.streaming.curation import neardup_dedup_sink

    batches = [B0, B1, B2, B3]
    # neutralize the quality/langid gates: langs = whatever langid says
    # about these texts, thresholds at zero
    from cocrawler_spark.functions.text import langid_col

    all_df = spark.createDataFrame(
        [r for b in batches for r in b], "id string, text string"
    )
    langs = tuple(
        {r[0] for r in all_df.select(langid_col(F.col("text"))).collect()}
    )
    neutral = dict(
        min_tokens=0, min_alpha_ratio=0.0, min_stopword_ratio=0.0, langs=langs
    )

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema("id string, text string")
        .option("maxFilesPerTrigger", "100")
        .parquet(src + "/*")
    )
    q = (
        neardup_dedup_sink(stream, out_dir, **LSH)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for i, b in enumerate(batches):
            atomic_drop(
                spark.createDataFrame(b, "id string, text string"),
                src + f"/b{i}",
            )
            q.processAllAvailable()
    finally:
        q.stop()

    got: dict[int, set] = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault(r["batch"], set()).add(r["id"])

    state = IncrementalPipelineState(spark)
    exp = []
    for b in batches:
        step = state.step(
            spark.createDataFrame(b, "id string, text string"), **LSH, **neutral
        )
        exp.append({r["id"] for r in step.collect()})

    batch_ids = sorted(got)
    assert len(batch_ids) == len(batches)
    assert [got[i] for i in batch_ids] == exp
    # the split exercises every rule on BOTH engines: within-batch exact
    # (a3), cross-batch exact (b1, c1), cross-batch near-dup (b2), and
    # survivors in every batch
    assert exp[0] and exp[1] and exp[2] and exp[3]
    assert "a3" not in exp[0] and "b1" not in exp[1]
    assert "b2" not in exp[1] and "c1" not in exp[2]


def test_neardup_stream_restart_resumes_state(spark, tmp_path):
    """Bucket occupancy is CHECKPOINTED streaming state: stop the query
    after batch 0, start a fresh query on the same checkpoint, and a
    near-dup of a batch-0 doc arriving after the restart is still
    dropped (the driver-held-DataFrame version of this state dies with
    the session; the streaming version must not)."""
    from cocrawler_spark.streaming.curation import neardup_dedup_sink

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def start():
        stream = (
            spark.readStream.schema("id string, text string")
            .option("maxFilesPerTrigger", "100")
            .parquet(src + "/*")
        )
        return (
            neardup_dedup_sink(stream, out_dir, **LSH)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        atomic_drop(
            spark.createDataFrame(B0, "id string, text string"), src + "/b0"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    q = start()
    try:
        atomic_drop(
            spark.createDataFrame(B1, "id string, text string"), src + "/b1"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got: dict[int, set] = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault(r["batch"], set()).add(r["id"])
    ids = sorted(got)
    assert len(ids) == 2
    assert got[ids[0]] == {"a1", "a2"}
    # b1 exact-dups a1 (every bucket occupied), b2 near-dups a1 (some
    # bucket occupied) — both must be dropped by RESUMED state
    assert got[ids[1]] == {"b3"}
