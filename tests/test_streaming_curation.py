"""Streaming curation (streaming/curation.py): real streaming queries
(file source → memory sink), parity with the batch operators, and
cross-micro-batch exact-dedup state."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocrawler_spark.streaming.curation import atomic_drop  # noqa: E402

DOCS_SCHEMA = "id string, lang string, text string"

B1 = [
    ("d1", "en", "the quick brown fox jumps over the lazy dog"),
    ("d2", "en", "xx 99 !! @@"),                                  # fails alpha gate
    ("d3", "en", "the and of to in is that for with was common"),
    ("d4", "zz", "the quick brown fox jumps over the lazy dog"),  # sampled-out stratum
]
B2 = [
    ("d5", "en", "the quick brown fox jumps over the lazy dog"),  # cross-batch dup of d1
    ("d6", "en", "a wholly new document that the pipeline keeps and was fine"),
]


def _start_stream(spark, tmp_path, transform, name):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "100")
        .parquet(src + "/*")
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    return src, q


def test_curation_stream_matches_batch(spark, tmp_path):
    """The streaming gates keep exactly the rows the batch operators
    keep on the same data (same Column expressions by construction)."""
    from cocrawler_spark.operators.curation import stratified_sample
    from cocrawler_spark.streaming.curation import curation_stream

    knobs = dict(
        min_tokens=5, min_alpha_ratio=0.5, min_stopword_ratio=0.0,
        langs=("en", "und"), stratum_col="lang",
        rates={"en": 1.0}, default_rate=0.0,
    )
    src, q = _start_stream(
        spark, tmp_path, lambda s: curation_stream(s, **knobs), "curstream"
    )
    try:
        atomic_drop(spark.createDataFrame(B1, DOCS_SCHEMA), src + "/b1")
        q.processAllAvailable()
        atomic_drop(spark.createDataFrame(B2, DOCS_SCHEMA), src + "/b2")
        q.processAllAvailable()
        got = {r["id"] for r in spark.sql("select * from curstream").collect()}
    finally:
        q.stop()

    batch_df = spark.createDataFrame(B1 + B2, DOCS_SCHEMA)
    sampled = stratified_sample(
        batch_df, "lang", {"en": 1.0}, id_col="id", default_rate=0.0
    )
    from pyspark.sql import functions as F
    from cocrawler_spark.functions.text import langid_col, quality_cols

    qc = quality_cols(F.col("text"))
    exp = {
        r["id"]
        for r in sampled.filter(
            (qc["n_tokens"] >= 5)
            & (qc["alpha_ratio"] >= 0.5)
            & (langid_col(F.col("text")).isin("en", "und"))
        ).collect()
    }
    assert got == exp
    assert "d2" not in got and "d4" not in got  # gates + sampling engaged
    assert "d1" in got and "d6" in got


def test_exact_dedup_stream_state_across_batches(spark, tmp_path):
    from cocrawler_spark.streaming.curation import exact_dedup_stream

    src, q = _start_stream(spark, tmp_path, exact_dedup_stream, "dedupstream")
    try:
        atomic_drop(
            spark.createDataFrame(
                B1 + [("d0", "en", "the quick brown fox jumps over the lazy dog")],
                DOCS_SCHEMA,
            ),
            src + "/b1",
        )
        q.processAllAvailable()
        got1 = {r["id"] for r in spark.sql("select * from dedupstream").collect()}
        # min-id wins within the micro-batch: d0 beats d1/d4 for the
        # shared text; d2/d3 unique
        assert got1 == {"d0", "d2", "d3"}

        atomic_drop(spark.createDataFrame(B2, DOCS_SCHEMA), src + "/b2")
        q.processAllAvailable()
        got2 = {r["id"] for r in spark.sql("select * from dedupstream").collect()}
        # cross-batch: d5 duplicates d0's text -> suppressed by state
        assert got2 == {"d0", "d2", "d3", "d6"}
    finally:
        q.stop()


def test_incremental_pipeline_sink_matches_mirror(spark, tmp_path):
    """Full incremental pipeline as a streaming sink: two micro-batches
    through foreachBatch must keep exactly what the pure-Python
    incremental mirror keeps on the same batch split."""
    from cocrawler_spark.oracle.pipeline import incremental_pipeline_mirror
    from cocrawler_spark.streaming.curation import incremental_pipeline_sink
    from tests.test_pipeline_incremental import B0, B1, KNOBS

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema("id string, text string")
        .option("maxFilesPerTrigger", "100")
        .parquet(src + "/*")
    )
    q = (
        incremental_pipeline_sink(stream, out_dir, **KNOBS)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        atomic_drop(
            spark.createDataFrame(B0, "id string, text string"), src + "/b0"
        )
        q.processAllAvailable()
        atomic_drop(
            spark.createDataFrame(B1, "id string, text string"), src + "/b1"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got: dict[int, set] = {}
    for r in spark.read.parquet(out_dir).collect():
        got.setdefault(r["batch"], set()).add(r["id"])
    exp = incremental_pipeline_mirror([dict(B0), dict(B1)], **KNOBS)
    batches = sorted(got)
    assert len(batches) == 2
    assert [got[b] for b in batches] == exp
    assert exp[0] and exp[1]
