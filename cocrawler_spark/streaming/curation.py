"""Streaming training-data curation (SURVEY.md §2i × the LLM-pipeline
extensions): the batch curation operators re-expressed over Structured
Streaming, so a continuously-arriving crawl can be gated and deduped
without wave-batch replays.

Two pieces, mirroring how the batch side splits:

- ``curation_stream``: the STATELESS stages — quality scoring, langid,
  and deterministic stratified sampling are pure per-row column
  expressions (functions/text.py, operators/curation.py), so they lift
  onto a stream unchanged; semantics are identical to the batch
  operators by construction (same Column objects). No watermark needed.

- ``exact_dedup_stream``: the STATEFUL stage — first-seen-wins exact
  dedup across micro-batches via ``applyInPandasWithState``, keyed by a
  2-hex-char md5 prefix (256 hash-uniform state shards; each shard's
  state is its seen-hash set, the streaming analog of the incremental
  pipeline's ``hashes`` table, plans/pipeline.py). Within a micro-batch
  the min-id occurrence wins (same rule as the batch pipeline); across
  batches first-seen wins (same rule as the incremental pipeline).

Scale notes: the dedup state is sharded by content hash — uniform by
construction, no hot keys; state size is O(distinct texts) spread over
the shards, and a production run would enable RocksDB state store +
state TTL for bounded retention. The stateless stages add zero state
and zero shuffles beyond the groupBy the dedup stage already needs.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import langid_col, quality_cols

_SEP = "\x1f"


def atomic_drop(df: DataFrame, dest: str) -> None:
    """Drop a batch of files into a directory watched by a file stream
    source so that ALL its part files appear in a single source listing.

    A parquet write commits part files sequentially (task-by-task rename
    out of ``_temporary``), so writing directly into the watched glob
    races the FileStreamSource's directory listing: one logical drop can
    be split across two triggers, changing which micro-batch each row
    lands in (and therefore first-seen-wins outcomes). Staging the write
    in a dot-prefixed sibling (hidden from Hadoop's path listing) and
    ``os.rename``-ing the finished directory into place is atomic on one
    filesystem, so the listing sees either nothing or the complete drop.
    """
    import os

    dest = dest.rstrip("/")
    parent, name = os.path.split(dest)
    stage = os.path.join(parent, "." + name + ".staging")
    df.write.parquet(stage)
    os.rename(stage, dest)

DEDUP_OUTPUT_SCHEMA = StructType(
    [StructField("id", StringType()), StructField("text", StringType())]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen_blob", StringType())])


def curation_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    langs: tuple[str, ...] = ("en",),
    stratum_col: Optional[str] = None,
    rates: Optional[Mapping[str, float]] = None,
    default_rate: float = 0.0,
) -> DataFrame:
    """Quality + langid gates (and optional deterministic stratified
    sampling when ``stratum_col``/``rates`` are given) over a streaming
    DataFrame — the same Column expressions as the batch operators, so
    a row passes the stream iff it passes the batch plan."""
    if stratum_col is not None and rates is not None:
        from ..operators.curation import stratified_sample

        stream = stratified_sample(
            stream, stratum_col, rates, id_col=id_col,
            default_rate=default_rate,
        )
    qc = quality_cols(F.col(text_col))
    return stream.withColumns(
        {
            "lang": langid_col(F.col(text_col)),
            "n_tokens": qc["n_tokens"],
            "alpha_ratio": qc["alpha_ratio"],
            "stopword_ratio": qc["stopword_ratio"],
        }
    ).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("lang").isin(*langs))
    )


def _dedup_state_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        (blob,) = state.get
        seen = set(blob.split(_SEP)) if blob else set()
    else:
        seen = set()
    for pdf in pdfs:
        if pdf.empty:
            continue
        # min-id occurrence wins within the micro-batch (the batch
        # pipeline's rule); first-seen wins across batches
        pdf = pdf.sort_values("id", kind="mergesort")
        keep_rows = []
        for _, row in pdf.iterrows():
            h = row["_h"]
            if h in seen:
                continue
            seen.add(h)
            keep_rows.append((row["id"], row["text"]))
        if keep_rows:
            yield pd.DataFrame(keep_rows, columns=["id", "text"])
    state.update((_SEP.join(sorted(seen)),))


def exact_dedup_stream(
    stream: DataFrame, text_col: str = "text", id_col: str = "id"
) -> DataFrame:
    """First-seen-wins exact dedup across micro-batches: one stateful
    shuffle keyed by a 2-hex md5 prefix (256 uniform shards), each
    shard holding its seen-hash set as group state."""
    prepared = stream.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
        F.md5(text_col).alias("_h"),
        F.substring(F.md5(text_col), 1, 2).alias("_k"),
    )
    return prepared.groupBy("_k").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


NEARDUP_VERDICT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("text", StringType()),
        StructField("h", StringType()),
        StructField("band", IntegerType()),
        StructField("bkey", StringType()),
        StructField("occupied", BooleanType()),
    ]
)
NEARDUP_STATE_SCHEMA = StructType([StructField("bkeys_blob", StringType())])


def _bucket_state_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-(band, bkey-shard) group: state is the set of bucket keys
    occupied by PRIOR micro-batches. Emits every input row with an
    ``occupied`` flag against that prior state (never against rows of
    the same batch — the within-batch min-id rule runs statelessly in
    the sink reduction, exactly where the batch pipeline runs it), then
    absorbs the batch's keys."""
    if state.exists:
        (blob,) = state.get
        occupied = set(blob.split(_SEP)) if blob else set()
    else:
        occupied = set()
    fresh: set = set()
    for pdf in pdfs:
        if pdf.empty:
            continue
        out = pdf[["id", "text", "h", "band", "bkey"]].copy()
        out["occupied"] = out["bkey"].isin(occupied)
        fresh.update(out["bkey"])
        yield out
    occupied.update(fresh)
    state.update((_SEP.join(sorted(occupied)),))


def lsh_neardup_verdicts_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    minhash_k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """STATEFUL half of incremental MinHash-LSH near-dup dedup: the
    occupied-LSH-bucket set lives in checkpointed streaming state
    (``applyInPandasWithState`` keyed by (band, 2-hex bkey shard) —
    bands·256 uniform groups), replacing the driver-held ``buckets``
    DataFrame of plans/pipeline.py's IncrementalPipelineState.

    Band keys are computed per-row (``band_keys_col`` — zero shuffles,
    value-identical to the batch ``band_keys``), exploded to one row per
    (doc, band), and flagged against prior-batch occupancy. Output is a
    verdict stream (id, text, h, band, bkey, occupied); finish a batch
    with ``neardup_survivors`` (stateless — the within-batch exact
    collapse + min-id bucket rule of the batch pipeline) either in a
    foreachBatch sink (``neardup_dedup_sink``) or downstream.

    Split rationale: Spark permits ONE arbitrary-stateful operator per
    streaming query, and the batch rule needs a cross-bucket OR per doc
    (a doc is dropped if ANY of its buckets hits history) that a single
    bucket-keyed group cannot see — so the stateful stage emits
    per-bucket facts and the per-doc reduction runs per micro-batch,
    which is exactly the batch plan's own structure (state_hit →
    window → anti-join). Scale: state is O(distinct buckets) spread
    over uniform shards; rows shuffled once on (band, shard)."""
    from ..operators.dedup import band_keys_col, shingle_hashes_col

    prepared = stream.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(text_col).alias("text"),
        F.md5(text_col).alias("h"),
        shingle_hashes_col(F.col(text_col), shingle_n).alias("_sh"),
    ).select(
        "id",
        "text",
        "h",
        band_keys_col(
            F.col("_sh"), minhash_k, bands, shingle_n, pre_shingled=True
        ).alias("_bbs"),
    ).select(
        "id",
        "text",
        "h",
        F.explode("_bbs").alias("bb"),
    ).select(
        "id",
        "text",
        "h",
        F.col("bb.band").alias("band"),
        F.col("bb.bkey").alias("bkey"),
        F.substring("bb.bkey", 1, 2).alias("_shard"),
    )
    return prepared.groupBy("band", "_shard").applyInPandasWithState(
        _bucket_state_fn,
        outputStructType=NEARDUP_VERDICT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def neardup_survivors(
    verdicts: DataFrame, max_bucket: Optional[int] = 1024
) -> DataFrame:
    """STATELESS finish of one micro-batch's verdict rows → surviving
    (id, text). Mirrors IncrementalPipelineState.step line for line:
    exact collapse to the min-id representative per text hash, drop any
    doc with an occupied bucket (state_hit), then the bucket-local
    min-id rule over the LIVE members only (window count + min, capped
    at ``max_bucket``)."""
    from pyspark.sql import Window

    w_h = Window.partitionBy("h")
    reps = (
        verdicts.withColumn("_rid", F.min("id").over(w_h))
        .filter(F.col("id") == F.col("_rid"))
        .drop("_rid")
    )
    w_id = Window.partitionBy("id")
    live = (
        reps.withColumn("_hit", F.max(F.col("occupied").cast("int")).over(w_id))
        .filter(F.col("_hit") == 0)
        .drop("_hit")
    )
    wb = Window.partitionBy("band", "bkey")
    sized = live.withColumn("_bn", F.count("*").over(wb)).withColumn(
        "_mn", F.min("id").over(wb)
    )
    loser = (F.col("_bn") > 1) & (F.col("id") != F.col("_mn"))
    if max_bucket is not None:
        loser = loser & (F.col("_bn") <= max_bucket)
    w_id2 = Window.partitionBy("id")
    return (
        sized.withColumn("_lose", F.max(loser.cast("int")).over(w_id2))
        .filter(F.col("_lose") == 0)
        .groupBy("id")
        .agg(F.first("text").alias("text"))
    )


def neardup_dedup_sink(
    stream: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "id",
    minhash_k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: Optional[int] = 1024,
):
    """Incremental near-dup dedup as one streaming query: the stateful
    bucket stage above + the stateless per-batch reduction in a
    foreachBatch sink, appending survivors partitioned by micro-batch.
    Returns the DataStreamWriter (set checkpointLocation, .start())."""
    verdicts = lsh_neardup_verdicts_stream(
        stream, text_col, id_col, minhash_k, bands, shingle_n
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        (
            neardup_survivors(batch_df, max_bucket)
            .withColumn("batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return verdicts.writeStream.foreachBatch(_process)


def incremental_pipeline_sink(
    stream: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "id",
    **knobs,
):
    """The FULL incremental training pipeline (exact dedup → LSH
    near-dup vs all history → quality/langid gates) as a Structured
    Streaming sink: every micro-batch runs one
    IncrementalPipelineState.step (plans/pipeline.py — the same
    equality-tested code path as the batch driver), appending
    survivors to a parquet dir partitioned by micro-batch id.

    foreachBatch is the idiomatic Spark seam for stateful logic whose
    state is itself a DataFrame (the seen-hash and occupied-bucket
    tables): inside the hook each micro-batch is a plain batch
    DataFrame, so the exact batch plan runs unchanged and its state
    survives on the driver between triggers. Exactly-once caveat: a
    restart replays the in-flight micro-batch against reset state
    (foreachBatch is at-least-once); a production run would persist
    the two state tables through the snapshot catalog at each step —
    the same commit/rollback machinery the crawl engine uses — making
    replays idempotent.

    Returns the DataStreamWriter (configure trigger/checkpoint and
    call .start() at the call site)."""
    from ..plans.pipeline import IncrementalPipelineState

    spark = stream.sparkSession
    state = IncrementalPipelineState(spark)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        gated = state.step(batch_df, text_col=text_col, id_col=id_col, **knobs)
        (
            gated.withColumn("batch", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return stream.writeStream.foreachBatch(_process)
