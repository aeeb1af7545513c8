"""Crawl → train-ready documents: the end-to-end training-data plan.

A crawl is not the product — the product is a deduplicated, filtered
document set ready for tokenizer/training jobs. This module chains the
engine's committed crawl outputs through the repo's dedup/text-quality
operators as ONE declarative plan:

    fetched pages (status 200, parseable)        [crawl output join]
      → page text                                 [corpus text join]
      → exact dedup collapse (min-id survivor per byte-identical text)
      → MinHash+LSH near-dup drop (min-id survivor per candidate pair)
      → optional benchmark decontamination (drop docs sharing any
        shingle with an eval set; broadcast semi-join)
      → quality gate (token count / alpha ratio / stopword ratio)
      → language gate (stopword-overlap langid)
      → train_docs table, committed through the snapshot catalog

Scale shape: every stage is a hash-shuffle groupBy / equi-join from
the hardened operators in operators/dedup.py (pre-collapse + capped
buckets — no cross products, no driver collects); the quality/langid
stages are pure JVM column expressions. At 10^10 pages the plan's
only wide ops are the dedup shuffles, all keyed by content hashes
(uniform by construction).

Near-dup survivor rule (deterministic, SQL-twinnable), two variants:
- ``neardup="pairwise"`` (default): for every LSH candidate pair
  (id_a < id_b) the LARGER id is dropped — a doc survives iff no
  candidate pairs it with a smaller id. One pass, no iteration.
- ``neardup="components"``: transitive single-linkage — connected
  components over the candidate-pair graph
  (operators/clustering.py, alternating large-star/small-star), keep
  only each component's min-id root. Collapses A~B~C chains the
  pairwise rule under-collapses (components ⊆ pairwise survivors
  never holds the other way: every pairwise loser is also a
  non-root). The DuckDB oracle mirrors both exactly (the components
  variant via a recursive reachability CTE).
- ``survivor="quality"`` (implies the components labeling): instead
  of the min-id root, each component keeps its highest-quality
  member — most tokens, ties broken by min id (the CCNet/FineWeb
  per-cluster-representative rule, via
  operators/clustering.keep_best_representative). Exact-dup stage 1
  still collapses to min-id: byte-identical texts have identical
  quality, so the tiebreak IS the rule there.

Correctness: tests/test_engine_oracle.py::test_training_pipeline_*
asserts the surviving doc set against a pure-Python mirror on the
oracle simulator's fetched set; the driver grades the same chain on
its documents table via queries()['train_pipeline'] with a full SQL
twin.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import langid_col, quality_cols
from ..operators.dedup import _exact_representatives, minhash_lsh_pairs
from ..operators.similarity import embedding_neardup_pairs


def train_data_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    minhash_k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: Optional[int] = 1024,
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    langs: tuple[str, ...] = ("en",),
    embeddings: Optional[DataFrame] = None,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
    emb_threshold: float = 0.3,
    emb_n_planes: int = 6,
    neardup: str = "pairwise",
    survivor: str = "min_id",
    eval_docs: Optional[DataFrame] = None,
    eval_text_col: str = "text",
    classifier_threshold: Optional[float] = None,
    classifier_dim: int = 256,
    classifier_seed: int = 3,
) -> DataFrame:
    """(id, text) → surviving train-ready docs with their gate columns.

    Returns (id, text, lang, n_tokens, alpha_ratio, stopword_ratio) for
    every doc that survives exact dedup, near-dup dropping, and the
    quality/language gates. `id` must be orderable (min-id survivor
    rules on every dedup stage).

    If ``embeddings`` is given ((emb_id_col, emb_vec_col) rows keyed by
    the same ids), a third dedup stage drops embedding-cosine near-dups
    among the MinHash survivors: LSH-bucketed candidate pairs only
    (equi-join on the hyperplane bucket — the 100 TB path of
    ``embedding_neardup_pairs``; no cross product), cosine ≥
    ``emb_threshold`` drops the larger id. Docs without an embedding
    row pass the stage untouched."""
    # 1. exact collapse: one hash groupBy, min-id representative.
    # localCheckpoint (lazy): reps feeds the candidate-pair subtree AND
    # the survivor anti/semi-join (and the quality scoring under
    # survivor='quality') — without materialization each consumer
    # re-plans the scan + hash collapse from scratch (guide §5:
    # reused-and-expensive intermediates are the case worth caching;
    # the blocks are freed when the session drops the RDD).
    reps = _exact_representatives(docs, text_col, id_col).localCheckpoint(
        eager=False
    )

    # 2. near-dup candidates on the collapsed set (precollapse=False —
    # stage 1 already did it); drop the larger id of every pair
    pairs = minhash_lsh_pairs(
        reps, text_col, "id", k=minhash_k, bands=bands, shingle_n=shingle_n,
        precollapse=False, max_bucket=max_bucket,
    )
    if survivor == "quality":
        # quality-aware survivor: CC labeling (singletons are their own
        # component) + keep the most-token member per component, ties
        # min id — operators/clustering.keep_best_representative. The
        # `neardup` knob is subsumed: this rule is transitive by nature.
        from ..operators.clustering import keep_best_representative

        scored = reps.withColumn(
            "_q", quality_cols(F.col(text_col))["n_tokens"]
        )
        kept = keep_best_representative(scored, pairs, "_q", id_col="id")
        survivors = reps.join(
            kept.select(F.col("kept_id").alias("id")), "id", "left_semi"
        )
    elif survivor != "min_id":
        raise ValueError(f"survivor must be 'min_id' or 'quality', got {survivor!r}")
    elif neardup == "components":
        from ..operators.clustering import connected_components

        comps = connected_components(pairs, "id_a", "id_b")
        losers = comps.filter(F.col("id") != F.col("component")).select("id")
        survivors = reps.join(losers, "id", "left_anti")
    elif neardup == "pairwise":
        losers = pairs.select(F.col("id_b").alias("id")).distinct()
        survivors = reps.join(losers, "id", "left_anti")
    else:
        raise ValueError(f"neardup must be 'pairwise' or 'components', got {neardup!r}")

    # 2b. optional semantic near-dup stage: embedding-cosine pairs among
    # the survivors that have an embedding (left-semi restriction first,
    # so the bucket join never sees already-dropped docs)
    if embeddings is not None:
        emb = embeddings.select(
            F.col(emb_id_col).alias("id"), F.col(emb_vec_col).alias("_v")
        ).join(survivors.select("id"), "id", "left_semi")
        epairs = embedding_neardup_pairs(
            emb, vec_col="_v", id_col="id",
            threshold=emb_threshold, n_planes=emb_n_planes,
        )
        elosers = epairs.select(F.col("id_b").alias("id")).distinct()
        survivors = survivors.join(elosers, "id", "left_anti")

    # 2c. optional benchmark decontamination: drop survivors sharing any
    # shingle with the eval set (broadcast eval-shingle semi-join — the
    # doc side never shuffles on content; operators/curation.py)
    if eval_docs is not None:
        from ..operators.curation import decontaminate

        survivors = decontaminate(
            survivors, eval_docs, text_col=text_col, id_col="id",
            eval_text_col=eval_text_col, shingle_n=shingle_n, drop=True,
        )

    # 3+4. quality + language gates: pure JVM expressions, one pass
    qc = quality_cols(F.col(text_col))
    gated = survivors.select(
        "id",
        F.col(text_col).alias("text"),
        langid_col(F.col(text_col)).alias("lang"),
        qc["n_tokens"].alias("n_tokens"),
        qc["alpha_ratio"].alias("alpha_ratio"),
        qc["stopword_ratio"].alias("stopword_ratio"),
    ).filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("lang").isin(*langs))
    )

    # 5. optional model-based quality gate: hashed-linear classifier
    # inference (operators/curation.py:hashed_linear_score — map-only,
    # zero shuffles, so this gate is free at plan level); survivors
    # carry their quality_score
    if classifier_threshold is not None:
        from ..operators.curation import hashed_linear_score

        gated = hashed_linear_score(
            gated, text_col="text", dim=classifier_dim, seed=classifier_seed
        ).filter(F.col("quality_score") >= float(classifier_threshold))
    return gated


def train_data_pipeline_incremental(
    batches: list[DataFrame],
    text_col: str = "text",
    id_col: str = "id",
    minhash_k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: Optional[int] = 1024,
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Stateful per-batch variant of train_data_pipeline — the shape a
    continuously-crawling pipeline runs: each wave's new docs are
    deduped against ALL prior waves without reprocessing them.

    State between batches (both id-free, hash-keyed — bounded by
    distinct content, not by doc count):
    - ``hashes``: md5(text) of every doc seen so far (exact-dup set)
    - ``buckets``: LSH (band, bkey) of every first-occurrence exact
      representative so far (near-dup candidate sets)

    Per batch: (1) docs whose text hash is in state are dropped, the
    rest collapse to min-id reps per hash; (2) reps landing in an
    occupied state bucket are dropped (near-dup of a prior-wave doc);
    remaining reps apply the batch-local pairwise min-id rule (bucket
    cap ``max_bucket``, like the batch pipeline); (3) the quality +
    langid gates run on survivors. State then absorbs the batch: all
    its distinct text hashes, and the band keys of all its reps (reps
    that later failed a gate or the pairwise rule still contaminate
    buckets, exactly as in the batch pipeline).

    Semantics vs the batch pipeline: first-seen wins across batches
    (a later, smaller-id near-dup does NOT retroactively evict an
    earlier survivor); within a batch, min-id wins. A single-batch
    call is exactly train_data_pipeline(neardup='pairwise') — pinned
    by test. Output adds a ``batch`` index column.

    Scale shape per batch: the same hash-shuffle chain as the batch
    pipeline plus two equi-joins against the state tables (hash and
    bucket keys — uniform by construction). State DataFrames are
    localCheckpointed per batch (lineage truncation, clustering.py
    pattern); a production run would stage them through the snapshot
    catalog instead (same shape, reliable storage)."""
    spark = batches[0].sparkSession
    state = IncrementalPipelineState(spark)
    outs = [
        state.step(
            raw, text_col=text_col, id_col=id_col, minhash_k=minhash_k,
            bands=bands, shingle_n=shingle_n, max_bucket=max_bucket,
            min_tokens=min_tokens, min_alpha_ratio=min_alpha_ratio,
            min_stopword_ratio=min_stopword_ratio, langs=langs,
        ).withColumn("batch", F.lit(bi))
        for bi, raw in enumerate(batches)
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


class IncrementalPipelineState:
    """Driver-held dedup state for the incremental pipeline: the
    seen-text-hash set and the occupied-LSH-bucket set, as DataFrames
    localCheckpointed after every step (lineage truncation; prior
    checkpoint blocks freed eagerly). One instance = one logical
    pipeline; ``step`` consumes one batch and returns its gated
    survivors. Reused verbatim by the batch-list driver above and the
    Structured Streaming foreachBatch sink (streaming/curation.py)."""

    def __init__(self, spark):
        self.spark = spark
        self.hashes = spark.createDataFrame([], "h string")
        self.buckets = spark.createDataFrame([], "band int, bkey string")
        self._old: list[DataFrame] = []

    def step(
        self,
        raw: DataFrame,
        text_col: str = "text",
        id_col: str = "id",
        minhash_k: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
        max_bucket: Optional[int] = 1024,
        min_tokens: int = 5,
        min_alpha_ratio: float = 0.5,
        min_stopword_ratio: float = 0.0,
        langs: tuple[str, ...] = ("en",),
    ) -> DataFrame:
        from ..operators.dedup import band_keys

        docs = raw.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("text")
        )
        hashed = docs.withColumn("_h", F.md5("text"))
        fresh = hashed.join(
            self.hashes, hashed["_h"] == self.hashes["h"], "left_anti"
        )
        reps = (
            fresh.groupBy("_h")
            .agg(F.min(F.struct("id", "text")).alias("m"))
            .select(F.col("m.id").alias("id"), F.col("m.text").alias("text"))
        )
        banded = band_keys(reps, "text", "id", minhash_k, bands, shingle_n)
        # near-dup of any prior batch: any band key already occupied
        state_hit = (
            banded.join(self.buckets, ["band", "bkey"], "left_semi")
            .select("id")
            .distinct()
        )
        live = banded.join(state_hit, "id", "left_anti")
        # batch-local pairwise min-id rule (shares the shape of
        # minhash_lsh_pairs' bucket gate: window count, capped buckets)
        wb = Window.partitionBy("band", "bkey")
        sized = live.withColumn("_bn", F.count("*").over(wb)).withColumn(
            "_mn", F.min("id").over(wb)
        )
        keep = (F.col("_bn") > 1) & (F.col("id") != F.col("_mn"))
        if max_bucket is not None:
            keep = keep & (F.col("_bn") <= max_bucket)
        local_losers = sized.filter(keep).select("id").distinct()
        survivors = (
            reps.join(state_hit, "id", "left_anti")
            .join(local_losers, "id", "left_anti")
        )
        qc = quality_cols(F.col("text"))
        gated = survivors.select(
            "id",
            "text",
            langid_col(F.col("text")).alias("lang"),
            qc["n_tokens"].alias("n_tokens"),
            qc["alpha_ratio"].alias("alpha_ratio"),
            qc["stopword_ratio"].alias("stopword_ratio"),
        ).filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
            & (F.col("lang").isin(*langs))
        )
        # materialize the batch's survivors BEFORE retiring the state
        # they were computed against (a lazy return would reference
        # prior-state checkpoint blocks after their unpersist — a
        # recompute-impossible lineage once truncated); then absorb the
        # batch into state and free the previous state's blocks
        gated = gated.localCheckpoint(eager=True)
        new_hashes = self.hashes.union(
            hashed.select(F.col("_h").alias("h")).distinct()
        ).distinct().localCheckpoint(eager=True)
        new_buckets = self.buckets.union(
            banded.select("band", "bkey").distinct()
        ).distinct().localCheckpoint(eager=True)
        for df in self._old:
            df.unpersist()
        self._old = [new_hashes, new_buckets]
        self.hashes, self.buckets = new_hashes, new_buckets
        return gated


def run_training_pipeline(engine, wave: Optional[int] = None, **knobs) -> DataFrame:
    """Run the pipeline over a finished crawl's committed outputs and
    commit the result as the `train_docs` table.

    Sources: the engine's `fetched_content` output (status-200 pages
    that produced a parse) joined back to the corpus for page text —
    the same one-more-pass-over-fetched-pages a WARC-reading pipeline
    does. The output commits through the snapshot catalog, so
    `train_docs` is versioned/resumable like every other state table."""
    from ..functions.parse import text_of_col

    fetched = engine.output("fetched_content")
    if fetched is None:
        raise ValueError("no fetched_content output — run the crawl first")
    ok = fetched.filter(F.col("status") == 200).select(F.col("url"))
    docs = engine.documents.join(
        ok, engine.documents["doc_id"] == ok["url"], "left_semi"
    ).select(
        F.col("doc_id").alias("id"),
        text_of_col(F.col("spans")).alias("text"),
    )
    out = train_data_pipeline(docs, text_col="text", id_col="id", **knobs)
    w = wave if wave is not None else int(engine.catalog.latest_manifest()["wave"])
    engine.catalog.stage("train_docs", out, w, mode="full")
    engine.catalog.commit(w, base=engine.catalog.latest_manifest())
    return engine.output("train_docs")


def run_training_pipeline_incremental(engine, **knobs) -> DataFrame:
    """Per-wave incremental variant of run_training_pipeline: each
    crawl wave's status-200 pages form one batch, deduped against all
    prior waves through the hash/bucket state — no reprocessing of
    earlier waves' docs. Commits `train_docs` (with a `batch` column =
    the wave index position) through the snapshot catalog."""
    from ..functions.parse import text_of_col

    fetched = engine.output("fetched_content")
    if fetched is None:
        raise ValueError("no fetched_content output — run the crawl first")
    waves = sorted(
        r["wave"]
        for r in fetched.select("wave").distinct().collect()
    )
    batches = []
    for w in waves:
        ok = fetched.filter(
            (F.col("status") == 200) & (F.col("wave") == w)
        ).select(F.col("url"))
        batches.append(
            engine.documents.join(
                ok, engine.documents["doc_id"] == ok["url"], "left_semi"
            ).select(
                F.col("doc_id").alias("id"),
                text_of_col(F.col("spans")).alias("text"),
            )
        )
    out = train_data_pipeline_incremental(batches, **knobs)
    w = int(engine.catalog.latest_manifest()["wave"])
    engine.catalog.stage("train_docs", out, w, mode="full")
    engine.catalog.commit(w, base=engine.catalog.latest_manifest())
    return engine.output("train_docs")
