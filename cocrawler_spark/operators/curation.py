"""Corpus-curation operators for training-data pipelines.

Beyond dedup (operators/dedup.py) and per-doc text signals
(functions/text.py), a production crawl→training-data pipeline needs
corpus-level curation steps:

- **benchmark decontamination** — drop/flag training docs that share
  word n-grams with an evaluation/benchmark set (the standard
  GPT-3-style 13-gram overlap rule; Brown et al. 2020, §C). The eval
  side is benchmark-sized (thousands of docs), so the plan is an
  exploded shingle semi-join against a BROADCAST eval shingle set —
  the 100 TB doc side never shuffles on content.
- **deterministic stratified sampling** — per-stratum keep rates
  applied via a content-independent hash of the doc id. Pure map-side
  column expressions (CASE over plan-literal thresholds): zero
  shuffles, reproducible across runs/partitionings, and the same doc
  set survives on Spark and DuckDB byte-for-byte.
- **token-budget mixture selection** — keep docs per stratum, in a
  deterministic order, until a token budget fills: the "mix N billion
  tokens of each source" step of training-mix construction. One hash
  shuffle + per-stratum window cumsum.
- **boilerplate scoring** — fraction of a doc's distinct shingles that
  are corpus-hot (document frequency ≥ min_df): the CCNet-style
  corpus-level boilerplate signal (Wenzek et al. 2020 use line-level
  df; the synthetic corpus is single-line, so the shingle is the
  repeated-unit granularity here). Shingle-df join, same plan shape
  as ngram_jaccard's candidate machinery.

Scale notes (10^10-doc regime): decontaminate and stratified_sample
add NO doc-side shuffle (broadcast join / map-only). boilerplate_score
shuffles shingle hashes twice (df count + rejoin) — uniform keys by
construction. token_budget_take windows per stratum: each stratum's
rows sort within one task, so strata must be coarse-grained units
(language, source bucket) whose per-stratum row counts fit a task; for
a mega-stratum, pre-bucket by hash(id) and budget per sub-bucket, or
use the two-phase rank machinery in operators/ordering.py.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_hash64_col, token_count_col, tokens_col
from .dedup import shingle_hashes_col

SAMPLE_DENOM = 1_000_000


def hash_split(
    docs: DataFrame,
    id_col: str = "id",
    ratios: Mapping[str, float] = None,
    seed: int = 0,
    denom: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: a content-independent
    hash of the doc id buckets each doc into [0, denom), and cumulative
    ratio thresholds (plan literals) name the split. Pure map — zero
    shuffles, reproducible across runs/partitionings/engines, and docs
    keep their split when the corpus grows (the property a rolling
    crawl needs: yesterday's val doc never migrates into train).

    ``ratios`` is an ordered mapping (insertion order = bucket order),
    e.g. {'train': .9, 'val': .05, 'test': .05}; must sum to ~1."""
    ratios = dict(ratios or {"train": 0.9, "val": 0.05, "test": 0.05})
    bucket = F.pmod(
        md5_hash64_col(
            F.concat(F.lit(f"split{seed}:"), F.col(id_col).cast("string"))
        ),
        F.lit(denom),
    )
    out = docs.withColumn("split_bucket", bucket)
    expr = None
    acc = 0.0
    for name, r in ratios.items():
        acc += float(r)
        cond = F.col("split_bucket") < int(round(acc * denom))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = list(ratios)[-1]
    return out.withColumn("split", expr.otherwise(last))


def hash_split_sql(
    id_expr: str, ratios: Mapping[str, float] = None,
    seed: int = 0, denom: int = 10_000,
) -> tuple[str, str]:
    """DuckDB twins of hash_split's (split_bucket, split) columns."""
    from ..functions.text import md5_hash64_sql

    ratios = dict(ratios or {"train": 0.9, "val": 0.05, "test": 0.05})
    b = f"({md5_hash64_sql(f''''split{seed}:' || CAST({id_expr} AS VARCHAR)''')}) % {denom}"
    acc = 0.0
    cases = []
    for name, r in ratios.items():
        acc += float(r)
        cases.append(f"WHEN ({b}) < {int(round(acc * denom))} THEN '{name}'")
    last = list(ratios)[-1]
    return b, f"CASE {' '.join(cases)} ELSE '{last}' END"


def dataset_card(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum dataset card: the summary table a curated corpus
    ships with (docs, token mass, mean quality, language diversity).
    One scan + one hash-shuffle groupBy on the stratum key — every
    signal is a JVM column expression computed in the same pass."""
    from ..functions.text import langid_col, quality_cols

    qc = quality_cols(F.col(text_col))
    per = docs.select(
        F.col(stratum_col).alias("stratum"),
        qc["n_tokens"].alias("_nt"),
        qc["alpha_ratio"].alias("_ar"),
        langid_col(F.col(text_col)).alias("_lang"),
    )
    return per.groupBy("stratum").agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(F.avg("_ar"), 6).alias("avg_alpha_ratio"),
        F.countDistinct("_lang").alias("n_langs"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    eval_text_col: Optional[str] = None,
    shingle_n: int = 3,
    drop: bool = False,
) -> DataFrame:
    """Flag (or drop) training docs sharing ≥1 word n-gram shingle with
    the eval set.

    Returns docs plus (n_hits, contaminated) columns — n_hits = number
    of the doc's DISTINCT shingles that appear anywhere in the eval
    set. With ``drop=True`` returns only clean docs (original columns).

    Plan: eval → distinct shingle hashes (broadcast; benchmarks are
    tiny relative to the corpus) → doc shingles explode → broadcast
    equi-join → per-doc hit count → left join back. The doc side is
    never shuffled on content."""
    ev = eval_text_col or text_col
    eval_sh = (
        eval_docs.select(
            F.explode(shingle_hashes_col(F.col(ev), shingle_n)).alias("sh")
        ).distinct()
    )
    doc_sh = docs.select(
        F.col(id_col).alias("_cid"),
        F.explode(shingle_hashes_col(F.col(text_col), shingle_n)).alias("sh"),
    )
    hits = (
        doc_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("_cid")
        .agg(F.count("*").alias("n_hits"))
    )
    out = (
        docs.join(hits, docs[id_col] == hits["_cid"], "left")
        .drop("_cid")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
    if drop:
        return out.filter(~F.col("contaminated")).drop("n_hits", "contaminated")
    return out


def stratified_sample(
    docs: DataFrame,
    stratum_col: str,
    rates: Mapping[str, float],
    id_col: str = "id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a doc iff
    md5h(id) mod 10^6 < floor(rate(stratum) * 10^6).

    The hash is over the doc ID (content-independent), so the surviving
    set is stable under reprocessing, repartitioning, and text edits —
    the property training-mix reproducibility needs. Rates are plan
    literals (CASE chain): the whole operator is one map-side filter,
    zero shuffles at any scale."""
    u = F.pmod(md5_hash64_col(F.col(id_col).cast("string")), F.lit(SAMPLE_DENOM))
    thresh = None
    for stratum in sorted(rates):
        t = F.lit(int(rates[stratum] * SAMPLE_DENOM))
        thresh = (
            F.when(F.col(stratum_col) == stratum, t)
            if thresh is None
            else thresh.when(F.col(stratum_col) == stratum, t)
        )
    thresh = (
        thresh.otherwise(F.lit(int(default_rate * SAMPLE_DENOM)))
        if thresh is not None
        else F.lit(int(default_rate * SAMPLE_DENOM))
    )
    return docs.filter(u < thresh)


def sample_hash_sql(id_expr: str) -> str:
    """DuckDB twin of the stratified_sample hash bucket."""
    from ..functions.text import md5_hash64_sql

    h = md5_hash64_sql(f"CAST({id_expr} AS VARCHAR)")
    return f"(({h}) % {SAMPLE_DENOM} + {SAMPLE_DENOM}) % {SAMPLE_DENOM}"


def token_budget_take(
    docs: DataFrame,
    stratum_col: str,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "id",
    n_subbuckets: Optional[int] = None,
) -> DataFrame:
    """Per stratum, keep docs in ascending-id order while the running
    token total (including the current doc) stays ≤ budget_tokens.

    Docs past the budget are dropped even if a later smaller doc would
    still fit — the deterministic "fill in priority order" rule, not
    bin packing. Adds (n_tokens, cum_tokens) columns. One hash shuffle
    on the stratum + a per-stratum sorted window.

    ``n_subbuckets`` is the mega-stratum scale path: the stratum's
    budget splits evenly across H = n_subbuckets deterministic
    md5(id)-hash sub-buckets (low buckets absorb the remainder), and
    the window partitions by (stratum, sub-bucket) — H-way parallel
    sorts instead of one task holding the whole stratum. The selection
    is still exact-budgeted PER SUB-BUCKET and deterministic, but
    approximates the unsharded pick: total kept ≤ budget always; a
    sub-bucket's leftover tokens are not reassigned to others (the
    same first-fill rule, applied per shard). cum_tokens is then the
    running total within the doc's sub-bucket."""
    out = docs.withColumn(
        "n_tokens", token_count_col(F.col(text_col)).cast("long")
    )
    if n_subbuckets is None:
        w = (
            Window.partitionBy(stratum_col)
            .orderBy(F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return out.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
            F.col("cum_tokens") <= budget_tokens
        )
    h = n_subbuckets
    bucket = F.pmod(md5_hash64_col(F.col(id_col).cast("string")), F.lit(h))
    per = budget_tokens // h
    rem = budget_tokens % h
    sub_budget = F.when(bucket < rem, F.lit(per + 1)).otherwise(F.lit(per))
    w = (
        Window.partitionBy(stratum_col, bucket)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn("cum_tokens", F.sum("n_tokens").over(w)).filter(
        F.col("cum_tokens") <= sub_budget
    )


def temperature_mix_weights(
    docs: DataFrame,
    stratum_col: str,
    alpha: float = 0.3,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled source-mixing weights: the standard
    multilingual/multi-source LM sampling rule (Lample & Conneau 2019
    §3.1; mT5, Xue et al. 2021 §3.2) — upsample small sources,
    downsample giants:

        p_raw(s)  = tokens(s) / total_tokens
        p_temp(s) = p_raw(s)^alpha / sum_s' p_raw(s')^alpha

    alpha=1 keeps natural proportions; alpha→0 approaches uniform.
    Returns one row per stratum: (stratum, n_docs, n_tokens, p_raw,
    p_temp), weights rounded to 6 dp. p_temp is computed as
    tokens^alpha / sum tokens^alpha (the total_tokens^alpha factor
    cancels), so both engines take pow of exact integers.

    Plan: ONE partial-aggregated groupBy on the stratum key, then the
    normalizing totals as an UNPARTITIONED window over the |strata|-row
    aggregate — the window evaluates the aggregate child once (a
    crossJoin against separate scalar aggregates would duplicate the
    whole corpus scan in the plan tree) and its single task holds only
    |strata| rows, which is what makes it safe at any corpus size."""
    per = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col(F.col(text_col)).cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    powa = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    return per.select(
        "stratum",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w), 6).alias("p_raw"),
        F.round(powa / F.sum(powa).over(w), 6).alias("p_temp"),
    )


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    dim: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each raw doc by the log-likelihood ratio of its hashed
    bag-of-words features under a TARGET distribution (the high-quality
    set you want more of) vs the RAW corpus distribution:

        w(x) = sum_t [ ln p_target(b(t)) - ln p_raw(b(t)) ]

    with b(t) = md5-hash bucket of token t (hashing trick, ``dim``
    buckets) and add-1 smoothed bucket unigram models. Docs that look
    like the target get positive weights; downstream selection samples
    or thresholds on them (graded here as the weight itself, plus the
    per-token mean, which is length-independent).

    Determinism across engines: both sides take ln of EXACT integer
    counts — the smoothed-total terms ln(T+dim) are factored out and
    applied once per doc as n_tokens * (ln(Tr+dim) - ln(Tt+dim)).

    Plan shape at 100 TB: the two bucket-count tables are ``dim``-row
    aggregates (broadcast), the doc side explodes tokens once and
    re-aggregates by id — one shuffle on the doc id, no content
    shuffle, no skew (buckets are hash-uniform). The raw-total scalar
    rides ON the cr table via an unpartitioned window over its dim
    rows (cr always matches in the rejoin), so the corpus subtree
    appears exactly twice in the plan — the explode feeding the rejoin
    and the explode under cr's aggregate, the same irreducible-without-
    materialization shape as unigram_logprob_score; only the TARGET
    slice (small by definition: the curated set you want more of) is
    also scanned for its 1-row total."""
    sfx = F.lit(f"#{seed}")

    def bucketed(df: DataFrame, with_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("id")] if with_id else []
        tok = df.select(
            *cols, F.explode(tokens_col(F.col(text_col))).alias("tk")
        )
        return tok.withColumn(
            "b", F.pmod(md5_hash64_col(F.concat(F.col("tk"), sfx)), F.lit(dim))
        )

    raw_tok = bucketed(docs, with_id=True)
    ct = bucketed(target, with_id=False).groupBy("b").agg(
        F.count("*").alias("_ct")
    )
    cr = raw_tok.groupBy("b").agg(F.count("*").alias("_cr")).withColumn(
        "_tr", F.sum("_cr").over(Window.partitionBy())
    )
    target_total = ct.agg(F.sum("_ct").alias("_tt"))
    scored = (
        raw_tok.join(F.broadcast(ct), "b", "left")
        .join(F.broadcast(cr), "b")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.log(F.coalesce(F.col("_ct"), F.lit(0)) + 1)
                - F.log(F.col("_cr") + 1)
            ).alias("_s"),
            F.first("_tr").alias("_tr"),
        )
    )
    return scored.crossJoin(F.broadcast(target_total)).select(
        "id",
        "n_tokens",
        F.round(
            F.col("_s")
            + F.col("n_tokens")
            * (F.log(F.col("_tr") + dim) - F.log(F.col("_tt") + dim)),
            6,
        ).alias("dsir_logratio"),
    )


def domain_quality_prior(
    docs: DataFrame,
    domain_col: str,
    text_col: str = "text",
    id_col: str = "id",
    min_docs: int = 1,
) -> DataFrame:
    """Per-domain quality rollup: mean alpha/stopword ratios, mean
    token count, and doc count per domain — the domain-level prior
    spam/quality filters use (a low-quality domain taints all its
    docs). Returns one row per domain with ≥ min_docs docs.

    One partial-aggregated groupBy on the domain key; at 10^10 docs
    this is the cheapest shuffle in the pipeline (output is
    |domains|-sized and broadcastable back onto the doc table)."""
    from ..functions.text import quality_cols

    qc = quality_cols(F.col(text_col))
    per_doc = docs.select(
        F.col(domain_col).alias("domain"),
        qc["n_tokens"].alias("_nt"),
        qc["alpha_ratio"].alias("_ar"),
        qc["stopword_ratio"].alias("_sr"),
    )
    return (
        per_doc.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("_nt"), 6).alias("mean_tokens"),
            F.round(F.avg("_ar"), 6).alias("mean_alpha_ratio"),
            F.round(F.avg("_sr"), 6).alias("mean_stopword_ratio"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    shingle_n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """(id, n_shingles, n_hot, boilerplate_frac): per doc, the fraction
    of its distinct shingles whose corpus document frequency is
    ≥ min_df. High values mean the doc is built from text units
    repeated across the corpus (boilerplate / template families).

    Plan: one shingle explode (distinct per doc by construction), one
    groupBy(sh) for df, one equi-join back, one groupBy(id). All keys
    are 60-bit hashes — uniform, no skew salting needed."""
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes_col(F.col(text_col), shingle_n)).alias("sh"),
    )
    dfreq = doc_sh.groupBy("sh").agg(F.count("*").alias("df"))
    return (
        doc_sh.join(dfreq, "sh")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df") >= min_df).cast("long")).alias("n_hot"),
            F.round(
                F.sum((F.col("df") >= min_df).cast("long"))
                / F.greatest(F.count("*"), F.lit(1)),
                6,
            ).alias("boilerplate_frac"),
        )
    )


def unigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """(id, n_tokens, avg_neg_logprob): mean negative log-probability of
    a doc's tokens under the corpus's own unigram distribution — the
    perplexity-proxy quality signal (CCNet, Wenzek et al. 2020, filters
    on LM perplexity; a unigram model is its SQL-twinnable core). High
    scores mean rare-token-heavy docs (gibberish, codes); low scores
    mean stopword soup. No smoothing needed: every scored token is in
    the vocabulary by construction (the model is fit on the same
    corpus).

    avg_neg_logprob = ln(total_tokens) - mean_t ln(count(t)), computed
    from integer counts so both engines take ln of exact values.

    Plan: one token explode + one groupBy(token) for counts, the
    total as a broadcast one-row cross join, one equi-join back, one
    groupBy(id). Token keys are Zipf-ish but counts are pre-aggregated
    (join side is |vocab|-sized), so the rejoin skew is bounded by the
    doc-side explode, same as every shingle op here."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tk"),
    )
    counts = tok.groupBy("tk").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("_total"))
    return (
        tok.join(F.broadcast(counts), "tk")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.first(F.log("_total")) - F.avg(F.log("c")), 6
            ).alias("avg_neg_logprob"),
        )
    )


def bigram_logprob_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """(id, n_bigrams, avg_neg_logprob2): mean negative CONDITIONAL
    log-probability ln p(w2|w1) of a doc's adjacent token pairs under
    the corpus's own bigram model — the next notch above the unigram
    perplexity proxy (unigram_logprob_score): it also penalizes
    unusual token ORDER (shuffled/stitched text scores high even when
    its unigram mix looks normal). As with the unigram score, fitting
    on the scored corpus itself means every scored bigram has count
    >= 1, so no smoothing is needed and both engines take ln of exact
    integer counts:

        avg_neg_logprob2 = mean over bigrams of ln c(w1) - ln c(w1,w2)

    where c(w1) counts w1 as a bigram HEAD (so the conditionals
    normalize: sum_w2 p(w2|w1) = 1 exactly). Docs with < 2 tokens have
    no bigrams and are absent from the output.

    Plan: one bigram explode (adjacent-pair transform over the token
    array — pure JVM, no Python) → groupBy(bigram) and groupBy(head)
    count tables broadcast back → one groupBy(id). Same shape and skew
    profile as the unigram score. Scale note: a 100 TB corpus's bigram
    vocabulary outgrows a broadcast — there, drop the hints and let the
    rejoin be the sort-merge on (w1, w2) it naturally is (keys are
    near-uniform post-aggregation), or pre-prune the count tables to
    bigrams above a min count and treat misses as count-1.
    """
    # adjacent pairs: element i with element i+1; the last transform
    # output pairs with null and is sliced off (same construction as
    # the DuckDB twin's list_transform/list_slice). get() is the
    # 0-based null-on-out-of-bounds accessor (ANSI-safe, unlike []).
    bg = (
        docs.select(
            F.col(id_col).alias("id"),
            tokens_col(F.col(text_col)).alias("_toks"),
        )
        .select(
            "id",
            F.explode(
                F.expr(
                    "slice(transform(_toks, (x, i) -> "
                    "struct(x AS w1, get(_toks, i + 1) AS w2)), "
                    "1, greatest(size(_toks) - 1, 0))"
                )
            ).alias("b"),
        )
        .select("id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    pair_c = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    head_c = pair_c.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return (
        bg.join(F.broadcast(pair_c), ["w1", "w2"])
        .join(F.broadcast(head_c), "w1")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log("c1") - F.log("c2")), 6
            ).alias("avg_neg_logprob2"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    k: int = 3,
) -> DataFrame:
    """(id, term, rank, score): each doc's top-k tokens by tf·idf with
    idf = ln(N / df) — the keyword-extraction signal indexing and topic
    bucketing use. Deterministic: ties break by (score desc, term asc),
    and scores come from integer (tf, df, N) via one ln and one
    multiply, so equal-count terms tie exactly on both engines.

    Plan: token explode → groupBy(id, token) for tf → groupBy(token)
    for df (pre-aggregated, |vocab|-sized, broadcast back) → per-doc
    window top-k. The window partitions by doc id — bounded by doc
    length, no mega-partition risk."""
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("tk"),
    )
    tf = tok.groupBy("id", "tk").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("tk").agg(F.count("*").alias("df"))
    n_docs = tf.agg(F.countDistinct("id").alias("_n"))
    scored = (
        tf.join(F.broadcast(dfreq), "tk")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("_n") / F.col("df")))
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("tk").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "id",
            F.col("tk").alias("term"),
            "rank",
            F.round("score", 6).alias("score"),
        )
    )


def weighted_sample_topk(
    docs: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "id",
    stratum_col: Optional[str] = None,
    seed: int = 0,
) -> DataFrame:
    """Efraimidis–Spirakis (A-ES) weighted sampling WITHOUT replacement:
    keep, per stratum, the k docs with the largest key = ln(u)/w, where
    u ∈ (0,1) is a deterministic hash-uniform of (id, seed) and w > 0
    the doc's weight. Top-k by ln(u)/w is order-equivalent to the
    textbook u^(1/w) (ln is monotone, 1/w > 0) and numerically tamer.
    Inclusion probability is proportional to weight, exactly the A-ES
    guarantee; the draw is reproducible across reprocessing and
    repartitioning because u depends only on (id, seed), never on
    partition layout.

    Rows with non-positive weight are excluded (they'd get key −inf
    anyway). Ties (measure-zero) break by id.

    Scale: with a stratum, one exchange + per-stratum sort. WITHOUT a
    stratum the global top-k runs two-phase (the trick
    mix_token_budget_sharded uses): per-shard top-k over 64 hash
    shards first, then the final rank over the ≤ 64·k survivors —
    never a single-partition sort of the whole corpus. For mega-
    strata, pre-shard the stratum the same way.
    """
    u = (
        F.pmod(
            md5_hash64_col(
                F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
            ),
            F.lit(SAMPLE_DENOM),
        )
        + F.lit(0.5)
    ) / F.lit(float(SAMPLE_DENOM))
    key = F.log(u) / F.col(weight_col)
    base = docs.filter(F.col(weight_col) > 0).withColumn("_aes_key", key)
    if stratum_col is None:
        # phase 1: top-k within each of 64 hash shards (a shard's
        # non-top-k row can never be in the global top-k)
        shard = F.pmod(
            md5_hash64_col(F.concat(F.col(id_col).cast("string"), F.lit("#shard"))),
            F.lit(64),
        )
        w1 = Window.partitionBy(shard).orderBy(
            F.col("_aes_key").desc(), F.col(id_col)
        )
        base = base.withColumn("_shard_rn", F.row_number().over(w1)).filter(
            F.col("_shard_rn") <= k
        ).drop("_shard_rn")
        w = Window.partitionBy(F.lit(1)).orderBy(
            F.col("_aes_key").desc(), F.col(id_col)
        )
    else:
        w = Window.partitionBy(stratum_col).orderBy(
            F.col("_aes_key").desc(), F.col(id_col)
        )
    return (
        base.withColumn("_aes_rank", F.row_number().over(w))
        .filter(F.col("_aes_rank") <= k)
        .withColumnRenamed("_aes_key", "aes_key")
        .withColumnRenamed("_aes_rank", "aes_rank")
    )


def weighted_sample_key_sql(id_expr: str, weight_expr: str, seed: int = 0) -> str:
    """DuckDB twin of the A-ES key: ln((md5h(id||':seed') mod 10^6 + 0.5)/10^6) / w."""
    from ..functions.text import md5_hash64_sql

    h = md5_hash64_sql(f"CAST({id_expr} AS VARCHAR) || ':{seed}'")
    # Same op order as the Spark side — (pmod + 0.5) / D first, ONE ln —
    # so both engines evaluate ln on the identical double.
    u = (
        f"(((({h}) % {SAMPLE_DENOM} + {SAMPLE_DENOM}) % {SAMPLE_DENOM}) + 0.5)"
        f" / {float(SAMPLE_DENOM)}"
    )
    return f"ln({u}) / ({weight_expr})"


# ---------------------------------------------------------------------------
# hashed linear quality-classifier inference (fasttext-style)
# ---------------------------------------------------------------------------

def hashed_linear_score(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 1024,
    seed: int = 0,
    bias: float = 0.0,
) -> DataFrame:
    """Model-based quality scoring: linear-classifier INFERENCE over
    hashing-trick bag-of-words features (the fasttext/CCNet/FineWeb
    quality-filter shape), as a pure JVM expression chain.

    score = sigmoid(4 * mean_t w[h(t) mod dim] + bias)

    Each token hashes to one of ``dim`` buckets (md5, portable) and
    looks up a weight; the doc logit is the mean token weight. The
    whole thing is tokens → transform → aggregate INSIDE the row —
    map-only, ZERO shuffles, whole-stage codegen: at 10^10 docs this
    scores at scan speed, which is the entire point of running a
    linear model instead of a neural scorer in the hot filter path.

    Weights here are a deterministic pseudo-random stand-in
    (w[b] ∈ [-1, 1], md5-derived — no trained artifact exists in this
    environment). A production deployment swaps in trained weights as
    either plan literals (dim ≲ 64k: a CASE/array literal) or a
    broadcast (bucket, weight) dim-table join after exploding tokens —
    the hash/feature plumbing and the scan-speed property are what
    this operator pins. Adds ``quality_score`` (rounded 6 dp,
    deterministic: per-row sequential float fold, same order as the
    DuckDB twin's list_aggregate).
    """
    toks = tokens_col(F.col(text_col))

    def _weight(t):
        bucket = F.pmod(
            md5_hash64_col(F.concat(t, F.lit(f"#{seed}"))), F.lit(dim)
        )
        return (
            F.pmod(
                md5_hash64_col(
                    F.concat(F.lit(f"w{seed}#"), bucket.cast("string"))
                ),
                F.lit(2001),
            )
            - F.lit(1000)
        ) / F.lit(1000.0)

    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + _weight(t)
    )
    n = F.size(toks)
    mean = F.when(n > 0, total / n).otherwise(F.lit(0.0))
    logit = mean * F.lit(4.0) + F.lit(float(bias))
    return docs.withColumn(
        "quality_score",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6),
    )


def hashed_linear_score_sql(
    text_expr: str, dim: int = 1024, seed: int = 0, bias: float = 0.0
) -> str:
    """DuckDB twin of hashed_linear_score's quality_score column."""
    from ..functions.text import md5_hash64_sql, tokens_sql

    bucket = md5_hash64_sql(f"tk || '#{seed}'") + f" % {dim}"
    w = (
        f"(({md5_hash64_sql(f''''w{seed}#' || CAST(({bucket}) AS VARCHAR)''')})"
        f" % 2001 - 1000) / 1000.0"
    )
    toks = tokens_sql(text_expr)
    mean = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"list_aggregate(list_transform({toks}, tk -> ({w})), 'sum')"
        f" / len({toks}) ELSE 0.0 END"
    )
    return f"ROUND(1.0 / (1.0 + exp(-(({mean}) * 4.0 + {float(bias)}))), 6)"


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    id_col: str = "id",
    num_partitions: Optional[int] = None,
    persisted: Optional[list] = None,
) -> DataFrame:
    """Sequence packing: concatenate every doc's token stream in
    ascending-id order and cut the stream into fixed ``ctx_len``
    training sequences (GPT-style pretraining packing — documents
    cross sequence boundaries, nothing is padded or dropped). Returns
    the per-doc placement map a dataloader shards by:
    (id, n_tokens, tok_start, first_seq, last_seq, n_seqs), where
    tok_start is the doc's 0-based offset in the global token stream
    and first/last_seq are the ctx-window indices it lands in.

    Zero-token docs contribute nothing to the stream and are excluded.

    Scale shape: the only global state is the prefix sum of token
    counts, computed by ordering.with_global_cumsum (range exchange +
    O(partitions) driver offsets) — no single-partition window, so the
    packing map of a 10^10-doc corpus is one shuffle. Everything after
    the cumsum is arithmetic on plan literals."""
    from .ordering import with_global_cumsum

    out = docs.select(
        F.col(id_col), token_count_col(F.col(text_col)).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    out = with_global_cumsum(
        out, [id_col], "n_tokens", out_col="cum_tokens",
        num_partitions=num_partitions, persisted=persisted,
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    first = F.floor(start / ctx_len).cast("long")
    last = F.floor((F.col("cum_tokens") - 1) / ctx_len).cast("long")
    return out.select(
        id_col,
        "n_tokens",
        start.alias("tok_start"),
        first.alias("first_seq"),
        last.alias("last_seq"),
        (last - first + 1).alias("n_seqs"),
    )


def curriculum_phases(
    docs: DataFrame,
    score_col: str,
    n_phases: int = 4,
    id_col: str = "id",
    num_partitions: Optional[int] = None,
    persisted: Optional[list] = None,
) -> DataFrame:
    """Curriculum ordering: rank docs by (score, id) ascending and cut
    the ranking into ``n_phases`` equal-population training phases —
    phase = floor((rank-1)·n/total), so phase 0 is the easiest quartile
    (e.g. shortest docs for a length curriculum). Exact global
    quantiles with NO single-partition window: the rank comes from
    ordering.with_global_seq (range exchange + O(partitions) driver
    offsets), and total is a plan literal from the same pass."""
    from .ordering import with_global_seq

    total_out: dict = {}
    out = with_global_seq(
        docs, [score_col, id_col], seq_col="seq",
        num_partitions=num_partitions, persisted=persisted,
        total_out=total_out,
    )
    total = max(int(total_out.get("total", 0)), 1)
    phase = F.floor((F.col("seq") - 1) * int(n_phases) / total).cast("int")
    return out.withColumn("phase", phase)
