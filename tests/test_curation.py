"""Corpus-curation operators (operators/curation.py): decontamination,
deterministic stratified sampling, token-budget mixing, boilerplate
scoring — each checked against a straightforward pure-Python mirror on
small synthetic corpora (same verification style as the dedup suite)."""

import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _tokens(text):
    return [t for t in re.split("[^a-z0-9]+", text.lower()) if t]


def _shingles(text, n=3):
    toks = _tokens(text)
    k = max(len(toks) - (n - 1), 1)
    grams = {" ".join(toks[i : i + n]) for i in range(k)}
    return {int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams}


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox naps under the old tree"),
    (4, "completely unrelated words about spark shuffles and joins"),
    (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]
EVAL = [
    (100, "the quick brown fox is a benchmark sentence"),
    (101, "spark shuffles and joins are measured here"),
]


def test_decontaminate_flags(spark):
    from cocrawler_spark.operators.curation import decontaminate

    out = decontaminate(
        _docs_df(spark, DOCS), _docs_df(spark, EVAL), "text", "id"
    ).collect()
    eval_sh = set().union(*(_shingles(t) for _, t in EVAL))
    expect = {i: len(_shingles(t) & eval_sh) for i, t in DOCS}
    got = {r["id"]: r["n_hits"] for r in out}
    assert got == expect
    assert all(r["contaminated"] == (r["n_hits"] > 0) for r in out)
    # the construction is non-degenerate: some docs hit, some don't
    assert any(v > 0 for v in expect.values())
    assert any(v == 0 for v in expect.values())


def test_decontaminate_drop(spark):
    from cocrawler_spark.operators.curation import decontaminate

    docs = _docs_df(spark, DOCS)
    kept = decontaminate(docs, _docs_df(spark, EVAL), "text", "id", drop=True)
    assert kept.columns == docs.columns
    eval_sh = set().union(*(_shingles(t) for _, t in EVAL))
    expect = {i for i, t in DOCS if not (_shingles(t) & eval_sh)}
    assert {r["id"] for r in kept.collect()} == expect


def test_stratified_sample_deterministic(spark):
    from cocrawler_spark.operators.curation import (
        SAMPLE_DENOM,
        stratified_sample,
    )

    rows = [(i, "en" if i % 2 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, lang string")
    rates = {"en": 0.5, "de": 0.1}
    out = stratified_sample(df, "lang", rates, id_col="id")
    got = {r["id"] for r in out.collect()}

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % SAMPLE_DENOM

    expect = {
        i for i, lang in rows if h(i) < int(rates[lang] * SAMPLE_DENOM)
    }
    assert got == expect
    # repartitioning must not change the surviving set
    got2 = {r["id"] for r in stratified_sample(
        df.repartition(7), "lang", rates, id_col="id"
    ).collect()}
    assert got2 == got
    # rates are honored within sampling tolerance on this fixed hash
    n_en = sum(1 for i in expect if i % 2)
    assert 60 <= n_en <= 140  # 200 en docs at rate 0.5


def test_stratified_sample_default_rate(spark):
    from cocrawler_spark.operators.curation import stratified_sample

    df = spark.createDataFrame([(i, "zz") for i in range(50)], "id long, lang string")
    assert stratified_sample(df, "lang", {"en": 1.0}, id_col="id").count() == 0
    assert (
        stratified_sample(df, "lang", {"en": 1.0}, id_col="id", default_rate=1.0)
        .count() == 50
    )


def test_token_budget_take(spark):
    from cocrawler_spark.operators.curation import token_budget_take

    rows = [
        (1, "a", "one two three"),            # 3 tokens, cum 3
        (2, "a", "four five six seven"),      # 4 tokens, cum 7
        (3, "a", "eight nine"),               # 2 tokens, cum 9 > 8 -> drop
        (4, "a", "ten"),                      # cum would be 10 -> drop (no backfill)
        (10, "b", "alpha beta"),              # cum 2
    ]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    out = token_budget_take(df, "src", 8, text_col="text", id_col="id")
    got = {(r["id"], r["cum_tokens"]) for r in out.collect()}
    assert got == {(1, 3), (2, 7), (10, 2)}


def test_boilerplate_score(spark):
    from cocrawler_spark.operators.curation import boilerplate_score

    out = boilerplate_score(
        _docs_df(spark, DOCS), "text", "id", shingle_n=3, min_df=2
    ).collect()
    sh = {i: _shingles(t) for i, t in DOCS}
    from collections import Counter

    df_counts = Counter(h for s in sh.values() for h in s)
    for r in out:
        mine = sh[r["id"]]
        hot = sum(1 for h in mine if df_counts[h] >= 2)
        assert r["n_shingles"] == len(mine)
        assert r["n_hot"] == hot
        assert abs(r["boilerplate_frac"] - round(hot / max(len(mine), 1), 6)) < 1e-9
    # exact dups (1,5) are 100% hot; doc 4 shares nothing except the
    # eval-independent corpus, so it must be mostly cold
    frac = {r["id"]: r["boilerplate_frac"] for r in out}
    assert frac[1] == 1.0 and frac[5] == 1.0
    assert frac[4] == 0.0


def test_pipeline_decontamination_stage_matches_mirror(spark):
    """train_data_pipeline(eval_docs=...) must keep exactly the docs the
    pure-Python mirror keeps with eval_texts — the decontamination stage
    composed with exact/near-dup dedup and the gates."""
    from cocrawler_spark.oracle.pipeline import train_pipeline_mirror
    from cocrawler_spark.plans.pipeline import train_data_pipeline

    rows = [(str(i), t) for i, t in DOCS] + [
        ("6", "the cat sat on the mat and the dog sat too"),
        ("7", "numbers 123 456 789 without much english glue"),
    ]
    docs = spark.createDataFrame(rows, "id string, text string")
    ev = _docs_df(spark, EVAL).select(F.col("text"))
    knobs = dict(
        min_tokens=1, min_alpha_ratio=0.0, min_stopword_ratio=0.0,
        langs=("en", "und"),
    )
    got = {
        r["id"]
        for r in train_data_pipeline(
            docs, text_col="text", id_col="id", eval_docs=ev, **knobs
        ).collect()
    }
    exp = train_pipeline_mirror(
        {i: t for i, t in rows},
        eval_texts=[t for _, t in EVAL],
        **knobs,
    )
    assert got == exp and 0 < len(got) < len(rows)


def test_domain_quality_prior(spark):
    from cocrawler_spark.operators.curation import domain_quality_prior

    rows = [
        (1, "a", "the quick brown fox and the dog"),
        (2, "a", "xx 99 !!"),
        (3, "b", "only one doc here"),
    ]
    df = spark.createDataFrame(rows, "id long, dom string, text string")
    out = {r["domain"]: r for r in domain_quality_prior(
        df, "dom", text_col="text", id_col="id", min_docs=2
    ).collect()}
    assert set(out) == {"a"}  # 'b' has < 2 docs
    a = out["a"]
    assert a["n_docs"] == 2
    # per-doc token counts 7 and 2 -> mean 4.5
    assert abs(a["mean_tokens"] - 4.5) < 1e-9
    # doc1 all-alpha ratio = 25/31 (spaces count in chars); doc2 = 2/8
    exp = round((round(25 / 31, 6) + round(2 / 8, 6)) / 2, 6)
    assert abs(a["mean_alpha_ratio"] - exp) < 1e-9


def test_token_budget_take_sharded(spark):
    """Sub-bucketed budget: exact per-shard fill, deterministic via the
    id hash; total kept never exceeds the stratum budget."""
    from cocrawler_spark.operators.curation import (
        SAMPLE_DENOM,  # noqa: F401  (same hash family)
        token_budget_take,
    )

    rows = [(i, "s", " ".join(["tok"] * (1 + i % 5))) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    h, budget = 4, 40
    out = token_budget_take(
        df, "src", budget, text_col="text", id_col="id", n_subbuckets=h
    ).collect()

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % h

    per, rem = budget // h, budget % h
    exp = {}
    cum = {}
    for i, _, t in rows:  # ascending id order
        b = bucket(i)
        nt = len(t.split())
        cum[b] = cum.get(b, 0) + nt
        if cum[b] <= per + (1 if b < rem else 0):
            exp[i] = cum[b]
    assert {r["id"]: r["cum_tokens"] for r in out} == exp
    assert sum(r["n_tokens"] for r in out) <= budget
    # sharded across >1 sub-bucket (the parallelism actually engaged)
    assert len({bucket(r["id"]) for r in out}) > 1


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """Scale property: the eval shingle set is broadcast — the doc side
    joins it without a sort-merge/cartesian, so a 100 TB doc table
    never shuffles on shingle content."""
    plan = (
        __import__("cocrawler_spark.operators.curation", fromlist=["decontaminate"])
        .decontaminate(_docs_df(spark, DOCS), _docs_df(spark, EVAL), "text", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the id-keyed join attaching flags back onto docs may legitimately
    # sort-merge at scale; the pinned property is that the CONTENT join
    # (shingle vs eval shingle) is the broadcast one — no shuffle ever
    # carries doc shingle text
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_plan_is_map_only(spark):
    """Scale property: sampling is a pure filter — zero exchanges, no
    aggregation, nothing wide in the plan."""
    from cocrawler_spark.operators.curation import stratified_sample

    df = spark.createDataFrame([(i, "en") for i in range(100)], "id long, lang string")
    plan = (
        stratified_sample(df, "lang", {"en": 0.5}, id_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan and "Aggregate" not in plan


def test_unigram_logprob_score(spark):
    import math

    from cocrawler_spark.operators.curation import unigram_logprob_score

    rows = [
        (1, "the the the rare"),
        (2, "the the"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in unigram_logprob_score(df, "text", "id").collect()}
    # corpus: the x5, rare x1, total 6
    total = 6.0
    exp1 = round(math.log(total) - (3 * math.log(5) + math.log(1)) / 4, 6)
    exp2 = round(math.log(total) - math.log(5), 6)
    assert out[1]["n_tokens"] == 4 and abs(out[1]["avg_neg_logprob"] - exp1) < 1e-6
    assert out[2]["n_tokens"] == 2 and abs(out[2]["avg_neg_logprob"] - exp2) < 1e-6
    # the rare-token doc scores strictly higher (worse) than stopword soup
    assert out[1]["avg_neg_logprob"] > out[2]["avg_neg_logprob"]


def test_tfidf_top_terms(spark):
    import math

    from cocrawler_spark.operators.curation import tfidf_top_terms

    rows = [
        (1, "apple apple banana shared"),
        (2, "banana cherry shared shared"),
        (3, "shared date date date"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = tfidf_top_terms(df, "text", "id", k=2).collect()
    n = 3.0
    dfq = {"apple": 1, "banana": 2, "cherry": 1, "shared": 3, "date": 1}

    def score(tf, term):
        return tf * math.log(n / dfq[term])

    # doc 1: apple tf2 idf ln3 beats banana/shared
    got = {(r["id"], r["rank"]): (r["term"], r["score"]) for r in out}
    assert got[(1, 1)][0] == "apple"
    assert abs(got[(1, 1)][1] - round(score(2, "apple"), 6)) < 1e-9
    # doc 3: date tf3 first; 'shared' has idf ln(1)=0 -> score 0, still
    # rank 2 (only other term), deterministic
    assert got[(3, 1)][0] == "date" and got[(3, 2)] == ("shared", 0.0)
    # doc 2: cherry (tf1, ln3) vs banana (tf1, ln1.5): cherry wins
    assert got[(2, 1)][0] == "cherry" and got[(2, 2)][0] == "banana"
    assert all(r["rank"] <= 2 for r in out)


def test_hashed_linear_score_properties(spark):
    import math

    from cocrawler_spark.operators.curation import hashed_linear_score

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "zzz qqq xxx vvv kkk"),
        (3, ""),
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["quality_score"]
           for r in hashed_linear_score(df, dim=64, seed=1).collect()}
    # scores live in (0,1); empty text scores exactly sigmoid(bias)=0.5
    assert all(0.0 < s < 1.0 for s in out.values())
    assert out[3] == 0.5
    # identical text -> identical score; different text -> different
    assert out[1] == out[4]
    assert out[1] != out[2]
    # partitioning-invariant (pure map-side expression)
    out2 = {r["id"]: r["quality_score"]
            for r in hashed_linear_score(
                df.repartition(7, "text"), dim=64, seed=1).collect()}
    assert out == out2
    # a different seed permutes the feature space -> different scores
    out3 = {r["id"]: r["quality_score"]
            for r in hashed_linear_score(df, dim=64, seed=2).collect()}
    assert out3[1] != out[1]
    # hand-check one doc against the formula in pure python
    import hashlib

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = "zzz qqq xxx vvv kkk".split()
    ws = []
    for t in toks:
        b = h64(t + "#1") % 64
        ws.append((h64(f"w1#{b}") % 2001 - 1000) / 1000.0)
    logit = (sum(ws) / len(ws)) * 4.0
    assert abs(out[2] - round(1.0 / (1.0 + math.exp(-logit)), 6)) < 1e-9


def test_temperature_mix_weights(spark):
    """p_temp = nt^alpha / sum nt^alpha against a pure-python mirror;
    alpha flattens the distribution toward uniform."""
    import math

    from cocrawler_spark.operators.curation import temperature_mix_weights

    rows = [
        (1, "a b c d e f g h", "big"),
        (2, "a b c d e f g h", "big"),
        (3, "a b c d e f g h", "big"),
        (4, "x y", "small"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, src string")
    got = {
        r["stratum"]: (r["n_docs"], r["n_tokens"], r["p_raw"], r["p_temp"])
        for r in temperature_mix_weights(df, "src", alpha=0.3).collect()
    }
    nt = {"big": 24, "small": 2}
    z = sum(v**0.3 for v in nt.values())
    t = sum(nt.values())
    for s, n_docs in (("big", 3), ("small", 1)):
        gd, gt, pr, pt = got[s]
        assert (gd, gt) == (n_docs, nt[s])
        assert abs(pr - nt[s] / t) < 1e-6
        assert abs(pt - nt[s] ** 0.3 / z) < 1e-6
    # temperature upsamples the small source vs its raw share
    assert got["small"][3] > got["small"][2]
    assert got["big"][3] < got["big"][2]


def test_dsir_importance_mirror(spark):
    """Hashed-unigram log-likelihood-ratio weights vs a pure-python
    mirror; target-like docs score above off-target docs."""
    import hashlib
    import math

    from cocrawler_spark.operators.curation import dsir_importance

    rows = [
        (1, "the quick brown fox jumps high"),
        (2, "the lazy brown dog sleeps"),
        (3, "zz qq ww ee rr tt"),
        (4, "the quick fox runs"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    target = df.filter(F.col("id") <= 2)
    dim, seed = 64, 0
    out = {
        r["id"]: (r["n_tokens"], r["dsir_logratio"])
        for r in dsir_importance(df, target, id_col="id", dim=dim, seed=seed).collect()
    }

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def bucket(t):
        return h64(t + f"#{seed}") % dim

    ct, cr = {}, {}
    for i, text in rows:
        for t in _tokens(text):
            b = bucket(t)
            cr[b] = cr.get(b, 0) + 1
            if i <= 2:
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    for i, text in rows:
        toks = _tokens(text)
        w = sum(
            math.log(ct.get(bucket(t), 0) + 1) - math.log(cr[bucket(t)] + 1)
            for t in toks
        ) + len(toks) * (math.log(tr + dim) - math.log(tt + dim))
        assert out[i][0] == len(toks)
        assert abs(out[i][1] - w) < 1e-6
    # docs built from target vocabulary outrank the gibberish doc
    assert out[4][1] > out[3][1]


def test_char_entropy_mirror(spark):
    """Zero-shuffle char entropy vs a Counter-based mirror; degenerate
    single-char text has entropy 0, empty text guarded to 0."""
    import math
    from collections import Counter

    from cocrawler_spark.functions.text import char_entropy_cols

    rows = [
        (1, "the quick brown fox"),
        (2, "aaaaaaaaaaaa"),
        (3, ""),
        (4, "ababababab"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    c = char_entropy_cols(F.col("text"))
    got = {
        r["id"]: (r["n_chars"], r["n_distinct_chars"], r["char_entropy"])
        for r in df.select(
            "id", c["n_chars"].alias("n_chars"),
            c["n_distinct_chars"].alias("n_distinct_chars"),
            c["char_entropy"].alias("char_entropy"),
        ).collect()
    }
    for i, text in rows:
        n = len(text)
        cnt = Counter(text)
        ent = -sum((v / n) * math.log(v / n) for v in cnt.values()) if n else 0.0
        assert got[i][0] == n
        assert got[i][1] == len(cnt)
        assert abs(got[i][2] - ent) < 1e-6
    assert got[3][2] == 0.0 and got[3][1] == 0
    assert got[1][2] > got[4][2] > got[2][2] == 0.0


def test_hash_split_deterministic_and_stable(spark):
    """hash_split: (a) split names follow the cumulative thresholds of
    the id-hash bucket exactly, (b) a doc's split never changes when
    the corpus grows (content-independent), (c) proportions are
    roughly the requested ratios at n=2000."""
    from cocrawler_spark.operators.curation import hash_split

    small = spark.range(500).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    r = {"train": 0.8, "val": 0.1, "test": 0.1}
    s_small = {
        row["doc_id"]: row["split"]
        for row in hash_split(small, "doc_id", r, seed=7).collect()
    }
    rows = hash_split(big, "doc_id", r, seed=7).collect()
    s_big = {row["doc_id"]: row["split"] for row in rows}
    # stability: the 500-doc corpus's assignments survive 4x growth
    assert all(s_big[i] == s_small[i] for i in s_small)
    # threshold rule: bucket < 8000 -> train, < 9000 -> val, else test
    for row in rows:
        b = row["split_bucket"]
        exp = "train" if b < 8000 else ("val" if b < 9000 else "test")
        assert row["split"] == exp, (b, row["split"])
    from collections import Counter

    c = Counter(s_big.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.06 < c["val"] / 2000 < 0.14
    assert 0.06 < c["test"] / 2000 < 0.14
    # a different seed reshuffles assignments
    s2 = {
        row["doc_id"]: row["split"]
        for row in hash_split(small, "doc_id", r, seed=8).collect()
    }
    assert any(s2[i] != s_small[i] for i in s_small)


def test_dataset_card_matches_python(spark):
    """dataset_card per-stratum rollup equals a pure-Python fold of the
    same quality/langid column semantics."""
    from cocrawler_spark.operators.curation import dataset_card

    rows = [
        (1, "web", "the cat and the dog sat on a mat with all of them"),
        (2, "web", "le chat et le chien dans la maison pas une que les"),
        (3, "web", "zzz 123!!"),
        (4, "books", "a long and winding story of the sea and the sky"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["stratum"]: (r["n_docs"], r["n_tokens"], r["n_langs"])
        for r in dataset_card(df, "source", "text").collect()
    }
    assert got["web"][0] == 3 and got["books"][0] == 1
    # token counts: whitespace/punct split, lowercased
    assert got["web"][1] == 13 + 12 + 2
    assert got["books"][1] == 11
    # web has en + fr (+ und for the junk doc) = 3 langs, books en only
    assert got["web"][2] == 3 and got["books"][2] == 1


def test_pack_sequences_contiguous_stream(spark):
    """pack_sequences invariants: offsets tile the token stream with no
    gaps or overlaps in id order; sequence indices follow the ctx
    arithmetic; zero-token docs are excluded; result is independent of
    input partitioning."""
    from cocrawler_spark.operators.curation import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(((i * 37) % 23) + (0 if i % 11 else -((i * 37) % 23)))) ) for i in range(1, 120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (
            (r["doc_id"], r["n_tokens"], r["tok_start"], r["first_seq"],
             r["last_seq"], r["n_seqs"])
            for r in pack_sequences(df, 16, "text", "doc_id").collect()
        )
    )
    # contiguity
    off = 0
    for _id, nt, start, fs, ls, ns in got:
        assert nt > 0
        assert start == off
        assert fs == start // 16
        assert ls == (start + nt - 1) // 16
        assert ns == ls - fs + 1
        off += nt
    # zero-token docs (i % 11 == 0 got empty text) are excluded
    ids = {g[0] for g in got}
    zero_ids = {i for i in range(1, 120) if i % 11 == 0 or (i * 37) % 23 == 0}
    assert ids.isdisjoint(zero_ids) and len(zero_ids) > 0
    assert ids == set(range(1, 120)) - zero_ids
    # repartition invariance
    got2 = sorted(
        (
            (r["doc_id"], r["tok_start"])
            for r in pack_sequences(df.repartition(7), 16, "text", "doc_id").collect()
        )
    )
    assert got2 == [(g[0], g[2]) for g in got]


def test_gopher_gate_matches_python(spark):
    """gopher_gate_cols equals a pure-Python evaluation of the same
    rule list on adversarial docs — one doc per failure reason plus
    clean passes; reason is the FIRST failing rule."""
    from cocrawler_spark.functions.text import (
        GOPHER_RULES,
        STOPWORDS,
        gopher_gate_cols,
    )

    clean = "the cat and the dog sat on a mat with " + " ".join(
        f"word{i} thing{i} stuff{i}" for i in range(10)
    )
    rows = [
        (1, clean),                                   # pass
        (2, "the short one"),                         # too_few_tokens
        (3, " ".join("9999999999" for _ in range(40))  # numbers: alpha frac 0
             + " the of and in is"),                  # -> alpha_word_frac? or dup
        (4, " ".join(f"w{i}" for i in range(40))),    # no stopwords
        (5, ("the cat sat " * 20) + " ".join(f"u{i}" for i in range(20))),  # dup trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = gopher_gate_cols(F.col("text"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["keep"], r["reason"])
        for r in df.select(
            "doc_id", g["n_tokens"].alias("n_tokens"),
            g["keep"].alias("keep"), g["reason"].alias("reason"),
        ).collect()
    }

    t = dict(GOPHER_RULES)
    en = set(STOPWORDS["en"])
    for i, text in rows:
        toks = _tokens(text)
        n = len(toks)
        mtl = sum(map(len, toks)) / max(n, 1)
        af = sum(1 for x in toks if re.search("[a-z]", x)) / max(n, 1)
        ns = sum(1 for x in toks if x in en)
        k = max(n - 2, 1)
        g3 = [" ".join(toks[j : j + 3]) for j in range(k)]
        d3 = 1.0 - len(set(g3)) / max(len(g3), 1)
        reason = None
        for name, cond in [
            ("too_few_tokens", n < t["too_few_tokens"]),
            ("too_many_tokens", n > t["too_many_tokens"]),
            ("mean_token_len_low", mtl < t["mean_token_len_low"]),
            ("mean_token_len_high", mtl > t["mean_token_len_high"]),
            ("alpha_word_frac", af < t["alpha_word_frac"]),
            ("stopwords", ns < t["stopwords"]),
            ("dup_trigrams", d3 > t["dup_trigrams"]),
        ]:
            if cond:
                reason = name
                break
        assert got[i] == (n, reason is None, reason), (i, got[i], reason)
    # the fixture is adversarial: at least 3 distinct failure reasons
    assert len({v[2] for v in got.values() if v[2]}) >= 3


def test_curriculum_phases_equal_population(spark):
    """curriculum_phases: exact global quantile cut — phases are
    equal-population (±1), ordered by the score with id tiebreak, and
    invariant to input partitioning."""
    from collections import Counter

    from cocrawler_spark.operators.curation import curriculum_phases

    rows = [(i, (i * 31) % 97) for i in range(1, 202)]
    df = spark.createDataFrame(rows, "doc_id long, score long")
    got = {
        r["doc_id"]: (r["seq"], r["phase"])
        for r in curriculum_phases(df, "score", 4, id_col="doc_id").collect()
    }
    exp_order = sorted(rows, key=lambda t: (t[1], t[0]))
    total = len(rows)
    for rank, (i, _s) in enumerate(exp_order, start=1):
        assert got[i][0] == rank
        assert got[i][1] == (rank - 1) * 4 // total
    sizes = Counter(p for _seq, p in got.values())
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    got2 = {
        r["doc_id"]: (r["seq"], r["phase"])
        for r in curriculum_phases(
            df.repartition(13), "score", 4, id_col="doc_id"
        ).collect()
    }
    assert got2 == got


def test_random_projection_and_gopher_gate_plans_are_map_only(spark):
    """Zero-shuffle claims pinned: neither the JL projection nor the
    Gopher gate may put an Exchange in the physical plan."""
    from cocrawler_spark.functions.text import gopher_gate_cols
    from cocrawler_spark.operators.similarity import random_projection

    emb = spark.createDataFrame(
        [(i, [float(j) for j in range(8)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    p1 = (
        random_projection(emb, out_dim=4, in_dim=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p1

    docs = _docs_df(spark, DOCS)
    g = gopher_gate_cols(F.col("text"))
    p2 = (
        docs.select("id", g["keep"].alias("keep"), g["reason"].alias("reason"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p2


def test_top_ngram_char_frac_matches_python(spark):
    """top_ngram_char_frac: most-frequent n-gram char mass over doc
    chars, tie toward the lexicographically larger gram."""
    from collections import Counter

    from cocrawler_spark.functions.text import top_ngram_char_frac_cols

    rows = [
        (1, "home page home page home page contact"),
        (2, "all distinct words in this one sentence"),
        (3, "x y x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = top_ngram_char_frac_cols(F.col("text"))
    got = {
        r["doc_id"]: (r["f2"], r["f3"])
        for r in df.select(
            "doc_id",
            c["top_2gram_char_frac"].alias("f2"),
            c["top_3gram_char_frac"].alias("f3"),
        ).collect()
    }
    for i, text in rows:
        toks = _tokens(text)
        nch = max(len(text), 1)
        exp = []
        for n in (2, 3):
            k = max(len(toks) - (n - 1), 1)
            grams = [" ".join(toks[j : j + n]) for j in range(k)]
            cnt = Counter(grams)
            best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
            exp.append(round(best[1] * len(best[0]) / nch, 6))
        assert got[i] == tuple(exp), (i, got[i], exp)
    # doc 1's repeated phrase dominates; doc 2 is flat
    assert got[1][0] > got[2][0]


def test_char_entropy_sql_twin_empty_text(spark):
    """Spark ↔ DuckDB parity for char_entropy INCLUDING empty text:
    DuckDB's string_split('', '') yields [''] so the twin must filter
    empties (n_distinct_chars 0, entropy 0.0) to match the Spark side
    — media-only pages with empty text are realistic crawl inputs."""
    import duckdb

    from cocrawler_spark.functions.text import (
        char_entropy_cols, char_entropy_sql,
    )

    rows = [(1, "the quick brown fox"), (2, ""), (3, "aaaa"), (4, "ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = char_entropy_cols(F.col("text"))
    got = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], r["char_entropy"])
        for r in df.select(
            "doc_id",
            c["n_chars"].alias("n_chars"),
            c["n_distinct_chars"].alias("n_distinct_chars"),
            c["char_entropy"].alias("char_entropy"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT doc_id, {char_entropy_sql('text')} FROM documents"
        ).fetchall()
    }
    assert got == want
    assert got[2] == (0, 0, 0.0)


def test_top_ngram_sql_twin_honors_expr_and_cap(spark):
    """top_ngram_char_frac_sql must tokenize the PASSED expression (not
    a hardcoded 'text') and both engines must truncate to max_tokens
    identically."""
    import duckdb

    from cocrawler_spark.functions.text import (
        top_ngram_char_frac_cols, top_ngram_char_frac_sql,
    )

    rows = [
        (1, "HOME Page HOME Page HOME Page contact"),
        (2, "x y x y z " * 6),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = top_ngram_char_frac_cols(F.lower(F.col("text")), max_tokens=6)
    got = {
        r["doc_id"]: (r["f2"], r["f3"])
        for r in df.select(
            "doc_id",
            c["top_2gram_char_frac"].alias("f2"),
            c["top_3gram_char_frac"].alias("f3"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    sql = top_ngram_char_frac_sql("lower(text)", max_tokens=6)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(sql).fetchall()
    }
    assert got == want
