"""Connected-components clustering (operators/clustering.py): unit
graphs with known components, determinism across partitioning, and the
adversarial slow case for star-contraction algorithms (a long path)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _cc(spark, edges, **kw):
    from cocrawler_spark.operators.clustering import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {(r["id"], r["component"]) for r in out.collect()}


def _py_cc(edges):
    """Reference union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {x for e in edges for x in e}
    return {(n, find(n)) for n in nodes}


def test_cc_two_components(spark):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11)]
    assert _cc(spark, edges) == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}


def test_cc_long_path(spark):
    """Path graph 0-1-2-...-40: the O(diameter) worst case for naive
    label propagation; large-star/small-star must still converge (in
    O(log n) rounds) to a single min-rooted star."""
    edges = [(i, i + 1) for i in range(40)]
    assert _cc(spark, edges) == {(i, 0) for i in range(41)}


def test_cc_mega_star_and_duplicates(spark):
    """A hub component given redundantly (duplicate + reversed edges)
    plus self-loops, which must be ignored."""
    edges = (
        [(100, i) for i in range(101, 130)]
        + [(i, 100) for i in range(101, 130)]
        + [(5, 5), (115, 116)]
    )
    exp = {(i, 100) for i in range(101, 130)} | {(100, 100)}
    assert _cc(spark, edges) == exp


def test_cc_matches_union_find_random(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(90)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _cc(spark, edges) == _py_cc(edges)


def test_cc_empty(spark):
    assert _cc(spark, []) == set()


def test_cc_string_ids(spark):
    from cocrawler_spark.operators.clustering import connected_components

    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string"
    )
    out = {(r["id"], r["component"]) for r in connected_components(df).collect()}
    assert out == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_pipeline_components_collapses_chain(spark):
    """A~B, B~C near-dup chain: pairwise keeps C when A and C never
    share a bucket is possible; components must always keep exactly the
    min of the {A,B,C} component. Built from real minhash pairs over
    three overlapping texts."""
    from cocrawler_spark.operators.clustering import connected_components
    from cocrawler_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [
        (1, base * 4 + "alpha beta gamma delta"),
        (2, base * 4 + "alpha beta gamma epsilon"),
        (3, base * 4 + "alpha beta zeta epsilon"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = minhash_lsh_pairs(df, "text", "id", k=8, bands=4, precollapse=False)
    got = {(r["id"], r["component"]) for r in connected_components(pairs).collect()}
    n_pairs = pairs.count()
    assert n_pairs >= 2  # the chain actually formed
    nodes = {i for (i, _) in got}
    assert all(c == 1 for (_, c) in got) and nodes == {1, 2, 3}


def test_repetition_cols_match_python(spark):
    from cocrawler_spark.functions.text import repetition_cols

    texts = [
        (0, "a b c a b c a b c"),
        (1, "unique words only here today"),
        (2, "x"),
        (3, ""),
        (4, "w w w w w"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    cols = repetition_cols(F.col("text"))
    got = {
        r["doc_id"]: (r["t1"], r["t2"], r["t3"])
        for r in df.select(
            "doc_id",
            cols["dup_token_frac"].alias("t1"),
            cols["dup_bigram_frac"].alias("t2"),
            cols["dup_trigram_frac"].alias("t3"),
        ).collect()
    }

    import re

    def py(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        out = []
        for n in (1, 2, 3):
            upper = max(len(toks) - (n - 1), 1)
            grams = [" ".join(toks[i:i + n]) for i in range(upper)]
            out.append(round(1.0 - len(set(grams)) / max(len(grams), 1), 6))
        return tuple(out)

    for i, t in texts:
        assert got[i] == py(t), (i, t, got[i], py(t))


def test_pii_redaction(spark):
    from cocrawler_spark.functions.text import pii_cols

    rows = [
        (0, "mail me at bob.smith+x@sub.example.co.uk or 192.168.1.200 now"),
        (1, "no pii here"),
        (2, "two mails a@b.io c@d.org one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = pii_cols(F.col("text"))
    got = {
        r["doc_id"]: (r["n_emails"], r["n_ips"], r["redacted"])
        for r in df.select(
            "doc_id", cols["n_emails"].alias("n_emails"),
            cols["n_ips"].alias("n_ips"), cols["redacted"].alias("redacted"),
        ).collect()
    }
    assert got[0] == (1, 1, "mail me at <EMAIL> or <IP> now")
    assert got[1] == (0, 0, "no pii here")
    assert got[2] == (2, 1, "two mails <EMAIL> <EMAIL> one ip <IP>")


def test_keep_best_representative(spark):
    """Quality-aware survivor per component: max quality wins, ties by
    min id; docs in no pair survive as their own singleton component."""
    from cocrawler_spark.operators.clustering import keep_best_representative

    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 1), (10, 7)],
        "doc_id long, q long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {
        r["component"]: (r["kept_id"], r["q"], r["cluster_size"])
        for r in keep_best_representative(
            docs, pairs, "q", id_col="doc_id"
        ).collect()
    }
    # component 1 = {1,2,3}: quality tie 2 vs 3 at q=9 -> min id 2 kept
    assert out == {1: (2, 9, 3), 4: (4, 1, 1), 10: (10, 7, 1)}


def test_keep_best_empty_pairs(spark):
    from cocrawler_spark.operators.clustering import keep_best_representative

    docs = spark.createDataFrame([(7, 3), (8, 4)], "doc_id long, q long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = {
        r["component"]: r["kept_id"]
        for r in keep_best_representative(
            docs, pairs, "q", id_col="doc_id"
        ).collect()
    }
    assert out == {7: 7, 8: 8}
