"""Unit tests for indexing by-products (inverted postings, anchor text),
the bigram-LM quality score, and WARC revisit-record dedup.

Each asserts hand-computed goldens on tiny fixtures — the same numbers
the DuckDB oracle twin derives independently at driver scale.
"""

import math

import pytest
from pyspark.sql import functions as F

from cocrawler_spark.operators.curation import bigram_logprob_score
from cocrawler_spark.operators.dedup import warc_revisit_records
from cocrawler_spark.operators.indexing import anchor_text_topk, inverted_postings


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat"),
            (4, "the cat sat on the mat"),  # exact dup of 1
            (5, ""),  # empty -> no tokens
            (6, "solo"),  # 1 token -> no bigrams
        ],
        "doc_id long, text string",
    )


def test_inverted_postings_counts(spark, docs):
    rows = {
        r["term"]: (r["df"], r["total_tf"])
        for r in inverted_postings(
            docs, text_col="text", id_col="doc_id"
        ).collect()
    }
    # 'the': docs 1,2,4 -> df 3; tf 2+1+2 = 5
    assert rows["the"] == (3, 5)
    assert rows["cat"] == (3, 3)
    assert rows["sat"] == (3, 3)
    assert rows["dog"] == (1, 1)
    assert rows["solo"] == (1, 1)
    # min_df trims the tail
    kept = inverted_postings(
        docs, text_col="text", id_col="doc_id", min_df=3
    ).collect()
    assert {r["term"] for r in kept} == {"the", "cat", "sat"}


def test_anchor_text_topk_rank_and_ties(spark):
    links = spark.createDataFrame(
        [("t1", "home")] * 3
        + [("t1", "about")] * 3
        + [("t1", "zebra")] * 1
        + [("t2", "only")]
        + [("t3", None)],  # null anchor dropped
        "target string, anchor string",
    )
    out = {
        (r["target"], r["rank"]): (r["anchor"], r["n"])
        for r in anchor_text_topk(links, k=2).collect()
    }
    # tie at n=3 breaks by anchor asc
    assert out[("t1", 1)] == ("about", 3)
    assert out[("t1", 2)] == ("home", 3)
    assert out[("t2", 1)] == ("only", 1)
    assert ("t3", 1) not in out


def test_bigram_logprob_golden(spark, docs):
    out = {
        r["id"]: (r["n_bigrams"], r["avg_neg_logprob2"])
        for r in bigram_logprob_score(
            docs, text_col="text", id_col="doc_id"
        ).collect()
    }
    # corpus bigram heads: 'the'->{cat:3, mat:2}, c1(the)=5
    # doc 2 bigrams: (the,cat) c2=3, (cat,ran) c2=1 with c1(cat)=2+1+1=...
    # cat heads: (cat,sat) docs1,4 ->2; (cat,ran)->1 => c1(cat)=3
    exp_doc2 = ((math.log(5) - math.log(3)) + (math.log(3) - math.log(1))) / 2
    assert out[2][0] == 2
    assert out[2][1] == pytest.approx(exp_doc2, abs=2e-6)
    # docs with <2 tokens absent
    assert 5 not in out and 6 not in out
    # exact dups score identically
    assert out[1] == out[4]


def test_warc_revisit_records(spark, docs):
    out = {
        r["id"]: (r["record_type"], r["refers_to"])
        for r in warc_revisit_records(
            docs, text_col="text", id_col="doc_id"
        ).collect()
    }
    assert out[1] == ("response", None)
    assert out[4] == ("revisit", 1)
    # uniques are all responses
    for i in (2, 3, 5, 6):
        assert out[i] == ("response", None)
    # every doc classified exactly once
    assert len(out) == 6
