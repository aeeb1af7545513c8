"""Bloom sidecar FP-safety + salted per-host rank exactness."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from cocrawler_spark.state.bloom import (
    build_bitmap,
    m_bits_for,
    merge_bitmaps,
    probe_bitmap,
)


def test_bloom_no_false_negatives():
    rng = random.Random(1)
    members = [f"com,h{i})/p/{rng.randrange(999)}" for i in range(500)]
    m = m_bits_for(len(members))
    bm = build_bitmap(members, m)
    # every member probes positive — a negative would be a WRONG DROP
    assert all(probe_bitmap(s, bm, m) for s in members)


def test_bloom_fp_rate_reasonable():
    members = [f"com,h{i})/a" for i in range(2000)]
    m = m_bits_for(len(members))
    bm = build_bitmap(members, m)
    probes = [f"org,x{i})/b" for i in range(2000)]
    fp = sum(probe_bitmap(s, bm, m) for s in probes) / len(probes)
    assert fp < 0.05  # ~1% design point, generous bound


def test_bloom_merge_is_union():
    a = [f"com,a)/p/{i}" for i in range(100)]
    b = [f"com,b)/p/{i}" for i in range(100)]
    m = m_bits_for(100)
    merged = merge_bitmaps([build_bitmap(a, m), build_bitmap(b, m)])
    assert all(probe_bitmap(s, merged, m) for s in a + b)


def test_split_by_bloom_partitions_candidates(spark):
    from cocrawler_spark.state.bloom import build_bloom_delta, split_by_bloom

    seen_rows = [(f"h{i % 7}.test", f"com,h{i % 7})/p/{i}") for i in range(300)]
    seen_df = spark.createDataFrame(seen_rows, "host string, surt string")
    bloom = build_bloom_delta(seen_df, wave=1, num_buckets=8)
    cand_rows = seen_rows[:50] + [
        (f"h{i % 7}.test", f"com,h{i % 7})/q/{i}") for i in range(200)
    ]
    cand = spark.createDataFrame(cand_rows, "host string, surt string")
    new, maybe = split_by_bloom(cand, bloom, num_buckets=8)
    new_s = {r["surt"] for r in new.collect()}
    maybe_s = {r["surt"] for r in maybe.collect()}
    seen_s = {s for _, s in seen_rows}
    # FP-safety: nothing actually seen may land in definitely-new
    assert not (new_s & seen_s)
    # all 50 true dups are in maybe
    assert {s for _, s in seen_rows[:50]} <= maybe_s
    assert new_s | maybe_s == {s for _, s in cand_rows}


def test_salted_rank_equals_window(spark):
    from cocrawler_spark.operators.politeness import with_per_host_rank

    rng = random.Random(7)
    rows = [
        (
            f"h{rng.randrange(5)}.test",
            rng.randrange(3),
            rng.randrange(2 ** 60),
            f"com,h)/p/{i}",
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "host string, priority int, rand long, surt string")
    plain = with_per_host_rank(df, 0).select("host", "surt", "_rn")
    salted = with_per_host_rank(df, 16).select("host", "surt", "_rn")
    p = {(r["host"], r["surt"]): r["_rn"] for r in plain.collect()}
    s = {(r["host"], r["surt"]): r["_rn"] for r in salted.collect()}
    assert p == s
