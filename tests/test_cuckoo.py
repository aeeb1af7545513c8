"""Cuckoo-filter sidecar: no-false-negatives, FP rate, delete/merge
semantics, determinism, overflow survival, and the Spark cogroup
build/probe/delete paths."""

import random

import pytest

from cocrawler_spark.state.cuckoo import (
    build_table,
    delete_surt,
    m_buckets_for,
    merge_tables,
    probe_table,
)


def _keys(n, tag="h"):
    return [f"com,{tag}{i})/p/{i * 7 % 991}" for i in range(n)]


def test_cuckoo_no_false_negatives():
    members = _keys(5000)
    m = m_buckets_for(len(members))
    table, overflow, n = build_table(members, m)
    assert n == len(set(members))
    assert all(probe_table(s, table, m, overflow) for s in members)


def test_cuckoo_fp_rate_reasonable():
    members = _keys(4000)
    m = m_buckets_for(len(members))
    table, overflow, _ = build_table(members, m)
    probes = [f"org,x{i})/q/{i}" for i in range(4000)]
    fp = sum(probe_table(s, table, m, overflow) for s in probes) / len(probes)
    # 16-bit fp, 4-slot buckets: theoretical ~ 2*4/2^16 ≈ 0.012%
    assert fp < 0.01


def test_cuckoo_build_deterministic():
    members = _keys(1000)
    m = m_buckets_for(len(members))
    a = build_table(members, m)
    b = build_table(list(reversed(members)), m)  # order-insensitive
    assert a == b


def test_cuckoo_delete_then_negative():
    members = _keys(2000)
    m = m_buckets_for(len(members))
    table, overflow, _ = build_table(members, m)
    victim = members[123]
    table2, overflow2, removed = delete_surt(table, m, overflow, victim)
    assert removed
    # the victim itself may still FP-collide with another key's
    # fingerprint in a shared bucket — that is allowed; what MUST hold
    # is that every other member still probes positive (delete removed
    # exactly one copy, no collateral false negatives)
    others = [s for s in members if s != victim]
    assert all(probe_table(s, table2, m, overflow2) for s in others)
    # and for a key with a unique (bucket, fp) pair the probe flips:
    # deleting from a single-key filter always yields a negative
    t1, o1, _ = build_table([victim], 4)
    t2, o2, rem = delete_surt(t1, 4, o1, victim)
    assert rem and not probe_table(victim, t2, 4, o2)
    # deleting a never-inserted key is a no-op signalled False
    _, _, rem2 = delete_surt(t2, 4, o2, "org,nope)/x")
    assert rem2 is False


def test_cuckoo_overflow_keeps_no_false_negatives():
    # force heavy overload: m=4 buckets (16 slots) for 200 keys — the
    # kick loop must spill, and spilled keys must still probe positive
    members = _keys(200)
    table, overflow, _ = build_table(members, m=4)
    assert len(overflow) > 0
    assert all(probe_table(s, table, 4, overflow) for s in members)


def test_cuckoo_merge_is_union():
    a = _keys(400, "a")
    b = _keys(400, "b")
    m = m_buckets_for(800)
    ta = build_table(a, m)
    tb = build_table(b, m)
    table, overflow, n = merge_tables([ta, tb], m)
    assert n == len(set(a) | set(b))
    assert all(probe_table(s, table, m, overflow) for s in a + b)


def test_split_by_cuckoo_partitions_candidates(spark):
    from pyspark.sql import functions as F

    from cocrawler_spark.state.cuckoo import build_cuckoo_delta, probe_cuckoo

    seen_rows = [(f"h{i % 7}.test", f"com,h{i % 7})/p/{i}") for i in range(300)]
    seen_df = spark.createDataFrame(seen_rows, "host string, surt string")
    filt = build_cuckoo_delta(seen_df, wave=1, num_buckets=8)
    cand_rows = seen_rows[:50] + [
        (f"h{i % 7}.test", f"com,h{i % 7})/q/{i}") for i in range(200)
    ]
    cand = spark.createDataFrame(cand_rows, "host string, surt string")
    probed = probe_cuckoo(cand, filt, num_buckets=8)
    new_s = {r["surt"] for r in probed.collect() if not r["_maybe"]}
    maybe_s = {r["surt"] for r in probed.collect() if r["_maybe"]}
    seen_s = {s for _, s in seen_rows}
    assert not (new_s & seen_s)  # FP-safety: no wrong drops possible
    assert {s for _, s in seen_rows[:50]} <= maybe_s
    assert new_s | maybe_s == {s for _, s in cand_rows}


def test_cuckoo_compact_and_delete_df(spark):
    from cocrawler_spark.state.cuckoo import (
        build_cuckoo_delta,
        compact_cuckoo,
        delete_cuckoo,
        probe_cuckoo,
    )

    w1 = [(f"h{i % 3}.test", f"com,h{i % 3})/p/{i}") for i in range(100)]
    w2 = [(f"h{i % 3}.test", f"com,h{i % 3})/r/{i}") for i in range(100)]
    d1 = build_cuckoo_delta(
        spark.createDataFrame(w1, "host string, surt string"), 1, 4
    )
    d2 = build_cuckoo_delta(
        spark.createDataFrame(w2, "host string, surt string"), 2, 4
    )
    both = d1.unionByName(d2)
    compacted = compact_cuckoo(both, 4, wave=2)
    cand = spark.createDataFrame(w1 + w2, "host string, surt string")
    probed = probe_cuckoo(cand, compacted, 4)
    assert all(r["_maybe"] for r in probed.collect())

    # expire the w1 surts: they must drop from the filter while w2
    # stays fully positive
    expired = spark.createDataFrame(w1, "host string, surt string")
    after = delete_cuckoo(compacted, expired, 4, wave=3)
    probed2 = {r["surt"]: r["_maybe"] for r in probe_cuckoo(cand, after, 4).collect()}
    assert all(probed2[s] for _, s in w2)
    # deleted keys probe negative unless they share a (bucket, fp)
    # with a surviving key — with 16-bit fps over 200 keys expect
    # near-all negatives
    neg = sum(1 for _, s in w1 if not probed2[s])
    assert neg >= len(w1) - 2


def test_cuckoo_parquet_roundtrip_with_overflow(spark, tmp_path):
    """Filters that went through parquet hand numpy ints back to the
    probe/compact/delete UDFs (and overflow entries take the XOR kick
    path) — pin the exact type mix the engine produces."""
    from cocrawler_spark.state.cuckoo import (
        build_cuckoo_delta,
        compact_cuckoo,
        delete_cuckoo,
        probe_cuckoo,
    )

    # 2 routing buckets over 600 surts -> per-bucket m is large enough
    # normally; overload by building two deltas and compacting (the
    # merged load exceeds one delta's design load -> overflow entries)
    w1 = [(f"h{i % 5}.test", f"com,h{i % 5})/p/{i}") for i in range(300)]
    w2 = [(f"h{i % 5}.test", f"com,h{i % 5})/q/{i}") for i in range(300)]
    d1 = build_cuckoo_delta(
        spark.createDataFrame(w1, "host string, surt string"), 1, 2
    )
    d2 = build_cuckoo_delta(
        spark.createDataFrame(w2, "host string, surt string"), 2, 2
    )
    p = str(tmp_path / "cuckoo")
    d1.unionByName(d2).write.mode("overwrite").parquet(p)
    filt = spark.read.parquet(p)
    compacted = compact_cuckoo(filt, 2, wave=2)
    cand = spark.createDataFrame(w1 + w2, "host string, surt string")
    assert all(
        r["_maybe"] for r in probe_cuckoo(cand, compacted, 2).collect()
    )
    # delete through the parquet-typed path too
    p2 = str(tmp_path / "cuckoo2")
    compacted.write.mode("overwrite").parquet(p2)
    after = delete_cuckoo(
        spark.read.parquet(p2),
        spark.createDataFrame(w1[:50], "host string, surt string"),
        2,
        wave=3,
    )
    got = {r["surt"]: r["_maybe"] for r in probe_cuckoo(cand, after, 2).collect()}
    assert all(got[s] for _, s in w2)
