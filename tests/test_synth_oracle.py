"""Synthetic web determinism + oracle simulator internal invariants."""

import pyarrow.parquet as pq

from cocrawler_spark.config import CrawlConfig
from cocrawler_spark.functions.surt import surt
from cocrawler_spark.oracle.simulator import simulate
from cocrawler_spark.synth import generate, write_parquet


def test_synth_deterministic():
    a = generate("tiny", seed=42)
    b = generate("tiny", seed=42)
    assert a.docs == b.docs and a.robots == b.robots and a.seeds == b.seeds
    c = generate("tiny", seed=43)
    assert c.docs != a.docs


def test_synth_shape(small_web):
    assert len(small_web.docs) == 2000
    assert len(small_web.hosts) == 40
    # zipf skew: hottest host has far more docs than median
    from collections import Counter

    counts = Counter(u.split("/")[2] for u in small_web.docs)
    ordered = [c for _, c in counts.most_common()]
    assert ordered[0] > 5 * ordered[len(ordered) // 2]
    # redirect docs ~8%
    n_redir = sum(
        1
        for spans in small_web.docs.values()
        if len(spans) == 1 and spans[0]["kind"] == "redirect"
    )
    assert 0.03 < n_redir / len(small_web.docs) < 0.15
    # deny-all hosts exist
    assert any(r["disallow"] == ["/"] and not r["allow"] for r in small_web.robots.values())
    assert any(r["allow"] == ["/p/"] for r in small_web.robots.values())


def test_synth_parquet_roundtrip(tiny_web, synth_dir):
    paths = write_parquet(tiny_web, synth_dir)
    t = pq.read_table(paths["documents"])
    assert t.num_rows == len(tiny_web.docs)
    assert [f.name for f in t.schema.field("spans").type.value_type] == [
        "kind", "text", "media_ref", "offset",
    ]


def _cfg(**kw):
    base = dict(max_depth=2, wave_budget_seconds=10.0, max_waves=6)
    base.update(kw)
    return CrawlConfig(**base)


def test_oracle_basic_invariants(small_web):
    res = simulate(small_web, _cfg())
    # crawl order: unique surts (never fetch same page twice except retries)
    fetched_surts = [s for (_, _, s, _) in res.crawl_order]
    from collections import Counter

    dupes = {s: c for s, c in Counter(fetched_surts).items() if c > 1}
    # only flaky retries may repeat, and at most max_tries times
    assert all(c <= 3 for c in dupes.values())
    # seq is 1..n per wave
    by_wave = {}
    for w, seq, _, _ in res.crawl_order:
        by_wave.setdefault(w, []).append(seq)
    for w, seqs in by_wave.items():
        assert seqs == list(range(1, len(seqs) + 1)), w
    # every fetched url's surt is in seen
    assert set(fetched_surts) <= res.seen
    assert res.waves >= 2
    assert len(res.crawl_order) > 50


def test_oracle_seen_monotone_and_depth_gate(small_web):
    res = simulate(small_web, _cfg(max_depth=1))
    res2 = simulate(small_web, _cfg(max_depth=2))
    assert res.seen <= res2.seen
    assert len(res.crawl_order) < len(res2.crawl_order)


def test_oracle_politeness_budget(small_web):
    # tiny budget: at most ceil(budget/delay) fetches per host per wave
    cfg = _cfg(wave_budget_seconds=2.0, default_crawl_delay=1.0)
    res = simulate(small_web, cfg)
    by = {}
    for w, _, s, u in res.crawl_order:
        host = u.split("/")[2]
        by.setdefault((w, host), 0)
        by[(w, host)] += 1
    delays = {h: r["crawl_delay"] for h, r in small_web.robots.items()}
    import math

    for (w, host), n in by.items():
        delay = delays.get(host, cfg.default_crawl_delay)
        cap = math.ceil(cfg.wave_budget_seconds / delay) if delay > 0 else 10**9
        assert n <= cap, (w, host, n, cap)


def test_oracle_robots_denied(small_web):
    res = simulate(small_web, _cfg())
    deny_hosts = {
        h for h, r in small_web.robots.items() if r["disallow"] == ["/"] and not r["allow"]
    }
    assert deny_hosts
    for (_, _, _, url) in res.crawl_order:
        assert url.split("/")[2] not in deny_hosts
    denied = sum(v for (_, n, _, v) in res.metrics if n == "robots_denied")
    assert denied > 0


def test_oracle_max_pages_cap(small_web):
    res = simulate(small_web, _cfg(max_pages=37))
    assert len(res.crawl_order) == 37


def test_oracle_determinism(small_web):
    r1 = simulate(small_web, _cfg())
    r2 = simulate(small_web, _cfg())
    assert r1.crawl_order == r2.crawl_order
    assert r1.seen == r2.seen
    assert r1.metrics == r2.metrics
    # different rng_seed → different order (tiebreaker really used)
    r3 = simulate(small_web, _cfg(rng_seed=7))
    assert r3.crawl_order != r1.crawl_order
    # but the seen SET is about reachability; order differs, membership may differ
    # only via politeness deferral timing — don't assert equality here.


def test_oracle_redirect_seen_and_classes(small_web):
    res = simulate(small_web, _cfg())
    kinds = {k for (_, _, _, _, _, k) in res.redirects}
    assert "redirect" in kinds
    assert kinds & {"addw", "tohttps", "same surt"}
    # redirect sources are seen (they were fetched from the frontier)
    for (_, _, from_surt, _, _, _) in res.redirects:
        assert from_surt in res.seen


def test_oracle_seed_canonicalization(tiny_web):
    res = simulate(tiny_web, _cfg(max_waves=1))
    w0 = [s for (w, _, s, _) in res.crawl_order if w == 1]
    # messy seed variants collapse to canonical surts
    expected = {surt(s) for s in tiny_web.seeds}
    denied = {  # deny-all seed may be robots-filtered
        h for h, r in tiny_web.robots.items() if r["disallow"] == ["/"] and not r["allow"]
    }
    got = set(w0)
    assert got <= expected
    assert len(got) >= len({s for s in expected}) - len(denied) - 1
