"""Engine wiring of the crawl-feedback operators (VERDICT r4 #2/#3).

Closed-form scenarios on handcrafted webs:

- cfg.adaptive_delay: a host whose fetches are observed slow (4 s)
  gets its politeness slot spacing widened to 2x its response time
  (8 s) in the NEXT wave — so a wave budget that admitted 3 of its
  URLs admits only 1; with the flag OFF nothing changes (the
  engine/sim equality suite pins the OFF path bit-exactly).
- cfg.opic_priority: cash from wave i's link graph (integer floor
  shares over each page's outlinks) boosts wave i+1 candidates on
  cash-rich hosts — their priority VALUE drops by one per met
  threshold, so they schedule earlier; poor hosts are untouched.
"""

from pyspark.sql import functions as F

from cocrawler_spark.config import CrawlConfig
from cocrawler_spark.synth import SynthWeb

from test_engine_oracle import build_engine


def _text_span(links, offset=0):
    parts = ["filler prose"]
    for t in links:
        parts.append(f'<a href="{t}">x</a>')
    return {"kind": "text", "text": " ".join(parts), "media_ref": "", "offset": offset}


def _adaptive_web():
    """h0 seed fans out to 6 h1 pages; each links one more h1 page."""
    web = SynthWeb(seed=1, n_hosts=2)
    web.seeds = ["http://h0.test/p/0"]
    web.docs["http://h0.test/p/0"] = [
        _text_span([f"http://h1.test/p/{i}" for i in range(6)])
    ]
    for i in range(6):
        web.docs[f"http://h1.test/p/{i}"] = [
            _text_span([f"http://h1.test/p/{i + 6}"])
        ]
    for i in range(6, 12):
        web.docs[f"http://h1.test/p/{i}"] = [_text_span([])]
    return web


def _slow_h1(url_col):
    return F.when(url_col.contains("h1.test"), F.lit(4000)).otherwise(F.lit(100))


_ADAPT_CFG = CrawlConfig(
    max_depth=3,
    wave_budget_seconds=3.0,
    max_waves=3,
    flaky_mod=10**9,  # no synthetic 599s: isolate the latency term
)


def _h1_fetched_at(eng, wave):
    return (
        eng.output("fetched_content")
        .filter((F.col("wave") == wave) & F.col("url").contains("h1.test"))
        .count()
    )


def test_adaptive_delay_widens_slow_host_slots(spark, tmp_path):
    # baseline: flag OFF — wave-3 budget (3 s / 1 s delay) admits 3
    off = build_engine(spark, _adaptive_web(), _ADAPT_CFG, tmp_path / "off",
                       latency_col_fn=_slow_h1)
    off.run()
    assert _h1_fetched_at(off, 2) == 3
    assert _h1_fetched_at(off, 3) == 3

    on = build_engine(
        spark, _adaptive_web(), _ADAPT_CFG.with_(adaptive_delay=True),
        tmp_path / "on", latency_col_fn=_slow_h1,
    )
    on.run()
    # wave 2 ran before h1 was ever observed: identical to OFF
    assert _h1_fetched_at(on, 2) == 3
    # wave 2's observations: h1 mean latency 4000 ms -> next_delay
    # 2 x 4 s = 8 s (slot spacing doubles the response time); the
    # fast host stays at the 1 s base
    delays = {
        r["host"]: r["next_delay"]
        for r in on.output("adaptive_delay").filter(F.col("fetched_wave") == 2).collect()
    }
    assert delays["h1.test"] == 8.0
    assert delays.get("h0.test", 1.0) == 1.0
    # wave 3: (rn - 1) * 8 >= 3 defers every rank but 1
    assert _h1_fetched_at(on, 3) == 1


def test_adaptive_delay_never_undercuts_robots(spark, tmp_path):
    """A published robots Crawl-delay is a FLOOR: a healthy fast host
    (adaptive next_delay = 1 s base) keeps its 2 s robots delay —
    feedback only ever backs off harder."""
    web = _adaptive_web()
    web.robots["h1.test"] = {
        "crawl_delay": 2.0, "ttl_waves": 5, "disallow": [], "allow": [],
    }
    eng = build_engine(
        spark, web, _ADAPT_CFG.with_(adaptive_delay=True), tmp_path,
        latency_col_fn=lambda u: F.lit(100),
    )
    eng.run()
    # (rn-1)*2 >= 3 defers rank 3+: 2 fetched per wave, both before
    # AND after h1 is observed healthy (undercutting to the 1 s base
    # would fetch 3 in wave 3)
    assert _h1_fetched_at(eng, 2) == 2
    assert _h1_fetched_at(eng, 3) == 2


def _opic_web():
    """Seed page: 8 links to h1 (rich) + 1 to h2 (poor)."""
    web = SynthWeb(seed=1, n_hosts=3)
    web.seeds = ["http://h0.test/p/0"]
    targets = [f"http://h1.test/p/{i}" for i in range(8)] + ["http://h2.test/p/0"]
    web.docs["http://h0.test/p/0"] = [_text_span(targets)]
    for t in targets:
        web.docs[t] = [_text_span([])]
    return web


def test_opic_cash_boosts_rich_host_priority(spark, tmp_path):
    cfg = CrawlConfig(max_depth=2, max_waves=1, flaky_mod=10**9)
    off = build_engine(spark, _opic_web(), cfg, tmp_path / "off")
    off.run()
    prio_off = {r["url"]: r["priority"] for r in off.frontier.collect()}
    assert set(prio_off.values()) == {1}  # seed(0) + link delta 1

    on = build_engine(
        spark, _opic_web(),
        cfg.with_(opic_priority=True, opic_cash=1024,
                  opic_boost_thresholds=(500, 10_000)),
        tmp_path / "on",
    )
    on.run()
    # floor(1024 / 9) = 113 per link: h1 pools 8 x 113 = 904 >= 500
    # (one threshold met -> boost 1), h2 gets 113 (no boost)
    cash = {r["host"]: r["cash"] for r in on.host_cash.collect()}
    assert cash["h1.test"] == 904
    assert cash["h2.test"] == 113
    prio_on = {r["url"]: r["priority"] for r in on.frontier.collect()}
    for url, p in prio_on.items():
        assert p == (0 if "h1.test" in url else 1), url


def test_feedback_flags_resume_equals_uninterrupted(spark, tmp_path):
    """Both feedback flags ON: a crawl interrupted after wave 2 and
    resumed by a fresh engine must reproduce the uninterrupted crawl
    exactly — including the adaptive_delay and host_cash state tables
    resume() reloads (the wiring's checkpoint/lineage claim)."""
    cfg = _ADAPT_CFG.with_(
        adaptive_delay=True, opic_priority=True,
        opic_cash=1024, opic_boost_thresholds=(500, 10_000),
    )
    # state_compact_every=2: wave 2 full-compacts BOTH new state
    # tables, so the resume below reloads from a compacted write
    a = build_engine(spark, _adaptive_web(), cfg, tmp_path / "a",
                     latency_col_fn=_slow_h1, state_compact_every=2)
    a.run()
    b1 = build_engine(spark, _adaptive_web(), cfg, tmp_path / "b",
                      latency_col_fn=_slow_h1, state_compact_every=2)
    b1.seed_frontier()
    b1.run_wave(1)
    b1.run_wave(2)
    b2 = build_engine(spark, _adaptive_web(), cfg, tmp_path / "b",
                      latency_col_fn=_slow_h1, state_compact_every=2)
    b2.resume()

    def snap(eng, name, cols):
        df = eng.output(name)
        assert df is not None, name
        return sorted(map(tuple, df.select(*cols).collect()))

    for name, cols in [
        ("crawl_order", ["wave", "seq", "surt", "url"]),
        ("adaptive_delay", ["fetched_wave", "host", "next_delay"]),
        ("host_cash", ["host", "cash"]),
    ]:
        assert snap(a, name, cols) == snap(b2, name, cols), name
    fa = sorted(map(tuple, a.frontier.select("url", "priority").collect()))
    fb = sorted(map(tuple, b2.frontier.select("url", "priority").collect()))
    assert fa == fb


def test_memoize_plus_opic_rejected(spark, tmp_path):
    """cfg.memoize_candidates + cfg.opic_priority is an unsupported
    combination (ADVICE r5: the memo would drop previously-seen links'
    OPIC cash before pooling) — the engine fails fast at construction."""
    import pytest

    from cocrawler_spark.config import CrawlConfig
    from cocrawler_spark.plans.crawl import CrawlEngine
    from cocrawler_spark.sources.corpus import (
        read_documents,
        read_robots_src,
        read_seed_parquet,
    )
    from cocrawler_spark.synth import generate, write_parquet

    web = generate("tiny", seed=42)
    paths = write_parquet(web, str(tmp_path / "web"))
    with pytest.raises(ValueError, match="memoize_candidates"):
        CrawlEngine(
            spark,
            CrawlConfig(memoize_candidates=True, opic_priority=True),
            documents=read_documents(spark, paths["documents"]),
            robots_src=read_robots_src(spark, paths["robots_src"]),
            seeds=read_seed_parquet(spark, paths["seeds"]),
            state_dir=str(tmp_path / "state"),
        )
