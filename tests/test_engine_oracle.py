"""End-to-end equality: Spark engine vs oracle simulator (SURVEY.md §5.2(2)).

The engine must reproduce, exactly:
  (a) the seen set, (b) the crawl order (wave, seq, surt), (c) per-doc
  outlink sequences + sha1 digests, (d) metric sums — under identical
  seed list + politeness budget. This is the north_rule's correctness
  gate rendered testable in-sandbox.
"""

import pytest

from cocrawler_spark.config import CrawlConfig
from cocrawler_spark.oracle.simulator import simulate
from cocrawler_spark.plans.crawl import CrawlEngine
from cocrawler_spark.sources.corpus import (
    read_documents,
    read_robots_src,
    read_seed_parquet,
)
from cocrawler_spark.synth import generate, write_parquet


def build_engine(spark, web, cfg, tmpdir, **kw):
    paths = write_parquet(web, str(tmpdir / "web"))
    # bloom_min_seen=0: tiny webs never reach the production probe
    # threshold, and these suites must keep exercising the probe path
    # (bit-equality of probe on/off is itself covered below)
    kw.setdefault("bloom_min_seen", 0)
    return CrawlEngine(
        spark,
        cfg,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=str(tmpdir / "state"),
        **kw,
    )


def assert_engine_matches_oracle(engine, res):
    # (b) crawl order
    got_order = sorted(
        (r["wave"], r["seq"], r["surt"], r["url"])
        for r in engine.output("crawl_order").collect()
    )
    exp_order = sorted(res.crawl_order)
    assert got_order == exp_order
    # (a) seen set
    got_seen = {r["surt"] for r in engine.seen.collect()}
    assert got_seen == res.seen
    # (c) fetched content: status + sha1 + n_spans
    got_fetched = sorted(
        (r["wave"], r["url"], r["surt"], r["status"], r["sha1"], r["n_spans"])
        for r in engine.output("fetched_content").collect()
    )
    assert got_fetched == sorted(res.fetched)
    # (c) outlink sequences
    got_ol = {}
    for r in engine.output("outlinks").collect():
        got_ol.setdefault(r["doc_id"], []).append(
            (r["ord"], r["target"], r["kind"], r["span_offset"])
        )
    got_ol = {k: [t[1:] for t in sorted(v)] for k, v in got_ol.items()}
    assert got_ol == res.outlinks
    # facets data product (wave, url, key, value)
    got_fc = sorted(
        (r["wave"], r["url"], r["key"], r["value"])
        for r in engine.output("facets").collect()
    )
    assert got_fc == sorted(res.facets)
    # DNS cache (hosts dim: fake-resolved ip + first wave seen)
    got_dns = sorted(
        (r["host"], r["ip"], r["first_wave"])
        for r in engine.output("dns_cache").collect()
    )
    assert got_dns == res.dns_cache
    # redirects
    got_rd = sorted(
        (r["wave"], r["from_url"], r["from_surt"], r["to_url"], r["to_surt"], r["kind"])
        for r in engine.output("redirects").collect()
    )
    assert got_rd == sorted(res.redirects)
    # (d) metrics
    got_m = {
        (r["wave"], r["name"], r["kind"]): r["value"]
        for r in engine.output("metrics").collect()
    }
    exp_m = {(w, n, k): v for (w, n, k, v) in res.metrics}
    assert got_m == exp_m


CFG = CrawlConfig(
    max_depth=2, max_tries=3, wave_budget_seconds=6.0, max_waves=5,
    default_crawl_delay=1.0,
)


def test_tiny_web_equality(spark, tiny_web, tmp_path):
    engine = build_engine(spark, tiny_web, CFG, tmp_path)
    engine.run()
    res = simulate(tiny_web, CFG)
    assert_engine_matches_oracle(engine, res)


def test_tiny_web_equality_alt_seed(spark, tiny_web, tmp_path):
    cfg = CFG.with_(rng_seed=7, max_depth=3, wave_budget_seconds=3.0)
    engine = build_engine(spark, tiny_web, cfg, tmp_path)
    engine.run()
    assert_engine_matches_oracle(engine, simulate(tiny_web, cfg))


def test_tiny_max_pages_cap(spark, tiny_web, tmp_path):
    cfg = CFG.with_(max_pages=13)
    engine = build_engine(spark, tiny_web, cfg, tmp_path)
    engine.run()
    res = simulate(tiny_web, cfg)
    assert len(res.crawl_order) <= 13
    assert_engine_matches_oracle(engine, res)


@pytest.mark.slow
def test_small_web_equality(spark, small_web, tmp_path):
    cfg = CFG.with_(wave_budget_seconds=20.0, max_waves=4, max_pages=600)
    engine = build_engine(spark, small_web, cfg, tmp_path)
    engine.run()
    assert_engine_matches_oracle(engine, simulate(small_web, cfg))


def test_resume_equals_uninterrupted(spark, tiny_web, tmp_path):
    # run 2 waves, new engine object resumes, must equal a straight run
    e1 = build_engine(spark, tiny_web, CFG, tmp_path)
    e1.seed_frontier()
    e1.run_wave(1)
    e1.run_wave(2)
    e2 = build_engine(spark, tiny_web, CFG, tmp_path)  # same state dir
    e2.resume()
    assert_engine_matches_oracle(e2, simulate(tiny_web, CFG))


def test_training_pipeline_matches_mirror(spark, tiny_web, tmp_path):
    """End-to-end: crawl → exact dedup → minhash near-dup drop →
    quality/langid gates → committed train_docs table. The surviving
    doc set must equal the pure-Python mirror run on the oracle
    simulator's fetched pages (VERDICT r2 task #5)."""
    from cocrawler_spark.functions.parse import text_of
    from cocrawler_spark.oracle.pipeline import train_pipeline_mirror
    from cocrawler_spark.plans.pipeline import run_training_pipeline

    knobs = dict(
        min_tokens=1, min_alpha_ratio=0.0, min_stopword_ratio=0.0,
        langs=("en", "und"),
    )
    e = build_engine(spark, tiny_web, CFG, tmp_path)
    e.run()
    out = run_training_pipeline(e, **knobs)
    got = {r["id"] for r in out.collect()}

    res = simulate(tiny_web, CFG)
    fetched_ok = {u for (w, u, s, st, sha, ns) in res.fetched if st == 200}
    docs = {u: text_of(tiny_web.docs[u]) for u in fetched_ok}
    exp = train_pipeline_mirror(docs, **knobs)
    assert got == exp and len(got) > 0
    # versioned like every other state table: reload via the catalog
    reloaded = {r["id"] for r in e.output("train_docs").collect()}
    assert reloaded == exp


def test_training_pipeline_components_matches_mirror(spark, tiny_web, tmp_path):
    """The transitive (connected-components) survivor rule end-to-end:
    Spark large-star/small-star CC over the LSH pair graph must keep
    exactly the per-component min ids the union-find mirror keeps."""
    from cocrawler_spark.functions.parse import text_of
    from cocrawler_spark.oracle.pipeline import train_pipeline_mirror
    from cocrawler_spark.plans.pipeline import run_training_pipeline

    knobs = dict(
        min_tokens=1, min_alpha_ratio=0.0, min_stopword_ratio=0.0,
        langs=("en", "und"), neardup="components",
    )
    e = build_engine(spark, tiny_web, CFG, tmp_path)
    e.run()
    got = {r["id"] for r in run_training_pipeline(e, **knobs).collect()}

    res = simulate(tiny_web, CFG)
    fetched_ok = {u for (w, u, s, st, sha, ns) in res.fetched if st == 200}
    docs = {u: text_of(tiny_web.docs[u]) for u in fetched_ok}
    exp = train_pipeline_mirror(docs, **knobs)
    assert got == exp and len(got) > 0
    # components can only drop more than (never fewer than) pairwise:
    pw = train_pipeline_mirror(docs, **{**knobs, "neardup": "pairwise"})
    assert exp <= pw


def test_training_pipeline_keep_best_matches_mirror(spark, tiny_web, tmp_path):
    """The quality-aware survivor rule end-to-end: each component keeps
    its most-token member (ties min id) via keep_best_representative
    chained inside the pipeline; must equal the union-find mirror with
    the same argmax rule."""
    from cocrawler_spark.functions.parse import text_of
    from cocrawler_spark.oracle.pipeline import train_pipeline_mirror
    from cocrawler_spark.plans.pipeline import run_training_pipeline

    knobs = dict(
        min_tokens=1, min_alpha_ratio=0.0, min_stopword_ratio=0.0,
        langs=("en", "und"), survivor="quality",
    )
    e = build_engine(spark, tiny_web, CFG, tmp_path)
    e.run()
    got = {r["id"] for r in run_training_pipeline(e, **knobs).collect()}

    res = simulate(tiny_web, CFG)
    fetched_ok = {u for (w, u, s, st, sha, ns) in res.fetched if st == 200}
    docs = {u: text_of(tiny_web.docs[u]) for u in fetched_ok}
    exp = train_pipeline_mirror(docs, **knobs)
    assert got == exp and len(got) > 0


def test_tiny_equality_bloom_threshold_default(spark, tiny_web, tmp_path):
    """Production default bloom_min_seen: the probe stays disengaged
    below the threshold (deltas still built and staged every wave) —
    a pure physical-plan choice, bit-identical to the oracle."""
    e = build_engine(spark, tiny_web, CFG, tmp_path, bloom_min_seen=100_000)
    e.run()
    assert_engine_matches_oracle(e, simulate(tiny_web, CFG))


def test_resume_bloom_format_mismatch_rebuilds(spark, tiny_web, tmp_path):
    """A snapshot whose bloom bitmaps were written under a different
    bucket routing (manifest bloom_format != current) must NOT be
    probed on resume — stale-routing probes yield false negatives,
    which bypass the exact anti-join and re-admit seen URLs. The
    engine rebuilds the filter from the exact seen table instead;
    the resumed crawl stays bit-identical to the oracle."""
    import json

    e1 = build_engine(spark, tiny_web, CFG, tmp_path)
    e1.seed_frontier()
    e1.run_wave(1)
    e1.run_wave(2)
    # corrupt the manifest's routing version (simulates a snapshot from
    # an engine build that routed bloom buckets differently)
    mpath = tmp_path / "state" / "manifests" / "m00002.json"
    m = json.loads(mpath.read_text())
    assert m["bloom_format"] >= 2
    m["bloom_format"] = 1
    mpath.write_text(json.dumps(m))
    e2 = build_engine(spark, tiny_web, CFG, tmp_path)
    e2.resume()
    assert e2._bloom_force_full is False  # next commit re-published full
    m_final = e2.catalog.latest_manifest()
    from cocrawler_spark.state.bloom import BLOOM_FORMAT_VERSION

    assert m_final["bloom_format"] == BLOOM_FORMAT_VERSION
    assert_engine_matches_oracle(e2, simulate(tiny_web, CFG))


def test_tiny_equality_cuckoo_filter(spark, tiny_web, tmp_path):
    """seen_filter='cuckoo' swaps the probabilistic sidecar (bloom
    bitmaps → cuckoo fingerprint tables, state/cuckoo.py) — a pure
    physical-plan choice: FPs fall through to the exact anti-join,
    negatives are guaranteed-unseen, so the crawl must stay
    bit-identical to the oracle."""
    eng = build_engine(spark, tiny_web, CFG, tmp_path, seen_filter="cuckoo")
    eng.run()
    m = eng.catalog.latest_manifest()
    from cocrawler_spark.state.cuckoo import CUCKOO_FORMAT_VERSION

    assert m["seen_filter"] == "cuckoo"
    assert m["cuckoo_format"] == CUCKOO_FORMAT_VERSION
    assert_engine_matches_oracle(eng, simulate(tiny_web, CFG))


def test_resume_filter_kind_mismatch_rebuilds(spark, tiny_web, tmp_path):
    """Resuming a bloom-built snapshot with a cuckoo-configured engine
    must rebuild the sidecar from the exact seen table (probing bloom
    bitmaps as cuckoo tables would be garbage) and continue
    bit-identically."""
    e1 = build_engine(spark, tiny_web, CFG, tmp_path)
    e1.seed_frontier()
    e1.run_wave(1)
    e1.run_wave(2)
    e2 = build_engine(spark, tiny_web, CFG, tmp_path, seen_filter="cuckoo")
    e2.resume()
    m_final = e2.catalog.latest_manifest()
    assert m_final["seen_filter"] == "cuckoo"
    assert_engine_matches_oracle(e2, simulate(tiny_web, CFG))


def test_expire_seen_recrawl_roundtrip(spark, tiny_web, tmp_path):
    """Recrawl expiry end-to-end on the cuckoo sidecar: after a full
    crawl, expire a slice of fetched surts with readmit=True — they
    stay in `seen` (frontier ⊆ seen invariant), reappear on the
    frontier via='recrawl', and a resume() re-fetches exactly them;
    never-fetched expired surts are forgotten from `seen`."""
    # big wave budget so the crawl exhausts quickly: an unfetched
    # leftover frontier would blend its own fetches into the recrawl
    # waves below (resumed engines must carry the SAME config — the
    # manifest config-drift guard)
    cfg = CrawlConfig(
        max_depth=2, max_tries=3, wave_budget_seconds=60.0, max_waves=12,
        default_crawl_delay=1.0,
    )
    eng = build_engine(spark, tiny_web, cfg, tmp_path, seen_filter="cuckoo")
    eng.run(max_waves=12)
    assert eng.catalog.latest_manifest()["done"] is True
    seen_before = {r["surt"] for r in eng.seen.collect()}
    total_before = eng.total_fetched
    fetched = sorted(
        {r["surt"] for r in eng.output("fetched_content").collect()}
    )
    victims = fetched[:5]
    ghost = "test,nonexistent)/never/fetched"  # enqueue-only expiry analog
    assert ghost not in seen_before
    exp = spark.createDataFrame(
        [(s,) for s in victims + [ghost]], "surt string"
    )
    removed = eng.expire_seen(exp, readmit=True)
    # fetched victims are readmitted, NOT forgotten; the ghost isn't in
    # seen at all, so nothing is removed
    assert removed == 0
    m = eng.catalog.latest_manifest()
    assert m["expired"] == 0 and m["done"] is False

    e2 = build_engine(spark, tiny_web, cfg, tmp_path, seen_filter="cuckoo")
    # the expiry snapshot consumes a wave number; lift the cap so the
    # recrawl waves actually run
    e2.resume(max_waves=24)
    # seen unchanged (victims stayed; ghost never existed)
    assert {r["surt"] for r in e2.seen.collect()} == seen_before
    fc = e2.output("fetched_content").collect()
    new_waves = [r for r in fc if r["wave"] > eng.last_wave]
    assert {r["surt"] for r in new_waves} == set(victims)
    # >=: a flaky (1-in-flaky_mod) victim 599s its first re-fetch and
    # retries next wave, adding an attempt beyond the len(victims) floor
    assert e2.total_fetched >= total_before + len(victims)

    # readmit=False: fetched surts ARE forgotten from seen
    removed2 = e2.expire_seen(
        spark.createDataFrame([(victims[0],)], "surt string"), readmit=False
    )
    assert removed2 == 1
    e3 = build_engine(spark, tiny_web, cfg, tmp_path, seen_filter="cuckoo")
    e3.resume(max_waves=24)
    assert victims[0] not in {r["surt"] for r in e3.seen.collect()}

    # time travel: the pre-expiry snapshot still reads its full seen
    # set (immutable manifests over immutable parquet versions) even
    # though the latest snapshot has forgotten victims[0]
    hist = e3.output_at("seen", eng.last_wave)
    assert {r["surt"] for r in hist.collect()} == seen_before
    assert e3.output_at("seen", 99_999) is None


def test_robots_txt_source_equality(spark, tiny_web, tmp_path):
    """Raw robots.txt TEXT as the engine's robots source: serialize
    each host's rules to an REP body (with a decoy group that must
    lose RFC 9309 group selection), parse with robots_src_from_txt,
    crawl — bit-identical to the simulator reading the structured
    rules. Closes the loop robots fetch → REP parse → broadcast join.
    ttl_waves has no REP wire form, so the web's ttls are normalized
    to the parser's default before comparing."""
    import copy

    from cocrawler_spark.sources.corpus import robots_src_from_txt

    web = copy.deepcopy(tiny_web)
    for h in web.robots:
        web.robots[h]["ttl_waves"] = 3

    def to_txt(r):
        lines = [
            "# synthetic robots.txt",
            "User-agent: imagebot-decoy",
            "Disallow: /",
            "",
            "User-agent: *",
            f"Crawl-delay: {r['crawl_delay']}",
        ]
        lines += [f"Disallow: {d}" for d in r["disallow"]]
        lines += [f"Allow: {a}" for a in r["allow"]]
        return "\n".join(lines) + "\n"

    paths = write_parquet(web, str(tmp_path / "web"))
    txt_df = spark.createDataFrame(
        [(h, to_txt(r)) for h, r in sorted(web.robots.items())],
        "host string, robots_txt string",
    )
    eng = CrawlEngine(
        spark,
        CFG,
        documents=read_documents(spark, paths["documents"]),
        robots_src=robots_src_from_txt(txt_df, default_ttl_waves=3),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=str(tmp_path / "state"),
        bloom_min_seen=0,
    )
    eng.run()
    assert_engine_matches_oracle(eng, simulate(web, CFG))


def test_tiny_equality_salted_no_bloom(spark, tiny_web, tmp_path):
    """Engine variants (salted politeness rank, bloom off, shuffle
    fetch join) are pure physical-plan choices — oracle equality must
    be bit-identical."""
    from cocrawler_spark.sources.corpus import (
        read_documents, read_robots_src, read_seed_parquet,
    )
    from cocrawler_spark.synth import write_parquet

    paths = write_parquet(tiny_web, str(tmp_path / "web"))
    engine = CrawlEngine(
        spark, CFG,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=str(tmp_path / "state"),
        use_bloom=False,
        politeness_salt=8,
        broadcast_fetch=False,
    )
    engine.run()
    assert_engine_matches_oracle(engine, simulate(tiny_web, CFG))


def test_tiny_equality_copartition_fetch(spark, tiny_web, tmp_path):
    """copartition_docs=True (the storage-partitioned fetch-join analog:
    corpus hash-bucketed by doc_id once, no per-wave broadcast) is a
    physical-plan choice only — bit-identical to the oracle."""
    from cocrawler_spark.sources.corpus import (
        read_documents, read_robots_src, read_seed_parquet,
    )
    from cocrawler_spark.synth import write_parquet

    paths = write_parquet(tiny_web, str(tmp_path / "web"))
    engine = CrawlEngine(
        spark, CFG,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=str(tmp_path / "state"),
        copartition_docs=True,
    )
    engine.run()
    assert_engine_matches_oracle(engine, simulate(tiny_web, CFG))
    engine.documents.unpersist()


def test_tiny_equality_predistill(spark, tiny_web, tmp_path):
    """predistill=True (parse-once fetch distillate: one corpus spans
    scan per crawl, co-partitioned slim fetch joins per wave) is a
    physical-plan choice only — every fetch product is deterministic
    per doc, so crawl order, seen set, content digests and outlink
    sequences stay bit-identical to the oracle."""
    from cocrawler_spark.sources.corpus import (
        read_documents, read_robots_src, read_seed_parquet,
    )
    from cocrawler_spark.synth import write_parquet

    paths = write_parquet(tiny_web, str(tmp_path / "web"))
    engine = CrawlEngine(
        spark, CFG,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=str(tmp_path / "state"),
        predistill=True,
    )
    engine.run()
    assert_engine_matches_oracle(engine, simulate(tiny_web, CFG))
    if engine._distillate is not None:
        engine._distillate.unpersist()


def test_tiny_equality_lean_mode(spark, tiny_web, tmp_path):
    """lean=True (bench mode) skips metrics-only count jobs but must not
    change any crawl decision: order, seen set, content, redirects all
    bit-identical to the oracle; loop control (frontier exhaustion,
    global page cap) driven by lineage counts instead of count() jobs."""
    from cocrawler_spark.sources.corpus import (
        read_documents, read_robots_src, read_seed_parquet,
    )
    from cocrawler_spark.synth import write_parquet

    cfg = CFG.with_(max_pages=13)
    paths = write_parquet(tiny_web, str(tmp_path / "web"))
    engine = CrawlEngine(
        spark, cfg,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_parquet(spark, paths["seeds"]),
        state_dir=str(tmp_path / "state"),
        lean=True,
    )
    engine.run()
    res = simulate(tiny_web, cfg)
    got_order = sorted(
        (r["wave"], r["seq"], r["surt"], r["url"])
        for r in engine.output("crawl_order").collect()
    )
    assert got_order == sorted(res.crawl_order)
    assert {r["surt"] for r in engine.seen.collect()} == res.seen
    assert engine.seen_total == len(res.seen)
    got_fetched = sorted(
        (r["wave"], r["url"], r["surt"], r["status"], r["sha1"], r["n_spans"])
        for r in engine.output("fetched_content").collect()
    )
    assert got_fetched == sorted(res.fetched)
    got_rd = sorted(
        (r["wave"], r["from_url"], r["from_surt"], r["to_url"], r["to_surt"], r["kind"])
        for r in engine.output("redirects").collect()
    )
    assert got_rd == sorted(res.redirects)
    # lean's partial metrics table is EXPLICIT, not silent: summary()
    # names exactly the skipped per-wave metrics, and none of those
    # names appear in the committed metrics table (VERDICT r2 task #7)
    from cocrawler_spark.plans.crawl import LEAN_SKIPPED_METRICS

    s = engine.summary()
    assert s["lean"] is True
    assert s["skipped_metrics"] == list(LEAN_SKIPPED_METRICS)
    assert s["total_fetched"] == engine.total_fetched > 0
    assert s["waves"] > 0
    present = {r["name"] for r in engine.output("metrics").collect()}
    assert present.isdisjoint(LEAN_SKIPPED_METRICS)
    assert "pages_fetched" in present  # control metrics still recorded


def test_rollback_resume(spark, tiny_web, tmp_path):
    """Roll back to wave 1's snapshot and re-run: stale deltas from the
    abandoned waves must not leak into state (bit-identical result)."""
    e1 = build_engine(spark, tiny_web, CFG, tmp_path)
    e1.run()  # full crawl, all waves committed
    e2 = build_engine(spark, tiny_web, CFG, tmp_path)  # same state dir
    e2.resume(at_wave=1)  # rollback + replay waves 2..n
    assert_engine_matches_oracle(e2, simulate(tiny_web, CFG))


def test_seed_text_reader(spark, tiny_web, tmp_path):
    """Text seed files: one URL per line, '#' comments, blanks skipped
    (cocrawler/seeds.py† semantics) — crawl result identical to the
    parquet seed path."""
    from cocrawler_spark.sources.corpus import (
        read_documents, read_robots_src, read_seed_text,
    )
    from cocrawler_spark.synth import write_parquet

    paths = write_parquet(tiny_web, str(tmp_path / "web"))
    seed_txt = tmp_path / "seeds.txt"
    seed_txt.write_text(
        "# seed list\n\n" + "\n".join(tiny_web.seeds) + "\n# trailing comment\n"
    )
    engine = CrawlEngine(
        spark, CFG,
        documents=read_documents(spark, paths["documents"]),
        robots_src=read_robots_src(spark, paths["robots_src"]),
        seeds=read_seed_text(spark, str(seed_txt)),
        state_dir=str(tmp_path / "state"),
    )
    engine.run()
    assert_engine_matches_oracle(engine, simulate(tiny_web, CFG))


def test_tiny_equality_denylist(spark, tiny_web, tmp_path):
    """URL denylist gate (config.deny_url_regexes): JVM rlike gate and
    the simulator's re.search agree on drops, metrics, and the crawl
    order that survives — and the gate actually fires (nonzero
    denylist_dropped)."""
    cfg = CFG.with_(deny_url_regexes=(r"/p/1\d$", r"^http://h3\."))
    engine = build_engine(spark, tiny_web, cfg, tmp_path)
    engine.run()
    res = simulate(tiny_web, cfg)
    denied = sum(v for (w, n, k, v) in res.metrics if n == "denylist_dropped")
    assert denied > 0, "denylist scenario must actually drop URLs"
    assert all(
        not u.startswith("http://h3.") for (_, _, _, u) in res.crawl_order
    )
    assert_engine_matches_oracle(engine, res)


def test_resume_config_mismatch_raises(spark, tiny_web, tmp_path):
    """Snapshots record their config; resuming under a semantically
    different one must raise (silent divergence guard), while a pure
    max_waves change and allow_config_change=True both proceed."""
    e1 = build_engine(spark, tiny_web, CFG, tmp_path)
    e1.run(max_waves=2)

    changed = CFG.with_(max_depth=CFG.max_depth + 1)
    e2 = build_engine(spark, tiny_web, changed, tmp_path)
    with pytest.raises(ValueError, match="max_depth"):
        e2.resume()

    # max_waves is run-control, not semantics — no error; and the
    # completed resume must still equal the uninterrupted oracle run.
    e3 = build_engine(spark, tiny_web, CFG.with_(max_waves=CFG.max_waves + 1), tmp_path)
    e3.resume(max_waves=CFG.max_waves)
    assert_engine_matches_oracle(e3, simulate(tiny_web, CFG))


def test_training_pipeline_split_pack_matches_mirror(spark, tiny_web, tmp_path):
    """Crawl -> pipeline survivors -> hash split -> per-split sequence
    packing, all on engine outputs, vs a pure-Python mirror: the split
    assignment is the md5-bucket rule and the per-split token offsets
    are an id-ordered fold within each split."""
    import hashlib

    from cocrawler_spark.functions.parse import text_of
    from cocrawler_spark.functions.text import STOPWORDS  # noqa: F401 (parity import)
    from cocrawler_spark.operators.curation import hash_split
    from cocrawler_spark.operators.ordering import with_grouped_cumsum
    from cocrawler_spark.oracle.pipeline import train_pipeline_mirror
    from cocrawler_spark.plans.pipeline import run_training_pipeline

    # lorem-ipsum synth text mostly classifies fr ("et" hits the fr
    # stoplist) — allow every language so the survivor set is large
    # enough to spread across splits
    knobs = dict(
        min_tokens=1, min_alpha_ratio=0.0, min_stopword_ratio=0.0,
        langs=("en", "und", "fr", "de", "es"),
    )
    e = build_engine(spark, tiny_web, CFG, tmp_path)
    e.run()
    surv = run_training_pipeline(e, **knobs)
    ratios = {"train": 0.5, "val": 0.3, "test": 0.2}
    sp = hash_split(surv, id_col="id", ratios=ratios, seed=3).select(
        "id", "split", "n_tokens"
    )
    packed = with_grouped_cumsum(sp, ["split"], ["id"], "n_tokens", out_col="cum")
    got = {
        r["id"]: (r["split"], r["cum"] - r["n_tokens"])
        for r in packed.collect()
    }

    res = simulate(tiny_web, CFG)
    fetched_ok = {u for (w, u, s, st, sha, ns) in res.fetched if st == 200}
    docs = {u: text_of(tiny_web.docs[u]) for u in fetched_ok}
    exp_ids = train_pipeline_mirror(docs, **knobs)

    import re as _re

    def _ntok(t):
        return len([x for x in _re.split("[^a-z0-9]+", t.lower()) if x])

    def _split(i):
        b = int(hashlib.md5(f"split3:{i}".encode()).hexdigest()[:15], 16) % 10_000
        return "train" if b < 5000 else ("val" if b < 8000 else "test")

    exp = {}
    offsets = {}
    for i in sorted(exp_ids):
        s = _split(i)
        exp[i] = (s, offsets.get(s, 0))
        offsets[s] = offsets.get(s, 0) + _ntok(docs[i])
    assert got == exp and len(got) > 0
    assert len({v[0] for v in got.values()}) >= 2  # non-degenerate split


def test_memoize_candidates_equality(spark, tiny_web, tmp_path):
    """VERDICT r3 next-round #6 / ANALYSIS entry 29: with candidate
    memoization ON, engine outputs (order, seen, content, metrics incl.
    the memo_skipped accounting shift) still equal the simulator's —
    and the memoization actually fires (memo_skipped > 0 on a web whose
    nav links repeat across waves)."""
    cfg = CFG.with_(memoize_candidates=True)
    engine = build_engine(spark, tiny_web, cfg, tmp_path)
    engine.run()
    res = simulate(tiny_web, cfg)
    assert_engine_matches_oracle(engine, res)
    skipped = sum(
        v for (w, n, k, v) in res.metrics if n == "memo_skipped"
    )
    assert skipped > 0, "memoization never fired on this web"


def test_memoize_candidates_frontier_invariant(spark, tiny_web, tmp_path):
    """Memoization must not change WHAT is crawled — only how much
    add_url work repeats: crawl order, seen set and fetched content are
    bit-identical between flag ON and OFF (drop metrics legitimately
    shift into memo_skipped)."""
    on = simulate(tiny_web, CFG.with_(memoize_candidates=True))
    off = simulate(tiny_web, CFG)
    assert on.crawl_order == off.crawl_order
    assert on.seen == off.seen
    assert on.fetched == off.fetched
    assert on.redirects == off.redirects
    # engine ON vs sim OFF: everything except metrics matches too
    engine = build_engine(
        spark, tiny_web, CFG.with_(memoize_candidates=True), tmp_path
    )
    engine.run()
    got_order = sorted(
        (r["wave"], r["seq"], r["surt"], r["url"])
        for r in engine.output("crawl_order").collect()
    )
    assert got_order == sorted(off.crawl_order)


def test_memoize_candidates_resume_equality(spark, tiny_web, tmp_path):
    """The memo table must survive a checkpoint/resume: stopping after
    2 waves and resuming yields the same outputs as one uninterrupted
    memoized run (and as the simulator)."""
    cfg = CFG.with_(memoize_candidates=True, max_waves=2)
    engine = build_engine(spark, tiny_web, cfg, tmp_path)
    engine.run()
    engine.close()
    cfg_full = cfg.with_(max_waves=CFG.max_waves)
    engine2 = build_engine(spark, tiny_web, cfg_full, tmp_path)
    engine2.resume(allow_config_change=True)
    res = simulate(tiny_web, cfg_full)
    assert_engine_matches_oracle(engine2, res)
