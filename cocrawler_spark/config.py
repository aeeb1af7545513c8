"""Crawl configuration.

Reference analog: cocrawler/config.py† (YAML + defaults + CLI overrides;
see SURVEY.md §0 for the † citation convention — the reference tree was
empty, so module+symbol citations are behavioral, not line-anchored).
Ours is a frozen dataclass created on the driver and captured by closure
into vectorized UDFs; there is no runtime YAML machinery because config
is code in a library engine.
"""

from __future__ import annotations

from dataclasses import dataclass, asdict, replace


@dataclass(frozen=True)
class CrawlConfig:
    """All knobs of the crawl decision procedure (FIXTURES.md §4).

    The oracle simulator and the Spark engine consume the *same* object,
    which is what makes 'identical seed list + politeness budget ⇒
    identical crawl order' well defined (SURVEY.md §3.2).
    """

    max_depth: int = 3
    max_tries: int = 3
    max_pages: int = 10_000_000
    max_pages_per_host: int = 10_000_000
    wave_budget_seconds: float = 30.0
    default_crawl_delay: float = 1.0
    seed_priority: int = 0
    # links found on a page get parent.priority + link_priority_delta
    link_priority_delta: int = 1
    # embeds (media refs) get parent.priority + embed_priority_delta
    embed_priority_delta: int = 2
    rng_seed: int = 42
    # robots cache TTL measured in waves (reference: TTLCache seconds†)
    robots_ttl_waves: int = 5
    # deterministic "flaky fetch" model: 1 in flaky_mod URLs fail their
    # first attempt (exercises the tries/retry gate; SURVEY.md §2b)
    flaky_mod: int = 10
    # hard stop on wave count (safety net, not part of reference semantics)
    max_waves: int = 32
    # URL denylist (the url_allowed plugin seam†): candidates whose
    # CANONICAL url matches any pattern are dropped at add-time, after
    # the depth gate. Patterns must stay in the Java-regex ∩ Python-re
    # common subset (literals, char classes, alternation, anchors,
    # bounded repetition) — both the JVM rlike gate and the simulator's
    # re.search evaluate them, and gate parity is what the equality
    # suite asserts. Empty tuple = gate off (no plan change).
    deny_url_regexes: tuple = ()
    # Candidate memoization (BENCH/ANALYSIS.md entry 29's recorded
    # design): skip re-canonicalizing exact (raw, base) pairs already
    # disposed of in a PRIOR wave — pairs that passed every gate (their
    # surt is in `seen` once that wave commits, and seen only grows) or
    # were dropped for a depth-INDEPENDENT reason (bad_url, scheme,
    # private, dns_private, denylist). Pairs dropped by the depth gate
    # are never memoized: the same raw link reappearing at a shallower
    # depth must pass. Keys are the exact strings — hash-only keys
    # could collide and wrongly drop an unseen link. Bit-exactness of
    # the surviving frontier follows because a memoized pair's surt
    # group is discarded by the seen anti-join anyway; drop metrics
    # shift into `memo_skipped` (the simulator models this identically,
    # so the equality suite covers both settings).
    # Default OFF: on a single-bus box the memo anti-join trades
    # compute (which still scales with cores there) for shuffle bytes
    # (which do not) — measured trade in entry 29. Turn ON for real
    # multi-executor clusters with per-executor memory buses once
    # steady waves re-encounter ≳30% of candidate pairs (boilerplate
    # nav links dominate by wave 3 on web-shaped graphs).
    memoize_candidates: bool = False
    # Adaptive crawl delay (VERDICT r4 #2): feed each wave's observed
    # per-host fetch latency/error rate (operators/politeness.py
    # adaptive_crawl_delay — AIMD: slow hosts get >= 2x their response
    # time between hits, 5xx/429 bursts multiply it) back into the NEXT
    # wave's politeness slotting: effective delay = max(adaptive
    # output, robots/config delay) where a host has been observed —
    # feedback only ever backs off harder, never undercuts a
    # published Crawl-delay — else robots/config delay. State
    # is a per-wave 'adaptive_delay' delta table (latest observation
    # wins), reloaded like robots on commit and on resume(). Default
    # OFF: the simulator models static robots/config delays only, and
    # the engine/sim equality suite runs with this off.
    adaptive_delay: bool = False
    adaptive_min_delay: float = 0.1
    adaptive_max_delay: float = 30.0
    adaptive_err_backoff: float = 4.0
    # OPIC priority feedback (VERDICT r4 #3; Abiteboul et al. WWW'03):
    # each parsed page distributes integer cash `opic_cash` equally
    # over its outlinks (a redirect forwards the full amount); cash
    # accumulates per target HOST in a 'host_cash' delta table, and
    # wave i's accumulated cash (including wave i's own link graph)
    # lowers the priority value (= schedules earlier) of wave i+1's
    # candidates on rich hosts: boost = #thresholds their cash meets,
    # capped by len(opic_boost_thresholds). Integer cash (floor shares)
    # keeps the feedback bit-deterministic under any partitioning.
    # Default OFF (plans unchanged; equality suite runs with it off).
    opic_priority: bool = False
    opic_cash: int = 1024
    opic_boost_thresholds: tuple = (512, 4096)

    def to_dict(self) -> dict:
        return asdict(self)

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = CrawlConfig()
