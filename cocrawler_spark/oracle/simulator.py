"""Single-threaded, deterministic reference crawl simulator.

This module IS the executable specification of the crawl decision
procedure (SURVEY.md §0.2): the reference (racerthunder/cocrawler — an
asyncio network crawler) cannot run in this sandbox and its tree was
empty at survey time, so the documented semantics of
canonicalize → dedup → robots → politeness → priority order are frozen
here, and the Spark engine (cocrawler_spark.plans) must match this
simulator's outputs exactly:

  - crawl order: sequence of (wave, seq, surt, url)
  - seen set: set of surts
  - fetched content: (wave, url, surt, status, sha1, n_spans)
  - redirects: (wave, from_surt, to_surt, kind)
  - metrics: per-wave counter sums / maxes (cocrawler/stats.py† analog)
  - outlinks: per-doc ordered (target, kind, span_offset) — the
    span-sequence-equality invariant of BASELINE.json:input_hint

Nondeterminism discipline: every place the reference uses wall-clock or
`random` (priority tiebreaker†, TTL expiry†) is replaced by the keyed
hash of functions/hashing.py and wave counters, in BOTH this simulator
and the engine, making order equality well-defined (SURVEY.md §3.2).

Wave semantics (Bulk-Synchronous-Parallel rendering of the reference's
continuous event loop; north_rule's unit is the wave):
  1. tiebreaker: rand = H(rng_seed, wave, surt) per frontier item.
  2. robots refresh for hosts whose entry is missing/expired (TTL in
     waves); one fetch per host per the reference's in-flight dedup†.
  3. robots allow/deny filter (longest-prefix; drop + metric).
  4. per-host budget + politeness slotting: items per host ordered by
     (priority, rand, surt); rank beyond remaining host budget is
     dropped; slot time (rank-1)*crawl_delay beyond the wave budget is
     DEFERRED to the next wave.
  5. global page cap: fetchable items in global (priority, rand, surt)
     order; beyond max_pages remaining → deferred; crawl stops when the
     cap is reached.
  6. fetch: miss→404; single redirect-span doc→301 (classify +
     re-enqueue target, same priority/depth — seed freebies keep
     is_seed); flaky URLs fail their first attempt→599 (retry with
     tries+1 until max_tries, then lost); else 200 → parse outlinks
     (links priority+link_delta, embeds priority+embed_delta, depth+1).
  7. add_url pipeline for candidates: canonicalize(base=parent) →
     scheme gate → depth gate → within-wave dedup on surt keeping the
     minimal (priority, depth, via, url) → seen-set anti-membership →
     enqueue into wave i+1 and insert into seen (enqueue-time insert,
     as in Crawler.add_url† → Datalayer.add_seen†).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions.dns import fake_dns_ip_py, is_private_host_py, resolved_private_py
from ..functions.domains import registered_domain_py
from ..functions.hashing import is_flaky, keyed_hash64, rand_key
from ..functions.parse import (
    content_sha1_py,
    extract_outlinks_py,
    redirect_target_py,
)
from ..functions.robots import robots_allowed_py
from ..functions.urls import (
    ALLOWED_SCHEMES,
    canonicalize_one,
    clean_link,
    special_redirect,
)
from ..synth import SynthWeb

VIA_SEED = "seed"
VIA_LINK = "link"
VIA_EMBED = "embed"
VIA_REDIRECT = "redirect"
VIA_RETRY = "retry"


@dataclass
class Item:
    url: str
    surt: str
    host: str
    path: str
    priority: int
    depth: int
    tries: int
    is_seed: bool
    via: str
    domain: str = ""

    def order_key(self, rand: int):
        return (self.priority, rand, self.surt)


@dataclass
class CrawlResult:
    crawl_order: list = field(default_factory=list)  # (wave, seq, surt, url)
    seen: set = field(default_factory=set)
    fetched: list = field(default_factory=list)  # (wave,url,surt,status,sha1,n_spans)
    redirects: list = field(default_factory=list)  # (wave,from_url,from_surt,to_url,to_surt,kind)
    metrics: list = field(default_factory=list)  # (wave,name,kind,value)
    outlinks: dict = field(default_factory=dict)  # doc_id -> [(target,kind,span_offset)]
    facets: list = field(default_factory=list)  # (wave,url,key,value)
    dns_cache: list = field(default_factory=list)  # (host,ip,first_wave)
    waves: int = 0


class Simulator:
    def __init__(self, web: SynthWeb, cfg: CrawlConfig):
        self.web = web
        self.cfg = cfg
        self.res = CrawlResult()
        self.robots_state: dict[str, dict] = {}  # host -> entry
        self.cand_memo: set = set()  # (raw, base_eff) pairs, cfg.memoize_candidates
        self.dns_cache: dict[str, tuple] = {}  # host -> (ip, first_wave)
        self.host_fetched: dict[str, int] = {}
        self.total_fetched = 0

    # -- helpers ------------------------------------------------------------

    def _metric(self, wave: int, name: str, value: float, kind: str = "sum"):
        self.res.metrics.append((wave, name, kind, float(value)))

    def _robots_for(self, host: str, wave: int) -> dict:
        ent = self.robots_state.get(host)
        if ent is not None and wave - ent["fetched_wave"] < ent["ttl_waves"]:
            return ent
        src = self.web.robots.get(host)
        if src is None:
            ent = {
                "crawl_delay": self.cfg.default_crawl_delay,
                "ttl_waves": self.cfg.robots_ttl_waves,
                "allow": [],
                "disallow": [],
                "fetched_wave": wave,
            }
        else:
            ent = {
                "crawl_delay": src["crawl_delay"],
                "ttl_waves": src["ttl_waves"],
                "allow": list(src["allow"]),
                "disallow": list(src["disallow"]),
                "fetched_wave": wave,
            }
        self.robots_state[host] = ent
        return ent

    def _add_candidates(self, wave: int, raw_candidates: list[dict]) -> list[Item]:
        """The add_url† pipeline, set-at-a-time. Returns new frontier items."""
        cfg = self.cfg
        canon_items: list[Item] = []
        counters = dict(
            bad_url=0, scheme_dropped=0, private_dropped=0,
            dns_private_dropped=0, depth_dropped=0, denylist_dropped=0,
        )
        # candidate memoization (cfg.memoize_candidates; mirrors the
        # engine): memo key = (raw, base_eff) with base nulled for
        # absolute links — the engine's pre-collapse base-nulling —
        # skip pairs disposed of in a PRIOR wave, collect this wave's
        # inserts (everything but depth-gate drops) for the end-of-wave
        # memo update (the engine's delta is only visible next wave).
        memo_skipped = 0
        wave_memo_inserts: set = set()
        for cand in raw_candidates:
            mkey = None
            # raw is never NULL in practice (extractors drop empties);
            # mirror the engine's null-UNSAFE join on raw regardless —
            # a NULL raw neither matches nor enters the memo there
            if cfg.memoize_candidates and cand["raw"] is not None:
                base_eff = (
                    None
                    if re.match(r"https?://", clean_link(cand["raw"] or ""))
                    else cand.get("base")
                )
                mkey = (cand["raw"], base_eff)
                if mkey in self.cand_memo:
                    memo_skipped += 1
                    continue
            c = canonicalize_one(cand["raw"], cand.get("base"))
            if not c.url:
                counters["bad_url"] += 1
                if mkey is not None:
                    wave_memo_inserts.add(mkey)
                continue
            if c.scheme not in ALLOWED_SCHEMES:
                counters["scheme_dropped"] += 1
                if mkey is not None:
                    wave_memo_inserts.add(mkey)
                continue
            if is_private_host_py(c.host):
                counters["private_dropped"] += 1
                if mkey is not None:
                    wave_memo_inserts.add(mkey)
                continue
            if resolved_private_py(fake_dns_ip_py(c.host)):
                counters["dns_private_dropped"] += 1
                if mkey is not None:
                    wave_memo_inserts.add(mkey)
                continue
            if cand["depth"] > cfg.max_depth:
                counters["depth_dropped"] += 1
                # never memoized: the same raw link at a shallower
                # depth must pass this gate on a later wave
                continue
            if cfg.deny_url_regexes and any(
                re.search(p, c.url) for p in cfg.deny_url_regexes
            ):
                counters["denylist_dropped"] += 1
                if mkey is not None:
                    wave_memo_inserts.add(mkey)
                continue
            if mkey is not None:
                # post-gate: its surt is in `seen` once this wave ends
                wave_memo_inserts.add(mkey)
            canon_items.append(
                Item(
                    url=c.url,
                    surt=c.surt,
                    host=c.host,
                    path=c.path + (("?" + c.query) if c.query else ""),
                    priority=cand["priority"],
                    depth=cand["depth"],
                    tries=0,
                    is_seed=cand["is_seed"],
                    via=cand["via"],
                    domain=registered_domain_py(c.host),
                )
            )
        # within-wave dedup on surt: keep min (priority, depth, via, url,
        # is_seed) — the full key makes the winner unique even when two
        # redirect parents with different seed flags discover one target
        # (the engine's row_number uses the identical ordering)
        best: dict[str, Item] = {}
        for it in canon_items:
            cur = best.get(it.surt)
            key = (it.priority, it.depth, it.via, it.url, it.is_seed)
            if cur is None or key < (
                cur.priority, cur.depth, cur.via, cur.url, cur.is_seed
            ):
                best[it.surt] = it
        wave_dups = len(canon_items) - len(best)
        # seen anti-membership + enqueue-time insert
        new_items: list[Item] = []
        seen_dups = 0
        for surt_ in sorted(best.keys()):
            it = best[surt_]
            if it.surt in self.res.seen:
                seen_dups += 1
                continue
            self.res.seen.add(it.surt)
            new_items.append(it)
        self._metric(wave, "bad_url", counters["bad_url"])
        self._metric(wave, "scheme_dropped", counters["scheme_dropped"])
        self._metric(wave, "private_dropped", counters["private_dropped"])
        self._metric(wave, "dns_private_dropped", counters["dns_private_dropped"])
        self._metric(wave, "depth_dropped", counters["depth_dropped"])
        self._metric(wave, "denylist_dropped", counters["denylist_dropped"])
        self._metric(wave, "wave_dup_dropped", wave_dups)
        self._metric(wave, "seen_dup_dropped", seen_dups)
        if cfg.memoize_candidates:
            self._metric(wave, "memo_skipped", memo_skipped)
            self.cand_memo |= wave_memo_inserts
        return new_items

    # -- seeds (wave 0 frontier) ---------------------------------------------

    def seed_frontier(self) -> list[Item]:
        cands = [
            {
                "raw": s,
                "base": None,
                "priority": self.cfg.seed_priority,
                "depth": 0,
                "is_seed": True,
                "via": VIA_SEED,
            }
            for s in self.web.seeds
            if s.strip() and not s.strip().startswith("#")
        ]
        return self._add_candidates(wave=0, raw_candidates=cands)

    # -- one wave -------------------------------------------------------------

    def run_wave(self, wave: int, frontier: list[Item]) -> list[Item]:
        cfg = self.cfg
        rk = rand_key(cfg.rng_seed, wave)
        rand = {it.surt: keyed_hash64(rk, it.surt) for it in frontier}

        # robots refresh (once per distinct host)
        hosts = sorted({it.host for it in frontier})
        fresh = 0
        for h in hosts:
            before = self.robots_state.get(h, {}).get("fetched_wave")
            self._robots_for(h, wave)
            if self.robots_state[h]["fetched_wave"] == wave and before != wave:
                fresh += 1
        self._metric(wave, "robots_fetched", fresh)

        # DNS prefetch/cache (same host set as the robots refresh)
        new_dns = 0
        for h in hosts:
            if h not in self.dns_cache:
                self.dns_cache[h] = (fake_dns_ip_py(h), wave)
                new_dns += 1
        self._metric(wave, "dns_resolved", new_dns)

        allowed: list[Item] = []
        denied = 0
        for it in frontier:
            ent = self.robots_state[it.host]
            if robots_allowed_py(it.path, ent["allow"], ent["disallow"]):
                allowed.append(it)
            else:
                denied += 1
        self._metric(wave, "robots_denied", denied)

        # per-host budget + politeness slotting
        by_host: dict[str, list[Item]] = {}
        for it in allowed:
            by_host.setdefault(it.host, []).append(it)
        fetchable: list[Item] = []
        deferred: list[Item] = []
        budget_dropped = 0
        for h, items in by_host.items():
            items.sort(key=lambda it: it.order_key(rand[it.surt]))
            remaining = cfg.max_pages_per_host - self.host_fetched.get(h, 0)
            delay = self.robots_state[h]["crawl_delay"]
            for rn, it in enumerate(items, start=1):
                if rn > remaining:
                    budget_dropped += 1
                elif (rn - 1) * delay >= cfg.wave_budget_seconds:
                    deferred.append(it)
                else:
                    fetchable.append(it)
        self._metric(wave, "host_budget_dropped", budget_dropped)

        # global cap in global priority order
        fetchable.sort(key=lambda it: it.order_key(rand[it.surt]))
        remaining_global = cfg.max_pages - self.total_fetched
        if remaining_global < len(fetchable):
            deferred.extend(fetchable[remaining_global:])
            fetchable = fetchable[:remaining_global]

        # fetch loop (crawl order recorded here)
        raw_candidates: list[dict] = []
        requeued: list[Item] = []
        status_counts: dict[int, int] = {}
        links_found = embeds_found = lost = parse_skipped = 0
        max_depth_fetched = 0
        domains_fetched: set[str] = set()
        for seq, it in enumerate(fetchable, start=1):
            self.res.crawl_order.append((wave, seq, it.surt, it.url))
            self.total_fetched += 1
            self.host_fetched[it.host] = self.host_fetched.get(it.host, 0) + 1
            max_depth_fetched = max(max_depth_fetched, it.depth)
            domains_fetched.add(it.domain)
            spans = self.web.docs.get(it.url)
            if is_flaky(it.url, cfg.flaky_mod) and it.tries == 0:
                status = 599
            elif spans is None:
                status = 404
            elif redirect_target_py(spans) is not None:
                status = 301
            else:
                status = 200
            status_counts[status] = status_counts.get(status, 0) + 1
            sha1 = content_sha1_py(spans) if (spans is not None and status != 599) else ""
            n_spans = len(spans) if (spans is not None and status != 599) else 0
            self.res.fetched.append((wave, it.url, it.surt, status, sha1, n_spans))

            if status == 599:
                if it.tries + 1 < cfg.max_tries:
                    requeued.append(
                        Item(
                            url=it.url, surt=it.surt, host=it.host, path=it.path,
                            priority=it.priority, depth=it.depth, tries=it.tries + 1,
                            is_seed=it.is_seed, via=VIA_RETRY, domain=it.domain,
                        )
                    )
                else:
                    lost += 1
            elif status == 301:
                tgt_raw = redirect_target_py(spans)
                to_c = canonicalize_one(tgt_raw, it.url)
                from_c = canonicalize_one(it.url)
                kind = special_redirect(from_c, to_c) or "redirect"
                self.res.redirects.append(
                    (wave, it.url, it.surt, to_c.url, to_c.surt, kind)
                )
                raw_candidates.append(
                    {
                        "raw": tgt_raw, "base": it.url, "priority": it.priority,
                        "depth": it.depth, "is_seed": it.is_seed, "via": VIA_REDIRECT,
                    }
                )
            elif status == 200:
                # content-type gate: docs without a text span are fetched
                # but not parsed (cocrawler/post_fetch.py† parses only
                # text/html) — no outlinks, no candidates, no facets
                if not any(sp["kind"] == "text" for sp in spans):
                    parse_skipped += 1
                    continue
                links = extract_outlinks_py(spans)
                self.res.outlinks[it.url] = [
                    (l["target"], l["kind"], l["span_offset"]) for l in links
                ]
                n_l = sum(1 for l in links if l["kind"] == "link")
                self.res.facets.append((wave, it.url, "n_links", str(n_l)))
                self.res.facets.append(
                    (wave, it.url, "n_embeds", str(len(links) - n_l))
                )
                self.res.facets.append((wave, it.url, "n_spans", str(len(spans))))
                for l in links:
                    if l["kind"] == "link":
                        links_found += 1
                        pr = it.priority + cfg.link_priority_delta
                    else:
                        embeds_found += 1
                        pr = it.priority + cfg.embed_priority_delta
                    raw_candidates.append(
                        {
                            "raw": l["target"], "base": it.url, "priority": pr,
                            "depth": it.depth + 1, "is_seed": False, "via": l["kind"],
                        }
                    )

        for st in sorted(status_counts):
            self._metric(wave, f"fetch_status_{st}", status_counts[st])
        self._metric(wave, "pages_fetched", len(fetchable))
        self._metric(wave, "parse_skipped", parse_skipped)
        self._metric(wave, "domains_fetched", len(domains_fetched))
        self._metric(wave, "links_found", links_found)
        self._metric(wave, "embeds_found", embeds_found)
        self._metric(wave, "lost", lost)
        self._metric(wave, "retries_queued", len(requeued))
        self._metric(wave, "deferred", len(deferred))
        self._metric(wave, "max_depth_fetched", max_depth_fetched, kind="max")

        new_items = self._add_candidates(wave, raw_candidates)
        nxt = deferred + requeued + new_items
        self._metric(wave, "frontier_size_next", len(nxt))
        self._metric(wave, "seen_size", len(self.res.seen), kind="max")
        return nxt

    # -- full crawl -------------------------------------------------------------

    def run(self, max_waves: int | None = None) -> CrawlResult:
        cap = max_waves if max_waves is not None else self.cfg.max_waves
        frontier = self.seed_frontier()
        wave = 1
        while frontier and wave <= cap and self.total_fetched < self.cfg.max_pages:
            frontier = self.run_wave(wave, frontier)
            wave += 1
        self.res.waves = wave - 1
        self.res.dns_cache = sorted(
            (h, ip, w) for h, (ip, w) in self.dns_cache.items()
        )
        return self.res


def simulate(web: SynthWeb, cfg: CrawlConfig, max_waves: int | None = None) -> CrawlResult:
    return Simulator(web, cfg).run(max_waves)
