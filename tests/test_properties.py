"""Property-based tests (SURVEY.md §5.2(4)) — pure Python, hypothesis."""

import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

from cocrawler_spark.config import CrawlConfig
from cocrawler_spark.functions.robots import robots_allowed_py
from cocrawler_spark.functions.urls import canonicalize_one
from cocrawler_spark.oracle.simulator import simulate
from cocrawler_spark.synth import generate

_HOST = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z][a-z0-9]{1,6}){1,2}", fullmatch=True)
_PATH = st.from_regex(r"(/[a-zA-Z0-9._~%-]{0,12}){0,4}", fullmatch=True)
_QUERY = st.from_regex(r"([a-z]{1,5}=[a-zA-Z0-9%]{0,8}(&[a-z]{1,5}=[a-zA-Z0-9]{0,6}){0,2})?", fullmatch=True)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Http"]))
    host = draw(_HOST)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_PATH)
    q = draw(_QUERY)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "") + frag


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    once = canonicalize_one(u)
    if once.url:
        twice = canonicalize_one(once.url)
        assert twice.url == once.url
        assert twice.surt == once.surt


@given(urls())
@settings(max_examples=200, deadline=None)
@example(u="http://a.a0//0/.")  # r1 discovered failure: // path + trailing /.
def test_surt_scheme_and_fragment_invariant(u):
    c = canonicalize_one(u)
    if not c.url:
        return
    assert canonicalize_one(c.url + "#zzz").surt == c.surt
    # surt identical for the https twin — except when an explicit port is
    # present: :443 is default-for-https but not-for-http, so the surts
    # genuinely (and correctly) differ
    if ":" not in c.url.split("//", 1)[1].split("/", 1)[0]:
        twin = (
            c.url.replace("http://", "https://", 1)
            if c.url.startswith("http://")
            else c.url
        )
        assert canonicalize_one(twin).surt == c.surt


@given(
    st.text(alphabet=string.ascii_lowercase + "/", min_size=1, max_size=15),
    st.lists(st.text(alphabet=string.ascii_lowercase + "/", min_size=1, max_size=8), max_size=4),
    st.lists(st.text(alphabet=string.ascii_lowercase + "/", min_size=1, max_size=8), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_robots_longest_match_property(path, allow, disallow):
    path = "/" + path
    allow = ["/" + a for a in allow]
    disallow = ["/" + d for d in disallow]
    verdict = robots_allowed_py(path, allow, disallow)
    matches_a = [a for a in allow if path.startswith(a)]
    matches_d = [d for d in disallow if path.startswith(d)]
    if not matches_a and not matches_d:
        assert verdict is True
    elif matches_a and not matches_d:
        assert verdict is True
    elif matches_d and not matches_a:
        assert verdict is False
    else:
        la, ld = max(map(len, matches_a)), max(map(len, matches_d))
        assert verdict is (la >= ld)


def test_oracle_seen_monotone_and_politeness_invariants():
    """Seen set only grows wave over wave; no host exceeds its per-wave
    politeness cap; crawl order seqs are dense."""
    import math

    web = generate("tiny", seed=42)
    cfg = CrawlConfig(max_depth=3, wave_budget_seconds=4.0, max_waves=6)
    from cocrawler_spark.oracle.simulator import Simulator

    sim = Simulator(web, cfg)
    frontier = sim.seed_frontier()
    prev_seen = set(sim.res.seen)
    wave = 1
    while frontier and wave <= cfg.max_waves:
        frontier = sim.run_wave(wave, frontier)
        assert prev_seen <= sim.res.seen
        prev_seen = set(sim.res.seen)
        wave += 1
    per = {}
    for w, _, s, u in sim.res.crawl_order:
        host = u.split("/")[2]
        per.setdefault((w, host), 0)
        per[(w, host)] += 1
    for (w, host), n in per.items():
        delay = sim.robots_state[host]["crawl_delay"]
        cap = math.ceil(cfg.wave_budget_seconds / delay)
        assert n <= cap


# --- JVM fast-path canonicalization invariant (pure-Python check of the
# claim behind urls._FAST_URL_RE: a fast-shape URL canonicalizes to
# itself, field by field, so the JVM expressions can skip Python) ---

import re as _re

from cocrawler_spark.functions.domains import registered_domain_py
from cocrawler_spark.functions.urls import _FAST_URL_RE, canonicalize_one

_LABEL = st.from_regex(r"[a-z0-9-]{1,8}", fullmatch=True)
_PATHSEG = st.from_regex(r"[a-zA-Z0-9_-]{0,6}", fullmatch=True)


@st.composite
def fast_urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    labels = draw(st.lists(_LABEL, min_size=1, max_size=4))
    nseg = draw(st.integers(0, 4))
    path = "".join("/" + draw(_PATHSEG) for _ in range(nseg))
    return f"{scheme}://{'.'.join(labels)}{path}"


@given(fast_urls())
def test_fast_shape_canonicalizes_to_itself(u):
    """The claim behind the _FAST_RE short-circuit in canonicalize_one:
    a fast-shape URL canonicalizes to itself under the FULL canonicalizer
    (fast=False), field by field — so the short-circuit is an identity."""
    assert _re.match(_FAST_URL_RE, u), u
    c = canonicalize_one(u, base="http://base.test/dir/x", fast=False)
    m = _re.match(_FAST_URL_RE, u)
    scheme, host, rawpath = m.group(1), m.group(2), m.group(3)
    path = rawpath or "/"
    assert c.scheme == scheme
    assert c.host == host
    assert c.path == path
    assert c.query == ""
    assert c.url == f"{scheme}://{host}{path}"
    assert c.surt == ",".join(reversed(host.split("."))) + ")" + path
    # domain field parity: the JVM expression mirrors registered_domain_py;
    # here we pin that the python side is what the engine row would carry
    assert registered_domain_py(c.host) == registered_domain_py(host)


# --- base-independence of absolute links (the claim behind the engine's
# collapse-key nulling in _add_candidates: if clean_link(raw) is already
# absolute http(s), the base URL cannot influence canonicalization) ---

from cocrawler_spark.functions.urls import clean_link

_ABS_HTTP = _re.compile(r"^https?://")


@given(
    st.one_of(
        st.from_regex(r"https?://[a-z0-9.\-]{1,20}(/[\x20-\x7e]{0,30})?", fullmatch=True),
        st.text(min_size=0, max_size=40),
    ),
    st.sampled_from(
        ["http://base.test/dir/page.html", "https://b.test/", "http://b.test/a/b/c?q=1"]
    ),
)
def test_absolute_link_ignores_base(raw, base):
    s = clean_link(raw)
    if not _ABS_HTTP.match(s):
        return  # relative or non-http: base may matter — out of scope
    assert canonicalize_one(raw, base) == canonicalize_one(raw, None), (raw, base)
