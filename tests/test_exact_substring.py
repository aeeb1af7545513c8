"""Exact-substring dedup (operators/dedup.py: exact_substring_stats /
exact_substring_scrub — the sliding-window restatement of Lee et al.
2022's ExactSubstr) vs a pure-Python mirror, plus the DUST parameter-
irrelevance miner (functions/urls.py: dust_param_rules) on a
handcrafted (url, digest) fixture."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cocrawler_spark.functions.urls import dust_param_rules
from cocrawler_spark.operators.dedup import (
    exact_substring_scrub,
    exact_substring_stats,
)

W = 3

DOCS = [
    (1, "alpha beta gamma delta epsilon"),  # shares a 3-gram with doc 2
    (2, "x alpha beta gamma y"),
    (3, "r r r r"),                          # self-repeated window
    (4, "one two"),                          # shorter than W: no windows
    (5, ""),                                 # empty
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_windows(w=W):
    wins = []  # (id, p(1-based), window tuple)
    for i, text in DOCS:
        t = _toks(text)
        for p in range(1, len(t) - w + 2):
            wins.append((i, p, tuple(t[p - 1 : p - 1 + w])))
    freq = Counter(wt for _, _, wt in wins)
    dup = [(i, p) for i, p, wt in wins if freq[wt] >= 2]
    return wins, dup


def _py_stats(w=W):
    wins, dup = _py_windows(w)
    out = {}
    for i, text in DOCS:
        t = _toks(text)
        ps = sorted(p for j, p in dup if j == i)
        covered = 0
        prev = None
        for p in ps:
            covered += w if prev is None else min(w, p - prev)
            prev = p
        n_wins = max(len(t) - w + 1, 0)
        out[i] = (
            len(t),
            n_wins,
            len(ps),
            covered,
            round(covered / len(t), 6) if t else 0.0,
        )
    return out


def _py_scrub(w=W):
    _, dup = _py_windows(w)
    out = {}
    for i, text in DOCS:
        t = _toks(text)
        cov = set()
        for j, p in dup:
            if j == i:
                cov.update(range(p, p + w))
        kept = [tok for k, tok in enumerate(t, start=1) if k not in cov]
        out[i] = (" ".join(kept), len(kept), len(t))
    return out


def _df(spark, parts=None):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def test_stats_matches_mirror(spark):
    got = {
        r["id"]: (
            r["n_tokens"], r["n_windows"], r["n_dup_windows"],
            r["dup_tokens"], r["dup_ratio"],
        )
        for r in exact_substring_stats(_df(spark), "text", "doc_id", W).collect()
    }
    assert got == _py_stats()


def test_stats_values_spotcheck(spark):
    got = {
        r["id"]: r
        for r in exact_substring_stats(_df(spark), "text", "doc_id", W).collect()
    }
    # doc 3 "r r r r": both windows duplicated, merged coverage = 4/4
    assert got[3]["n_dup_windows"] == 2
    assert got[3]["dup_tokens"] == 4
    assert got[3]["dup_ratio"] == 1.0
    # doc 4 is shorter than W: zero windows, zero dup
    assert got[4]["n_windows"] == 0 and got[4]["dup_tokens"] == 0
    # empty doc
    assert got[5]["n_tokens"] == 0 and got[5]["dup_ratio"] == 0.0


def test_scrub_matches_mirror(spark):
    got = {
        r["id"]: (r["text_scrubbed"], r["n_kept"], r["n_tokens"])
        for r in exact_substring_scrub(_df(spark), "text", "doc_id", W).collect()
    }
    assert got == _py_scrub()
    # the shared 3-gram is gone from BOTH docs (all-occurrences policy)
    assert got[1][0] == "delta epsilon"
    assert got[2][0] == "x y"
    assert got[3][0] == ""


def test_rolling_hash_positions_equal_slice_form(spark):
    """VERDICT r4 #5: the Karp-Rabin doubling-ladder window hashes
    (O(n log w)) must flag EXACTLY the positions the original
    md5(array_join(slice)) form (O(n·w)) flags — window hashes are
    pure functions of window content in both forms. Checked on the
    driver fixture and on a larger stride-1 fixture with W=50 (the
    production default, exercising the 32+16+2 ladder decomposition)."""
    from cocrawler_spark.operators.dedup import _window_positions

    def positions(df, w, impl):
        _, dup = _window_positions(df, "text", "doc_id", w, hash_impl=impl)
        return sorted(map(tuple, dup.collect()))

    df = _df(spark)
    assert positions(df, W, "rolling") == positions(df, W, "slice")

    # W=50 fixture: 3 docs sharing a 60-token run at different offsets,
    # plus unique prefixes/suffixes and a short doc
    shared = " ".join(f"tok{i % 7}x{i}" for i in range(60))
    rows = [
        (1, "aa bb " + shared + " cc"),
        (2, shared),
        (3, "zz " + shared + " " + " ".join(f"u{i}" for i in range(40))),
        (4, "too short"),
    ]
    big = spark.createDataFrame(rows, "doc_id long, text string")
    got = positions(big, 50, "rolling")
    assert got == positions(big, 50, "slice")
    assert got  # non-vacuous: the shared run produces dup windows


def test_stride_samples_positions(spark):
    """stride=s enumerates only starts with (p-1) % s == 0, in BOTH
    hash impls identically; sampled dup positions are a subset of the
    exact (stride-1) dup positions restricted to sampled starts
    (sampling can only lower a window's observed frequency)."""
    from cocrawler_spark.operators.dedup import _window_positions

    def positions(impl, s):
        _, dup = _window_positions(
            _df(spark), "text", "doc_id", W, hash_impl=impl, stride=s
        )
        return sorted(map(tuple, dup.collect()))

    exact = positions("slice", 1)
    s2 = positions("slice", 2)
    assert s2 == positions("rolling", 2)
    assert all((p - 1) % 2 == 0 for _, p in s2)
    assert set(s2) <= {(i, p) for i, p in exact if (p - 1) % 2 == 0}


def test_partition_invariance(spark):
    a = sorted(
        map(tuple, exact_substring_stats(_df(spark), "text", "doc_id", W).collect())
    )
    b = sorted(
        map(tuple, exact_substring_stats(_df(spark, 7), "text", "doc_id", W).collect())
    )
    assert a == b


URLS = [
    # group (digest 100, base a/p): id constant, sess present/absent
    ("http://a/p?id=1&sess=x", 100),
    ("http://a/p?id=1", 100),
    # group (digest 200, base a/q): sess two distinct values
    ("http://a/q?sess=y", 200),
    ("http://a/q?SESS=z", 200),  # key case-insensitive
    # singleton group: no evidence possible
    ("http://a/r?id=7", 300),
    # no-query URL contributes a group but no param rows
    ("http://a/s", 400),
]


def test_dust_param_rules(spark):
    df = spark.createDataFrame(URLS, "url string, digest long")
    got = {
        r["param"]: (r["evidence_groups"], r["groups_seen"], r["irrelevant"])
        for r in dust_param_rules(df, "url", "digest", min_support=2).collect()
    }
    # sess: absent-vs-present in group 100, two values in group 200
    assert got["sess"] == (2, 2, True)
    # id: same value in group 100, singleton group 300 — never evidence
    assert got["id"] == (0, 2, False)
    assert set(got) == {"sess", "id"}


def test_dust_repeated_key_not_evidence(spark):
    """ADVICE r4 (medium): within-URL key repetition is ONE state.

    A singleton URL carrying ?tag=a&tag=b (multi-value filter) must
    not count as irrelevance evidence — there is no cross-URL
    duplicate-content signal at all — and two URLs with IDENTICAL
    repeated value lists are one state seen twice, also no evidence.
    Only genuinely differing per-URL value lists count."""
    rows = [
        # two singleton groups, each one URL with a repeated key:
        # old pooled-distinct rule saw n_vals=2 twice -> irrelevant
        ("http://b/p?tag=a&tag=b", 500),
        ("http://b/q?tag=c&tag=d", 600),
        # one group, two URLs, identical repeated values -> one state
        ("http://b/r?m=1&m=1", 700),
        ("http://b/r?m=1&m=1&x=0", 700),
        # one group, two URLs, differing multisets -> evidence
        ("http://b/s?f=1&f=2", 800),
        ("http://b/s?f=1", 800),
        # separator hardening: a value CONTAINING chr(30) must not
        # collide with the two-value list ["x","y"] (the signature is
        # the sorted array, not a joined string)
        ("http://b/t?g=x\x1ey", 900),
        ("http://b/t?g=x&g=y", 900),
    ]
    df = spark.createDataFrame(rows, "url string, digest long")
    got = {
        r["param"]: (r["evidence_groups"], r["irrelevant"])
        for r in dust_param_rules(df, "url", "digest", min_support=2).collect()
    }
    assert got["tag"] == (0, False)
    assert got["m"] == (0, False)
    assert got["f"] == (1, False)  # real evidence, below support
    # x: present on one of two group members -> absence evidence
    assert got["x"] == (1, False)
    assert got["g"] == (1, False)  # chr(30)-in-value is NOT ["x","y"]


def test_dust_min_support(spark):
    df = spark.createDataFrame(URLS, "url string, digest long")
    got = {
        r["param"]: r["irrelevant"]
        for r in dust_param_rules(df, "url", "digest", min_support=3).collect()
    }
    assert got["sess"] is False  # 2 evidence groups < support 3


def test_apply_dust_rules(spark):
    from cocrawler_spark.functions.urls import apply_dust_rules

    df = spark.createDataFrame(URLS, "url string, digest long")
    rules = dust_param_rules(df, "url", "digest", min_support=2)
    got = {
        r["url"]: r["url_rewritten"]
        for r in apply_dust_rules(df, "url", rules).collect()
    }
    # sess stripped everywhere (incl. uppercase key), id kept, '?'
    # dropped when nothing survives
    assert got["http://a/p?id=1&sess=x"] == "http://a/p?id=1"
    assert got["http://a/q?sess=y"] == "http://a/q"
    assert got["http://a/q?SESS=z"] == "http://a/q"
    assert got["http://a/r?id=7"] == "http://a/r?id=7"
    assert got["http://a/s"] == "http://a/s"


def test_apply_dust_rules_no_rules(spark):
    """Empty rule set (nothing irrelevant) must be identity."""
    from cocrawler_spark.functions.urls import apply_dust_rules

    df = spark.createDataFrame(URLS[4:], "url string, digest long")
    rules = dust_param_rules(df, "url", "digest", min_support=2)
    got = apply_dust_rules(df, "url", rules).collect()
    assert all(r["url"] == r["url_rewritten"] for r in got)


def test_adaptive_crawl_delay(spark):
    from cocrawler_spark.operators.politeness import adaptive_crawl_delay

    log = spark.createDataFrame(
        [
            ("fast", 100, 200), ("fast", 200, 200),       # healthy: base
            ("slow", 4000, 200), ("slow", 4000, 200),     # 4s -> 8s spacing
            ("err", 100, 503), ("err", 100, 200),         # 50% errors
            ("dead", 30000, 503),                          # clamped at max
            # ADVICE r4: NULL latency (timeout) must not deflate the
            # mean — 4000ms over ONE observed latency, not over two
            ("tmo", None, 503), ("tmo", 4000, 200),
            # all fetches timed out: no load term, pure error backoff
            ("gone", None, 503), ("gone", None, 503),
        ],
        "host string, latency_ms int, status int",
    )
    got = {r["host"]: r for r in adaptive_crawl_delay(log).collect()}
    assert got["fast"]["next_delay"] == 1.0          # base wins over 0.3
    assert got["slow"]["next_delay"] == 8.0          # 2 x 4s load
    assert got["err"]["err_rate"] == 0.5
    assert got["err"]["next_delay"] == 3.0           # 1.0 * (1 + 4*0.5)
    assert got["dead"]["next_delay"] == 30.0         # max_delay clamp
    assert got["tmo"]["mean_latency_ms"] == 4000.0   # COUNT(lat)=1
    assert got["tmo"]["next_delay"] == 24.0          # 2*4s * (1+4*0.5)
    assert got["gone"]["mean_latency_ms"] is None
    assert got["gone"]["err_rate"] == 1.0
    assert got["gone"]["next_delay"] == 5.0          # base * (1+4*1)
