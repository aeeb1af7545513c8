"""URL cleaning, canonicalization, and redirect classification.

Reference analogs (behavioral; SURVEY.md §0 citation convention):
  - cocrawler/urls.py — class URL† : parse + canonicalize (lowercase
    scheme/host, IDNA host, strip default port, drop fragment, resolve
    relative against base, normalize percent-encoding).
  - cocrawler/urls.py — clean_webpage_links† : strip whitespace, quotes
    and backslashes from scraped hrefs.
  - cocrawler/urls.py — special_redirect† : classify redirect pairs
    (same-surt / add-www / remove-www / http→https / combinations).

Two layers:
  1. Pure-Python core (`canonicalize_one`, `clean_link`,
     `special_redirect`) — shared with the oracle simulator and unit
     tests; its semantics are pinned by hand-written golden cases in
     tests/test_urls.py, independent of the engine.
  2. Arrow-vectorized binding (`canonicalize_udf`) — a pandas UDF
     operating per *batch* (input_hint mandates: no per-row Python at the
     Spark level). Inside the batch we loop in CPython over the pandas
     Series; that is the standard Arrow-batched pattern — the per-row
     work is a few string ops, the Spark-side boundary is vectorized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

from .surt import surt_from_parts

ALLOWED_SCHEMES = ("http", "https")
_DEFAULT_PORTS = {"http": "80", "https": "443"}

# characters that clean_webpage_links† strips from scraped hrefs
_STRIP_CHARS = " \t\r\n\"'\\"

# RFC 3986 unreserved characters — these are *decoded* during
# percent-encoding normalization; everything else is re-encoded uppercase.
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def clean_link(raw: str) -> str:
    """Strip whitespace/quote/backslash noise from a scraped href."""
    if raw is None:
        return ""
    s = raw.strip(_STRIP_CHARS)
    # internal newlines/tabs inside an href are scrape noise
    return s.replace("\n", "").replace("\r", "").replace("\t", "")


# Java-regex twins of _STRIP_CHARS for the JVM-side clean (kept next to
# clean_link so the two stay in sync; parity pinned in tests/test_urls.py).
_STRIP_CLASS_RE = "[ \\t\\r\\n\"'\\\\]"


def clean_link_col(c):
    """JVM-side equivalent of clean_link (whole-stage codegen, no UDF):
    strip _STRIP_CHARS runs at both ends, then drop internal \\n \\r \\t."""
    s = F.regexp_replace(
        c, f"^{_STRIP_CLASS_RE}+|{_STRIP_CLASS_RE}+$", ""
    )
    return F.regexp_replace(s, "[\\n\\r\\t]", "")


import re

_PCT_RE = re.compile("%([0-9a-fA-F]{2})")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:")

# Fast lane: the overwhelmingly common URL shape — absolute lowercase
# http(s), ASCII host without port/userinfo/trailing dot, path without
# '.', '%', '?' or '#' — canonicalizes to ITSELF (no IDNA, no
# pct-normalization, no dot segments, no port stripping, no query), so
# every canonical field falls out of one precompiled regex match plus
# string slicing, skipping urljoin/urlsplit/IDNA entirely (~20-100x per
# row). The check lives INSIDE canonicalize_one — not as a Spark-side
# split — because any DataFrame-level fast/slow branch (filter+union or
# per-field when()) multiplies the logical plan at every call site,
# and with several canonicalize sites per wave the added Catalyst
# analysis/optimization time dwarfs the Python saved (measured: +0.5 s
# PLANNING per call for the when()-masked variant; the engine re-plans
# each wave's tree ~10x). Identity of the fast lane is pinned by a
# hypothesis invariant + goldens in tests/test_urls.py.
_FAST_URL_RE = r"^(https?)://([a-z0-9-]+(?:\.[a-z0-9-]+)*)((?:/[a-zA-Z0-9_/-]*)?)$"
_FAST_RE = re.compile(_FAST_URL_RE)


def _normalize_pct(component: str) -> str:
    """Normalize percent-encoding: decode escapes of UNRESERVED chars
    (``%7E`` → ``~``), uppercase the hex of everything else (``%2f`` →
    ``%2F``). Reserved characters stay encoded — decoding them would
    change the URL's meaning (RFC 3986 §2.2)."""
    if not component or "%" not in component:
        return component

    def fix(m):
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(fix, component)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments, applied to the path string
    directly.  urljoin is deliberately NOT used here: a path beginning
    with ``//`` would be parsed as a network-path reference and the
    dot-segment collapse would silently be skipped (the r1 idempotence
    bug on ``http://a.a0//0/.``)."""
    inp = path
    out: list[str] = []
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1) if inp.startswith("/") else inp.find("/")
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def _idna_host(host: str) -> str:
    host = host.lower().rstrip(".")
    if not host:
        return host
    try:
        host.encode("ascii")
        return host
    except UnicodeEncodeError:
        pass
    try:
        return host.encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return host


@dataclass(frozen=True)
class CanonUrl:
    url: str
    scheme: str
    host: str
    path: str
    query: str
    surt: str

    @staticmethod
    def empty() -> "CanonUrl":
        return CanonUrl("", "", "", "", "", "")


def canonicalize_one(
    raw: str, base: Optional[str] = None, *, fast: bool = True
) -> CanonUrl:
    """Canonicalize one URL (optionally resolving relative to `base`).

    Returns CanonUrl.empty() for unusable inputs (no host, unsupported
    scheme for non-http(s) absolute URLs are still returned with their
    scheme so callers can filter — mirroring the reference, where the
    scheme gate lives in add_url†, not in URL parsing).

    `fast=False` disables the _FAST_RE short-circuit (parity tests only
    — results are identical by the pinned invariant).
    """
    s = clean_link(raw)
    if not s:
        return CanonUrl.empty()
    if fast:
        m = _FAST_RE.match(s)
        if m:
            # absolute URL ⇒ base resolution is a no-op (urljoin returns
            # the absolute URL unchanged for http/https)
            scheme, host = m.group(1), m.group(2)
            path = m.group(3) or "/"
            return CanonUrl(
                url=f"{scheme}://{host}{path}",
                scheme=scheme,
                host=host,
                path=path,
                query="",
                surt=",".join(host.split(".")[::-1]) + ")" + path,
            )
    if base:
        try:
            s = urljoin(base, s)
        except ValueError:
            return CanonUrl.empty()
    elif "://" not in s and not s.startswith("//"):
        # seed-style scheme defaulting (cocrawler/seeds.py†): prepend
        # http:// unless the prefix is a genuine non-http scheme like
        # mailto:/javascript: — a colon followed by digits is a port
        # ("example.com:8080/x"), not a scheme.
        m = _SCHEME_RE.match(s)
        if m and not s[m.end():][:1].isdigit():
            return CanonUrl.empty()
        s = "http://" + s
    try:
        parts = urlsplit(s)
    except ValueError:
        return CanonUrl.empty()
    scheme = parts.scheme.lower()
    host = _idna_host(parts.hostname or "")
    if not host:
        return CanonUrl.empty()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _normalize_pct(parts.path)
    if not path:
        path = "/"
    # dot-segment resolution per RFC 3986 §5.2.4; done on the string so
    # paths with empty segments ("//0/.") collapse correctly (urljoin
    # treats them as network-path references and skips the collapse).
    if "." in path:
        path = _remove_dot_segments(path) or "/"
    query = _normalize_pct(parts.query)
    url = f"{scheme}://{netloc}{path}"
    if query:
        url += "?" + query
    return CanonUrl(
        url=url,
        scheme=scheme,
        host=host,
        path=path,
        query=query,
        surt=surt_from_parts(host, port if netloc != host else None, path, query),
    )


# ---------------------------------------------------------------------------
# redirect classification (cocrawler/urls.py — special_redirect†)
# ---------------------------------------------------------------------------

def special_redirect(from_u: CanonUrl, to_u: CanonUrl) -> Optional[str]:
    """Classify a redirect pair; None means an ordinary redirect.

    Classes (mirroring the reference's vocabulary):
      'same surt'      — canonical identity unchanged (fragment/slash noise)
      'addw'           — host gained a leading www.
      'removew'        — host lost a leading www.
      'tohttps'        — scheme http→https, host unchanged
      'tohttp'         — scheme https→http, host unchanged
      'tohttps+addw' / 'tohttps+removew' / 'tohttp+addw' / 'tohttp+removew'
    """
    if not from_u.url or not to_u.url:
        return None
    scheme_part = ""
    if from_u.scheme == "http" and to_u.scheme == "https":
        scheme_part = "tohttps"
    elif from_u.scheme == "https" and to_u.scheme == "http":
        scheme_part = "tohttp"
    if from_u.surt == to_u.surt:
        # SURT drops the scheme, so an http↔https hop has equal surts;
        # the scheme class is the more specific verdict.
        return scheme_part or "same surt"
    addw = to_u.host == "www." + from_u.host
    removew = from_u.host == "www." + to_u.host
    same_rest = from_u.path == to_u.path and from_u.query == to_u.query
    if not same_rest:
        return None
    if addw:
        return f"{scheme_part}+addw" if scheme_part else "addw"
    if removew:
        return f"{scheme_part}+removew" if scheme_part else "removew"
    return None


def special_redirect_str(from_url: str, to_url: str) -> Optional[str]:
    return special_redirect(canonicalize_one(from_url), canonicalize_one(to_url))


# ---------------------------------------------------------------------------
# Arrow-vectorized Spark binding
# ---------------------------------------------------------------------------

CANON_STRUCT = StructType(
    [
        StructField("url", StringType()),
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("query", StringType()),
        StructField("surt", StringType()),
        StructField("domain", StringType()),
    ]
)

_CANON_FIELDS = ("url", "scheme", "host", "path", "query", "surt", "domain")


def _canon_batch(raw: pd.Series, base: pd.Series) -> pd.DataFrame:
    # registered_domain rides the same Arrow pass as canonicalization —
    # one extra suffix lookup per row instead of a second UDF stage
    from .domains import registered_domain_py

    out = {k: [] for k in _CANON_FIELDS}
    for r, b in zip(raw.tolist(), base.tolist()):
        c = canonicalize_one(r if r is not None else "", b or None)
        out["url"].append(c.url)
        out["scheme"].append(c.scheme)
        out["host"].append(c.host)
        out["path"].append(c.path)
        out["query"].append(c.query)
        out["surt"].append(c.surt)
        out["domain"].append(registered_domain_py(c.host) if c.host else "")
    return pd.DataFrame(out)


def canonicalize_udf():
    """pandas UDF (raw_url, base_url) -> struct(url,scheme,host,path,query,surt)."""
    @F.pandas_udf(CANON_STRUCT)
    def canon(raw: pd.Series, base: pd.Series) -> pd.DataFrame:
        return _canon_batch(raw, base)

    return canon


def with_canonical(df, raw_col: str, base_col=None, prefix: str = ""):
    """Attach canonical columns url/scheme/host/path/query/surt/domain.

    One Arrow round trip for the whole struct, then JVM-side field
    extraction — the struct is computed once (Catalyst CSE on the UDF
    call would not be guaranteed across multiple selects). The plan
    stays a single linear ArrowEvalPython node: the common-shape fast
    lane lives INSIDE canonicalize_one (see _FAST_RE), not in the plan
    — a DataFrame-level fast/slow split (filter+union, or per-field
    when() over a masked UDF) was measured to add ~0.5 s of Catalyst
    planning PER CALL and compounds across the engine's per-wave call
    sites into multi-minute wave overheads at any scale.
    """
    base = F.col(base_col) if base_col else F.lit(None).cast("string")
    tmp = "_canon_struct"
    df = df.withColumn(tmp, canonicalize_udf()(F.col(raw_col), base))
    for f in _CANON_FIELDS:
        df = df.withColumn(prefix + f, F.col(f"{tmp}.{f}"))
    return df.drop(tmp)


# ---------------------------------------------------------------------------
# tracking-parameter stripping (dedup-key canonicalization beyond RFC 3986)
# ---------------------------------------------------------------------------
# Tracking params (utm_* campaign tags, click ids) create unbounded URL
# aliasing for byte-identical content — the classic crawl-dedup leak
# RFC-level canonicalization cannot see. Pure JVM expressions (split →
# filter → rejoin; whole-stage codegen, zero Python) with an exact
# DuckDB twin. Key set: the ubiquitous cross-site params only; host-
# specific rules belong in config, not code.

TRACKING_PARAM_EXACT = (
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "yclid", "_ga",
)
_TRACKING_RE = "^utm_"


def _kept_params(query: Column) -> Column:
    key = lambda p: F.lower(F.substring_index(p, "=", 1))
    return F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~key(p).rlike(_TRACKING_RE)
        & ~key(p).isin(*TRACKING_PARAM_EXACT),
    )


def strip_tracking_params_cols(url: Column) -> dict[str, Column]:
    """{'url_stripped', 'dedup_key'}: the URL with tracking params
    removed (original param order kept — order can matter server-side)
    and the dedup KEY with surviving params additionally sorted
    (param-order-insensitive aliasing collapses too). Splits on the
    FIRST '?'; no-query and all-params-stripped URLs lose the '?'.
    """
    pos = F.instr(url, "?")
    base = F.when(pos > 0, F.substring(url, F.lit(1), pos - 1)).otherwise(url)
    query = F.when(
        pos > 0, F.substring(url, pos + 1, F.length(url))
    ).otherwise(F.lit(""))
    kept = _kept_params(query)

    def _join(params: Column) -> Column:
        return F.when(
            F.size(params) > 0,
            F.concat(base, F.lit("?"), F.array_join(params, "&")),
        ).otherwise(base)

    return {
        "url_stripped": _join(kept),
        "dedup_key": _join(F.array_sort(kept)),
    }


def strip_tracking_params_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of strip_tracking_params_cols (same key set, same
    first-'?' split, same empty-drop / sort semantics)."""
    exact = ", ".join(f"'{k}'" for k in TRACKING_PARAM_EXACT)
    kept = (
        "list_filter(string_split("
        f"CASE WHEN instr({expr}, '?') > 0 "
        f"THEN substr({expr}, instr({expr}, '?') + 1) ELSE '' END, '&'), "
        "p -> p <> '' AND NOT regexp_matches(lower(split_part(p, '=', 1)), "
        f"'{_TRACKING_RE}') AND lower(split_part(p, '=', 1)) NOT IN ({exact}))"
    )
    base = (
        f"CASE WHEN instr({expr}, '?') > 0 "
        f"THEN substr({expr}, 1, instr({expr}, '?') - 1) ELSE {expr} END"
    )

    def join(params: str) -> str:
        return (
            f"CASE WHEN len({params}) > 0 "
            f"THEN {base} || '?' || array_to_string({params}, '&') "
            f"ELSE {base} END"
        )

    return {
        "url_stripped": join(kept),
        "dedup_key": join(f"list_sort({kept})"),
    }


# ---------------------------------------------------------------------------
# URL path templating — crawler-trap detection
# ---------------------------------------------------------------------------

def url_template_cols(url: Column) -> dict[str, Column]:
    """Path-template mining for crawler-trap detection: collapse every
    digit run in the URL path to ``{d}`` so calendar pages, session
    ids, and paginated infinite spaces collapse to ONE template whose
    URL count explodes while its static siblings stay small. Returns
    (host, template). Frontier policy then caps or deprioritizes
    templates whose count per host crosses a budget — the classic
    defense against /cal/2024/1/1-style infinite spaces. Pure map."""
    no_scheme = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_extract(no_scheme, r"^([^/]+)", 1)
    path = F.regexp_replace(no_scheme, r"^[^/]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    template = F.regexp_replace(path, "[0-9]+", "{d}")
    return {"host": host, "template": template, "path": path}


def url_template_sql(url_expr: str) -> dict[str, str]:
    """DuckDB twins of url_template_cols."""
    no_scheme = f"regexp_replace({url_expr}, '^[a-z][a-z0-9+.-]*://', '')"
    host = f"regexp_extract({no_scheme}, '^([^/]+)', 1)"
    path = f"CASE WHEN regexp_replace({no_scheme}, '^[^/]*', '') = '' THEN '/' ELSE regexp_replace({no_scheme}, '^[^/]*', '') END"
    return {
        "host": host,
        "template": f"regexp_replace({path}, '[0-9]+', '{{d}}', 'g')",
        "path": path,
    }


# ---------------------------------------------------------------------------
# DUST — parameter-irrelevance rule mining from duplicate content
# ---------------------------------------------------------------------------
# "Do Not Crawl in the DUST: Different URLs with Similar Text"
# (Bar-Yossef, Keidar, Schonfeld — WWW'07). The observable signal: two
# URLs that fetched IDENTICAL content (same payload digest) but differ
# in a query parameter's state are evidence that the parameter does not
# affect content; a parameter with such evidence across enough distinct
# content groups yields a rewrite rule ("strip p before enqueuing"),
# shrinking the frontier before any fetch. This generalizes the STATIC
# tracking-param list above: the list is prior knowledge, DUST rules
# are mined from the crawl's own (url, digest) pairs.


def url_query_params_col(url: Column) -> Column:
    """url -> array<struct<k,v>> of query parameters: split on the
    FIRST '?', then '&'; keys lowercased; a param without '=' gets
    v=''. Empty fragments dropped. Pure JVM."""
    pos = F.instr(url, "?")
    query = F.when(pos > 0, F.substring(url, pos + 1, F.length(url))).otherwise(
        F.lit("")
    )
    return F.transform(
        F.filter(F.split(query, "&"), lambda p: p != ""),
        lambda p: F.struct(
            F.lower(F.substring_index(p, "=", 1)).alias("k"),
            F.when(
                F.instr(p, "=") > 0,
                F.substring(p, F.instr(p, "=") + 1, F.length(p)),
            ).otherwise(F.lit(""))
            .alias("v"),
        ),
    )


def url_query_params_sql(expr: str) -> str:
    """DuckDB twin of url_query_params_col (same first-'?' split,
    lowercased keys, ''-valued bare params)."""
    q = (
        f"CASE WHEN instr({expr}, '?') > 0 "
        f"THEN substr({expr}, instr({expr}, '?') + 1) ELSE '' END"
    )
    return (
        f"list_transform(list_filter(string_split({q}, '&'), p -> p <> ''), "
        "p -> {k: lower(split_part(p, '=', 1)), "
        "v: CASE WHEN instr(p, '=') > 0 THEN substr(p, instr(p, '=') + 1) "
        "ELSE '' END})"
    )


def dust_param_rules(
    df,
    url_col: str,
    digest_col: str,
    min_support: int = 2,
):
    """Mine DUST parameter-irrelevance rules from (url, content-digest)
    pairs. A *group* is (digest, url-without-query): URLs that carry
    the same payload and the same base. Within a group, parameter k
    shows irrelevance evidence iff >= 2 DISTINCT URLs carry different
    canonical value lists for k (the per-URL sorted multiset of k's
    values, so a single URL repeating a key — ?tag=a&tag=b — is ONE
    state, never evidence by itself) OR k is present on some member
    and absent on another — either way the crawler fetched
    byte-identical content across k's states. Output: one row per
    parameter key, (param, evidence_groups, groups_seen, irrelevant)
    with ``irrelevant = evidence_groups >= min_support``.

    Plan at 10^10 URLs: param explode → groupBy(digest, base, k, url)
    value-signature collapse → groupBy(digest, base, k) countDistinct —
    hash shuffles on uniform composite keys with map-side combine —
    plus one groupBy(digest, base) for group sizes
    and an equi-join between the two (both sides already partitioned
    by the group key), then a |params|-cardinality final groupBy. No
    pair enumeration: the quadratic "compare all URL pairs in a dup
    group" of the naive formulation collapses into per-group distinct
    counts, which is what makes this run at crawl scale.
    """
    pos = F.instr(F.col(url_col), "?")
    base = F.when(
        pos > 0, F.substring(F.col(url_col), F.lit(1), pos - 1)
    ).otherwise(F.col(url_col))
    u = df.select(
        F.col(digest_col).alias("digest"),
        base.alias("base"),
        F.col(url_col).alias("url"),
        url_query_params_col(F.col(url_col)).alias("_ps"),
    )
    groups = u.groupBy("digest", "base").agg(
        F.countDistinct("url").alias("n_urls")
    )
    pk = u.select(
        "digest", "base", "url", F.explode("_ps").alias("p")
    ).select(
        "digest", "base", "url",
        F.col("p.k").alias("param"), F.col("p.v").alias("val"),
    )
    # canonical per-URL value signature: sorted multiset of k's values
    # on that URL, so within-URL repetition can never read as
    # cross-URL variation (each URL contributes exactly one state).
    # The signature is the sorted ARRAY itself — a joined string would
    # collide a value containing the separator byte with a genuine
    # multi-value list; arrays are groupable/distinct-countable in
    # both engines.
    per_url = pk.groupBy("digest", "base", "param", "url").agg(
        F.sort_array(F.collect_list("val")).alias("_vsig")
    )
    per_group = per_url.groupBy("digest", "base", "param").agg(
        F.countDistinct("_vsig").alias("n_sigs"),
        F.count("*").alias("n_with"),
    )
    ev = per_group.join(groups, ["digest", "base"]).select(
        "param",
        (
            (F.col("n_sigs") >= 2)
            | ((F.col("n_with") < F.col("n_urls")) & (F.col("n_with") >= 1))
        ).cast("long").alias("_ev"),
    )
    return ev.groupBy("param").agg(
        F.sum("_ev").alias("evidence_groups"),
        F.count("*").alias("groups_seen"),
    ).select(
        "param", "evidence_groups", "groups_seen",
        (F.col("evidence_groups") >= int(min_support)).alias("irrelevant"),
    )


def dust_param_rules_sql(
    url_expr: str,
    digest_expr: str,
    from_clause: str,
    min_support: int = 2,
) -> str:
    """DuckDB twin of dust_param_rules — a full SELECT over
    ``from_clause`` (e.g. a fabricated-URL CTE)."""
    q = url_query_params_sql("url")
    return f"""
WITH u AS (
  SELECT {digest_expr} AS digest,
         CASE WHEN instr({url_expr}, '?') > 0
              THEN substr({url_expr}, 1, instr({url_expr}, '?') - 1)
              ELSE {url_expr} END AS base,
         {url_expr} AS url
  FROM {from_clause}),
g AS (SELECT digest, base, COUNT(DISTINCT url) AS n_urls
      FROM u GROUP BY digest, base),
pk AS (SELECT digest, base, url, p.k AS param, p.v AS val
       FROM (SELECT digest, base, url, unnest({q}) AS p FROM u)),
pu AS (SELECT digest, base, param, url,
              list_sort(list(val)) AS vsig
       FROM pk GROUP BY digest, base, param, url),
pg AS (SELECT digest, base, param,
              COUNT(DISTINCT vsig) AS n_sigs, COUNT(*) AS n_with
       FROM pu GROUP BY digest, base, param),
ev AS (SELECT param,
              CAST(n_sigs >= 2 OR (n_with < n_urls AND n_with >= 1) AS BIGINT)
                AS _ev
       FROM pg JOIN g USING (digest, base))
SELECT param, CAST(SUM(_ev) AS BIGINT) AS evidence_groups,
       COUNT(*) AS groups_seen,
       SUM(_ev) >= {int(min_support)} AS irrelevant
FROM ev GROUP BY param"""


def apply_dust_rules(
    df,
    url_col: str,
    rules,
):
    """Apply mined DUST rules: strip every parameter the miner flagged
    ``irrelevant`` from each URL, preserving the surviving params'
    original order (dropping '?' when none survive — same join
    convention as strip_tracking_params_cols). ``rules`` is
    dust_param_rules' output (only rows with irrelevant=true are
    used). Returns (url, url_rewritten).

    The rule set is tiny by construction (distinct param KEYS, not
    URLs), so it travels as a one-row broadcast array built by a
    |rules|-row aggregate — no per-row Python, no driver collect; the
    per-URL work is one array filter. At 10^10 URLs this is a map-only
    stage: mine once per crawl epoch, apply at canonicalization speed
    in the candidate chain."""
    irr = rules.filter(F.col("irrelevant")).agg(
        F.coalesce(
            F.collect_list("param"), F.array().cast("array<string>")
        ).alias("_irr")
    )
    pos = F.instr(F.col(url_col), "?")
    base = F.when(
        pos > 0, F.substring(F.col(url_col), F.lit(1), pos - 1)
    ).otherwise(F.col(url_col))
    query = F.when(
        pos > 0, F.substring(F.col(url_col), pos + 1, F.length(F.col(url_col)))
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.filter(F.split(query, "&"), lambda p: p != ""),
        lambda p: ~F.array_contains(
            F.col("_irr"), F.lower(F.substring_index(p, "=", 1))
        ),
    )
    rewritten = F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)
    return (
        df.crossJoin(F.broadcast(irr))
        .select(F.col(url_col).alias("url"), rewritten.alias("url_rewritten"))
    )


def apply_dust_rules_sql(
    url_expr: str,
    from_clause: str,
    rules_select: str,
) -> str:
    """DuckDB twin of apply_dust_rules: ``rules_select`` is a full
    SELECT producing (param, ..., irrelevant) — e.g. the
    dust_param_rules_sql query."""
    kept = (
        "list_filter(list_filter(string_split("
        f"CASE WHEN instr(url, '?') > 0 "
        "THEN substr(url, instr(url, '?') + 1) ELSE '' END, '&'), "
        "p -> p <> ''), "
        "p -> NOT list_contains(_irr, lower(split_part(p, '=', 1))))"
    )
    base = (
        "CASE WHEN instr(url, '?') > 0 "
        "THEN substr(url, 1, instr(url, '?') - 1) ELSE url END"
    )
    return f"""
WITH rules AS ({rules_select}),
irr AS (SELECT COALESCE(list(param), CAST([] AS VARCHAR[])) AS _irr
        FROM rules WHERE irrelevant),
uu AS (SELECT {url_expr} AS url FROM {from_clause}),
x AS (SELECT url, {kept} AS kept FROM uu CROSS JOIN irr)
SELECT url,
       CASE WHEN len(kept) > 0
            THEN {base} || '?' || array_to_string(kept, '&')
            ELSE {base} END AS url_rewritten
FROM x"""
