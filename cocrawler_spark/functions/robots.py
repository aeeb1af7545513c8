"""robots.txt allow/deny matching with longest-prefix-wins semantics.

Reference analog: cocrawler/robots.py — Robots.check / fetch_robots†:
per-host parsed rules cached with a TTL, one in-flight fetch per host.
Engine-side, the cache is the `robots` state table (TTL measured in
waves) and per-host fetch dedup is structural — a distinct() on host
before joining the robots source (SURVEY.md §2a).

Matching rule (RFC 9309 / Google REP semantics): among all `allow`
and `disallow` rules that match the path, the MOST SPECIFIC (longest,
in octets, wildcards counted) wins; tie goes to allow; no match ⇒
allowed. Rules are path prefixes, with two special characters per
RFC 9309 §2.2.3: `*` matches any character sequence and a TRAILING
`$` anchors the rule to the end of the path (a `$` anywhere else is
a literal). Plain prefix rules take a fast startswith path; wildcard
rules compile once per distinct rule (robots rule sets are tiny and
shared by every URL of a host, so the cache hit rate is ~100%).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


@lru_cache(maxsize=8192)
def _rule_regex(rule: str) -> "re.Pattern":
    """Compile a wildcard robots rule to an anchored-at-start regex.
    `*` → `.*`; trailing `$` → end anchor; everything else literal."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    pat = ".*".join(re.escape(part) for part in body.split("*"))
    return re.compile(pat + ("$" if anchored else ""))


def _rule_matches(path: str, rule: str) -> bool:
    if "*" in rule or rule.endswith("$"):
        return _rule_regex(rule).match(path) is not None
    return path.startswith(rule)


def robots_allowed_py(
    path: str,
    allow: Optional[Iterable[str]],
    disallow: Optional[Iterable[str]],
) -> bool:
    best_len = -1
    best_allow = True
    # explicit None checks: Arrow hands array columns to the UDF as
    # numpy arrays, whose truth value (`x or []`) is ambiguous for >1
    # elements — iterate the container directly instead
    for rule in disallow if disallow is not None else ():
        if rule and len(rule) > best_len and _rule_matches(path, rule):
            best_len = len(rule)
            best_allow = False
    for rule in allow if allow is not None else ():
        if rule and len(rule) >= best_len and _rule_matches(path, rule):
            best_len = len(rule)
            best_allow = True
    return best_allow


def robots_allowed_udf():
    """pandas UDF (path, allow, disallow) -> bool.

    Rule arrays are tiny per row (a handful of prefixes), so a vectorized
    batch loop beats the explode→startswith→window SQL formulation, which
    would shuffle once per candidate URL (SURVEY.md §2b, chosen: UDF).
    """
    @F.pandas_udf(BooleanType())
    def allowed(path: pd.Series, allow: pd.Series, disallow: pd.Series) -> pd.Series:
        return pd.Series(
            [
                robots_allowed_py(p or "/", a, d)
                for p, a, d in zip(path.tolist(), allow.tolist(), disallow.tolist())
            ]
        )

    return allowed


def sitemap_urls_col(robots_txt: Column) -> Column:
    """Array of sitemap URLs declared in a robots.txt body
    (`Sitemap: <url>` lines, case-insensitive, per REP — they sit
    outside user-agent groups; trailing `# comments` tolerated, same
    as the text parser below). Pure JVM regexp_extract_all, so the
    robots→sitemap→seed fan-out is map-only; feed the result through
    sources.corpus.parse_sitemaps after fetching each URL."""
    return F.regexp_extract_all(
        robots_txt, F.lit(r"(?im)^\s*sitemap:\s*(\S+)\s*(?:#.*)?$"), F.lit(1)
    )


# ---------------------------------------------------------------------------
# robots.txt TEXT parsing (REP group selection)
# ---------------------------------------------------------------------------

def parse_robots_txt_py(
    txt: str, agent: str = "cocrawler"
) -> tuple[list, list, float]:
    """Parse a raw robots.txt body for ``agent``: returns
    (allow_prefixes, disallow_prefixes, crawl_delay_or_None).

    REP semantics (RFC 9309 / the original 1994 draft, simplified to
    the prefix-rule model FIXTURES.md §3 fixes for this engine):

    * Groups start at one or more ``User-agent:`` lines; rule lines
      (Allow/Disallow/Crawl-delay) bind to the most recent group.
    * Group selection: the group whose user-agent token is the LONGEST
      case-insensitive substring-match of ``agent`` wins; ``*`` is the
      fallback with specificity 0. Multiple groups with the same
      winning token merge (RFC 9309 §2.2.1).
    * ``Disallow:`` with an empty value means allow-everything and
      contributes no prefix. Comments (#) strip to end of line.
    * Wildcards (* $) inside paths are NOT interpreted — they pass
      through as literal prefix chars, matching the engine's
      longest-prefix matcher; a production deployment would plug a
      wildcard-aware matcher into robots_allowed_py.

    Pure function over one small string — wrap in parse_robots_txt_udf
    for the vectorized per-host parse (one robots body per host, so
    the batch size is |hosts|, never |urls|).
    """
    agent_l = (agent or "").lower()

    def _spec(tok: str) -> int:
        # empty tokens are malformed, not universal matches
        if not tok:
            return -1
        if tok == "*":
            return 0
        return len(tok) if tok in agent_l else -1

    groups: list[tuple[int, str, dict]] = []  # (specificity, token, rules)
    cur: Optional[dict] = None
    expecting_agents = False
    for raw in (txt or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            tok = value.lower()
            spec = _spec(tok)
            if not expecting_agents:
                cur = {"allow": [], "disallow": [], "delay": None}
                groups.append((spec, tok, cur))
                expecting_agents = True
            else:
                # additional UA line in the same group header: the group
                # matches via its BEST matching token
                if spec > groups[-1][0]:
                    groups[-1] = (spec, tok, cur)
        else:
            expecting_agents = False
            if cur is None:
                continue  # rule lines before any user-agent: ignored
            if field == "allow" and value:
                cur["allow"].append(value)
            elif field == "disallow":
                if value:
                    cur["disallow"].append(value)
            elif field == "crawl-delay":
                try:
                    cur["delay"] = float(value)
                except ValueError:
                    pass
    best = max((s for s, _, _ in groups), default=-1)
    if best < 0:
        return [], [], None
    # ONE group wins (RFC 9309 §2.2.1): among groups at the best
    # specificity, the winning TOKEN is the first one seen; only groups
    # sharing that exact token merge (repeated same-token groups).
    win_tok = next(t for s, t, _ in groups if s == best)
    allow: list = []
    disallow: list = []
    delay = None
    for s, t, g in groups:
        if s == best and t == win_tok:
            allow += g["allow"]
            disallow += g["disallow"]
            if delay is None:
                delay = g["delay"]
    return allow, disallow, delay


def parse_robots_txt_udf(agent: str = "cocrawler"):
    """Arrow-batched (txt) -> struct(allow, disallow, crawl_delay).

    One row per HOST (robots bodies are per-host), so this UDF runs on
    |hosts| rows — orders of magnitude below the URL stream; the
    output is exactly the structured robots_src schema the engine's
    broadcast robots join consumes."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("allow", ArrayType(StringType())),
            StructField("disallow", ArrayType(StringType())),
            StructField("crawl_delay", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def parse(txt: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_txt_py(t, agent) for t in txt.tolist()]
        return pd.DataFrame(
            {
                "allow": [r[0] for r in rows],
                "disallow": [r[1] for r in rows],
                "crawl_delay": [r[2] for r in rows],
            }
        )

    return parse
