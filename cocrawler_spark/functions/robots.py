"""robots.txt allow/deny matching with longest-prefix-wins semantics.

Reference analog: cocrawler/robots.py — Robots.check / fetch_robots†:
per-host parsed rules cached with a TTL, one in-flight fetch per host.
Engine-side, the cache is the `robots` state table (TTL measured in
waves) and per-host fetch dedup is structural — a distinct() on host
before joining the robots source (SURVEY.md §2a).

Matching rule (Google REP semantics, simplified to prefix rules as in
FIXTURES.md §3): among all `allow` and `disallow` prefixes that match
the path, the LONGEST match wins; tie goes to allow; no match ⇒ allowed.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


def robots_allowed_py(
    path: str,
    allow: Optional[Iterable[str]],
    disallow: Optional[Iterable[str]],
) -> bool:
    best_len = -1
    best_allow = True
    for rule in disallow or []:
        if rule and path.startswith(rule) and len(rule) > best_len:
            best_len = len(rule)
            best_allow = False
    for rule in allow or []:
        if rule and path.startswith(rule) and len(rule) >= best_len:
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
    outside user-agent groups). Pure JVM regexp_extract_all, so the
    robots→sitemap→seed fan-out is map-only; feed the result through
    sources.corpus.parse_sitemaps after fetching each URL."""
    return F.regexp_extract_all(
        robots_txt, F.lit(r"(?im)^\s*sitemap:\s*(\S+)\s*$"), F.lit(1)
    )
