"""SURT — Sort-friendly URI Reordering Transform.

Reference analog: cocrawler/surt.py — surt()† (SURVEY.md §2c). The SURT
string is the crawl's identity key: the seen-set member, the dedup key,
and the final tiebreaker in the priority sort key.

Form: ``com,example)/path?query`` — scheme dropped, host labels reversed
and comma-joined, non-default port kept as ``:port`` before ``)``.
``www.`` is NOT stripped: add-www / remove-www redirect classification
(urls.special_redirect) relies on the surts differing.
"""

from __future__ import annotations

from typing import Optional


def surt_from_parts(host: str, port: Optional[int], path: str, query: str) -> str:
    if not host:
        return ""
    rev = ",".join(reversed(host.split(".")))
    if port is not None:
        rev += f":{port}"
    s = rev + ")" + (path or "/")
    if query:
        s += "?" + query
    return s


def surt(url: str) -> str:
    """Convenience: canonicalize then SURT (pure Python path)."""
    from .urls import canonicalize_one

    return canonicalize_one(url).surt


def host_from_surt(s: str) -> str:
    """Recover the forward host from a surt (engine-side convenience)."""
    head = s.split(")", 1)[0]
    head = head.split(":", 1)[0]
    return ".".join(reversed(head.split(",")))
