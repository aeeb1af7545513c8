"""Registered-domain (eTLD+1) extraction with a bundled suffix table.

Reference analog: cocrawler/urls.py — get_domain† via tldextract's
public-suffix list. No network here, so a compact embedded suffix set
covers the common cases plus the synthetic `.test` TLD; the seam for a
full PSL is `SUFFIXES` (swap in the real list on a cluster).

Longest-matching suffix wins: for host a.b.co.uk with suffixes
{uk, co.uk} → registered domain b.co.uk.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

SUFFIXES = {
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "ai", "dev", "app", "co", "me", "tv", "us", "uk", "de", "fr",
    "jp", "cn", "ru", "br", "in", "au", "ca", "nl", "test", "example",
    "invalid", "local",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.nz",
}


def registered_domain_py(host: str) -> str:
    if not host:
        return ""
    labels = host.lower().rstrip(".").split(".")
    if len(labels) < 2:
        return host.lower()
    best = 0
    for k in (2, 1):
        if len(labels) > k and ".".join(labels[-k:]) in SUFFIXES:
            best = k
            break
    if best == 0:
        # unknown suffix → treat last label as the TLD
        best = 1
    take = min(len(labels), best + 1)
    return ".".join(labels[-take:])


def registered_domain_udf():
    @F.pandas_udf(StringType())
    def rd(host: pd.Series) -> pd.Series:
        return pd.Series([registered_domain_py(h or "") for h in host.tolist()])

    return rd


def registered_domain_col(host):
    """Pure-JVM twin of registered_domain_py (whole-stage codegen, no
    Arrow) — lets hot paths recompute the domain AFTER a shuffle
    instead of carrying it through (the canonicalize UDF's `domain`
    field equals registered_domain_py(host) by construction, so a
    post-dedup recompute is value-identical; parity pinned in
    tests/test_urls.py)."""
    h = F.lower(host)
    stripped = F.regexp_replace(h, "\\.+$", "")
    ls = F.split(stripped, "\\.")
    n = F.size(ls)
    two = sorted(s for s in SUFFIXES if "." in s)
    one = sorted(s for s in SUFFIXES if "." not in s)
    suf2 = F.array_join(F.slice(ls, -2, F.lit(2)), ".")
    suf1 = F.element_at(ls, -1)
    best = F.when((n > 2) & suf2.isin(two), F.lit(2)).otherwise(F.lit(1))
    # the k=1 probe and the unknown-suffix fallback both yield best=1;
    # isin(one) is kept out of the plan entirely (dead branch)
    _ = (one, suf1)
    take = F.least(n, best + 1)
    dom = F.array_join(F.slice(ls, -take, take), ".")
    return (
        F.when(h.isNull() | (h == ""), F.lit(""))
        .when(n < 2, h)
        .otherwise(dom)
    )
