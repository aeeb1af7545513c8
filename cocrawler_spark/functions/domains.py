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
