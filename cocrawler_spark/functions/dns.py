"""DNS-adjacent gates: private/loopback address rejection.

Reference analog: cocrawler/dns.py† — resolve + cache, reject
private/localhost IPs per config. No network in the engine: the gate
operates on host literals (IPs or names); a `hosts` dimension table
join covers resolved addresses on a real cluster (SURVEY.md §2a).
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_BLOCKED_NAMES = {"localhost", "localhost.localdomain", "ip6-localhost"}


def is_private_host_py(host: str) -> bool:
    """True for RFC1918/loopback/link-local IP literals and localhost
    names — URLs the crawler must refuse to fetch."""
    if not host:
        return False
    h = host.strip("[]").lower()
    if h in _BLOCKED_NAMES or h.endswith(".localhost"):
        return True
    try:
        ip = ipaddress.ip_address(h)
    except ValueError:
        return False
    return (
        ip.is_private
        or ip.is_loopback
        or ip.is_link_local
        or ip.is_reserved
        or ip.is_multicast
    )


def is_private_host_udf():
    @F.pandas_udf(BooleanType())
    def gate(host: pd.Series) -> pd.Series:
        return pd.Series([is_private_host_py(h or "") for h in host.tolist()])

    return gate
