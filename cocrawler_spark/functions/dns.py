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


# ---------------------------------------------------------------------------
# deterministic stand-in resolver + resolved-IP gate (no network in the
# sandbox; cocrawler/dns.py† resolves, caches, and rejects private IPs).
# md5-derived octets so Spark (JVM), the oracle simulator (Python), and
# the DuckDB correctness twin compute the identical address.
# ---------------------------------------------------------------------------


def fake_dns_ip_py(host: str) -> str:
    """Deterministic fake A-record: octets from md5(host).
    a∈[1,223] (no 0/loopback-only/multicast ranges by construction is
    NOT guaranteed — 10/127/172.16-31/192.168 remain reachable on
    purpose, so the resolved-private gate has real work to do)."""
    import hashlib

    h = hashlib.md5((host or "").encode()).digest()
    return f"{1 + h[0] % 223}.{h[1]}.{h[2]}.{1 + h[3] % 254}"


def _md5_byte_col(hx, i: int):
    return F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("int")


def fake_dns_ip_col(host):
    """JVM twin of fake_dns_ip_py (whole-stage codegen, no Python)."""
    hx = F.md5(host)
    a = (_md5_byte_col(hx, 0) % 223 + 1).cast("string")
    b = _md5_byte_col(hx, 1).cast("string")
    c = _md5_byte_col(hx, 2).cast("string")
    d = (_md5_byte_col(hx, 3) % 254 + 1).cast("string")
    return F.concat_ws(".", a, b, c, d)


def resolved_private_py(ip: str) -> bool:
    """RFC1918 / loopback check on a dotted-quad string."""
    a, b, _, _ = (int(x) for x in ip.split("."))
    return a in (10, 127) or (a == 172 and 16 <= b <= 31) or (a == 192 and b == 168)


def resolved_private_host_col(host):
    """True when the fake-resolved address of `host` is private — the
    DNS-stage gate as one codegen'd expression (no ip-string roundtrip)."""
    hx = F.md5(host)
    a = _md5_byte_col(hx, 0) % 223 + 1
    b = _md5_byte_col(hx, 1)
    return (
        a.isin(10, 127)
        | ((a == 172) & b.between(16, 31))
        | ((a == 192) & (b == 168))
    )


def fake_dns_ip_sql(expr: str) -> str:
    """DuckDB twin of fake_dns_ip_col."""

    def byte(i: int) -> str:
        return f"CAST(('0x' || substr(md5({expr}), {2 * i + 1}, 2)) AS INT)"

    return (
        f"CAST(1 + {byte(0)} % 223 AS VARCHAR) || '.' || "
        f"CAST({byte(1)} AS VARCHAR) || '.' || "
        f"CAST({byte(2)} AS VARCHAR) || '.' || "
        f"CAST(1 + {byte(3)} % 254 AS VARCHAR)"
    )


def resolved_private_host_sql(expr: str) -> str:
    """DuckDB twin of resolved_private_host_col."""
    b0 = f"CAST(('0x' || substr(md5({expr}), 1, 2)) AS INT)"
    b1 = f"CAST(('0x' || substr(md5({expr}), 3, 2)) AS INT)"
    return (
        f"((1 + {b0} % 223) IN (10, 127)"
        f" OR ((1 + {b0} % 223) = 172 AND {b1} BETWEEN 16 AND 31)"
        f" OR ((1 + {b0} % 223) = 192 AND {b1} = 168))"
    )
