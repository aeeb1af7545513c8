import pytest

from cocrawler_spark.functions.dns import is_private_host_py
from cocrawler_spark.functions.domains import registered_domain_py
from cocrawler_spark.functions.useragent import ROBOTS_TOKEN, user_agent


@pytest.mark.parametrize(
    "host,expected",
    [
        ("10.0.0.1", True),
        ("192.168.1.5", True),
        ("172.16.0.9", True),
        ("172.32.0.9", False),  # outside 172.16/12
        ("127.0.0.1", True),
        ("169.254.0.1", True),
        ("::1", True),
        ("8.8.8.8", False),
        ("localhost", True),
        ("dev.localhost", True),
        ("example.com", False),
        ("", False),
    ],
)
def test_private_host(host, expected):
    assert is_private_host_py(host) is expected


@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("h0.test", "h0.test"),
        ("sub.h0.test", "h0.test"),
        ("single", "single"),
        ("deep.sub.domain.org", "domain.org"),
        ("foo.unknowntld", "foo.unknowntld"),
    ],
)
def test_registered_domain(host, expected):
    assert registered_domain_py(host) == expected


def test_user_agent():
    ua = user_agent()
    assert ROBOTS_TOKEN in ua and ua.startswith("Mozilla/5.0")


def test_udf_parity(spark):
    from pyspark.sql import functions as F

    from cocrawler_spark.functions.dns import is_private_host_udf
    from cocrawler_spark.functions.domains import registered_domain_udf

    hosts = ["10.0.0.1", "example.com", "www.a.co.uk", "localhost", "h0.test"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"]).select(
        "host",
        is_private_host_udf()(F.col("host")).alias("priv"),
        registered_domain_udf()(F.col("host")).alias("rd"),
    )
    for r in df.collect():
        assert r["priv"] == is_private_host_py(r["host"])
        assert r["rd"] == registered_domain_py(r["host"])


def test_fake_dns_parity(spark):
    """JVM fake-resolver + private gate == Python twin (the simulator
    uses the Python side; the engine uses the JVM side)."""
    from pyspark.sql import functions as F

    from cocrawler_spark.functions.dns import (
        fake_dns_ip_col,
        fake_dns_ip_py,
        resolved_private_host_col,
        resolved_private_py,
    )

    hosts = [f"h{i}.test" for i in range(200)] + ["example.com", "a.b.co.uk"]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"]).select(
        "host",
        fake_dns_ip_col(F.col("host")).alias("ip"),
        resolved_private_host_col(F.col("host")).alias("priv"),
    )
    rows = df.collect()
    assert len(rows) == len(hosts)
    n_priv = 0
    for r in rows:
        assert r["ip"] == fake_dns_ip_py(r["host"])
        assert r["priv"] == resolved_private_py(r["ip"])
        n_priv += int(r["priv"])
    # the gate must have real work: some hosts do resolve private
    some_priv = any(
        resolved_private_py(fake_dns_ip_py(f"h{i}.test")) for i in range(2000)
    )
    assert some_priv


def test_host_skew_stats_uniform_and_skewed(spark):
    """HHI = 1/n_hosts exactly on a uniform spread; a dominant host
    drives top1_share and hhi up; integer-exact aggregation means the
    values are closed-form checkable."""
    from cocrawler_spark.operators.politeness import host_skew_stats

    uniform = [("w", f"h{i % 5}") for i in range(25)]          # 5 hosts x 5
    skewed = [("s", "hot")] * 16 + [("s", f"c{i}") for i in range(4)]
    df = spark.createDataFrame(uniform + skewed, "grp string, host string")
    rows = {r["grp"]: r for r in host_skew_stats(df, "host", "grp").collect()}
    u, s = rows["w"], rows["s"]
    assert u["n_hosts"] == 5 and u["total"] == 25
    assert abs(u["hhi"] - 0.2) < 1e-9 and abs(u["top1_share"] - 0.2) < 1e-9
    assert abs(u["topk_share"] - 1.0) < 1e-9
    assert s["n_hosts"] == 5 and s["total"] == 20
    # hhi = (16^2 + 4*1)/20^2 = 260/400 = 0.65; top1 = 16/20
    assert abs(s["hhi"] - 0.65) < 1e-9
    assert abs(s["top1_share"] - 0.8) < 1e-9
