import pytest

from cocrawler_spark.functions.surt import host_from_surt, surt


@pytest.mark.parametrize(
    "url,expected",
    [
        ("http://example.com/", "com,example)/"),
        ("http://example.com/a/b?q=1", "com,example)/a/b?q=1"),
        ("https://example.com/a", "com,example)/a"),  # scheme dropped
        ("http://www.example.com/a", "com,example,www)/a"),  # www kept
        ("http://example.com:8080/a", "com,example:8080)/a"),
        ("http://example.com:80/a", "com,example)/a"),  # default port dropped
        ("http://sub.Example.COM/A", "com,example,sub)/A"),
    ],
)
def test_surt_golden(url, expected):
    assert surt(url) == expected


def test_surt_identity_for_scheme_and_fragment():
    assert surt("http://a.test/p#x") == surt("https://a.test/p")


def test_host_roundtrip():
    assert host_from_surt("com,example,sub)/a/b?q") == "sub.example.com"
    assert host_from_surt("com,example:8080)/a") == "example.com"
