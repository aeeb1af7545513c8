"""Golden tests for URL canonicalization / cleaning / redirect classes.

These mirror the *case families* of the reference's tests/test_urls.py†
(fragment strip, default port, IDNA, %-encoding, relative resolution,
www/scheme redirect classification) with hand-written expected values,
so the semantics are pinned independently of the engine/oracle shared
code (SURVEY.md §5.2(1)).
"""

import pytest

from cocrawler_spark.functions.urls import (
    canonicalize_one,
    clean_link,
    special_redirect_str,
)


@pytest.mark.parametrize(
    "raw,expected_url",
    [
        ("http://Example.COM/", "http://example.com/"),
        ("HTTP://example.com", "http://example.com/"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("http://example.com/a#frag", "http://example.com/a"),
        ("http://example.com/a?x=1#frag", "http://example.com/a?x=1"),
        ("example.com/path", "http://example.com/path"),  # seed scheme default
        ("http://example.com/a/./b/../c", "http://example.com/a/c"),
        ("http://example.com/%7euser", "http://example.com/~user"),
        ("http://example.com/%7Euser", "http://example.com/~user"),
        ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
        ("  http://example.com/a  ", "http://example.com/a"),
        ('"http://example.com/a"', "http://example.com/a"),
        ("http://bücher.example/", "http://xn--bcher-kva.example/"),
        ("http://example.com./a", "http://example.com/a"),
        # empty path segments (//) must survive, and dot segments must
        # still collapse around them (RFC 3986 §5.2.4; r1 idempotence bug)
        ("http://a.a0//0/.", "http://a.a0//0/"),
        ("http://h.test//a//b/../c", "http://h.test//a//c"),
        ("http://h.test//./x", "http://h.test//x"),
        ("http://h.test/a/../../x", "http://h.test/x"),
        ("http://h.test/..", "http://h.test/"),
        ("http://h.test/a/..", "http://h.test/"),
    ],
)
def test_canonicalize_golden(raw, expected_url):
    assert canonicalize_one(raw).url == expected_url


@pytest.mark.parametrize(
    "base,rel,expected",
    [
        ("http://h.test/p/1", "/p/2", "http://h.test/p/2"),
        ("http://h.test/a/b/c", "../x", "http://h.test/a/x"),
        ("http://h.test/a/b/c", "d", "http://h.test/a/b/d"),
        ("http://h.test/p/1", "//other.test/q", "http://other.test/q"),
        ("http://h.test/p/1", "https://other.test/q", "https://other.test/q"),
        ("http://h.test/p/1", "?x=2", "http://h.test/p/1?x=2"),
    ],
)
def test_relative_resolution(base, rel, expected):
    assert canonicalize_one(rel, base=base).url == expected


def test_unusable_inputs():
    assert canonicalize_one("").url == ""
    assert canonicalize_one("   ").url == ""
    assert canonicalize_one("http://").url == ""
    # non-http schemes are parsed, gated later (reference gates in add_url†)
    c = canonicalize_one("ftp://example.com/file")
    assert c.scheme == "ftp"
    c = canonicalize_one("mailto:x@example.com")
    assert c.url == ""  # no host


def test_clean_link():
    assert clean_link(' \t"http://a.test/x"\n') == "http://a.test/x"
    assert clean_link("http://a.test/x\\") == "http://a.test/x"
    assert clean_link(None) == ""


def test_idempotence_samples():
    for raw in [
        "http://Example.COM:80/a/../b?q=%7e#f",
        "h0.test/p/1",
        "http://bücher.example/ä",
    ]:
        once = canonicalize_one(raw).url
        assert canonicalize_one(once).url == once


@pytest.mark.parametrize(
    "from_url,to_url,expected",
    [
        ("http://a.test/p", "http://a.test/p#x", "same surt"),
        ("http://a.test:80/p", "http://a.test/p", "same surt"),
        ("http://a.test/p", "http://www.a.test/p", "addw"),
        ("http://www.a.test/p", "http://a.test/p", "removew"),
        ("http://a.test/p", "https://a.test/p", "tohttps"),
        ("https://a.test/p", "http://a.test/p", "tohttp"),
        ("http://a.test/p", "https://www.a.test/p", "tohttps+addw"),
        ("http://www.a.test/p", "https://a.test/p", "tohttps+removew"),
        ("http://a.test/p", "http://b.test/q", None),
        ("http://a.test/p", "http://a.test/other", None),
    ],
)
def test_special_redirect(from_url, to_url, expected):
    assert special_redirect_str(from_url, to_url) == expected


def test_canonicalize_fast_lane_parity():
    """canonicalize_one's _FAST_RE short-circuit must equal the full
    canonicalizer (fast=False) on every input — including rows that sit
    just OUTSIDE the fast shape (uppercase, ports, dots, %-escapes,
    queries, fragments, IDNA, relative links), which must fall through
    bit-identically."""
    from cocrawler_spark.functions.urls import canonicalize_one

    raws = [
        # fast shape
        "http://h3.test/p/7",
        "https://www.h0.test/a/b-c_d/",
        "http://x1999.test/",
        "http://localhost/x",
        "http://a.co.uk/path",
        "http://deep.a.b.co.uk/p",
        "  http://h1.test/p/1  ",          # strip noise, then fast
        "http://h1.test//0/x",             # empty segment, no dots: fast
        # long tail (slow path)
        "HTTP://H3.TEST/p/7",
        "http://h3.test:80/p/7",
        "http://h3.test:8080/p/7",
        "http://h3.test/p/7?b=2&a=1",
        "http://h3.test/p/./7",
        "http://h3.test/p/%7e/7",
        "http://h3.test/p/7#frag",
        "http://bücher.test/p",
        "/rel/path",
        "page.html",
        "mailto:x@y.test",
        "",
    ]
    base = "http://base.test/dir/page.html"
    for raw in raws:
        assert canonicalize_one(raw, base) == canonicalize_one(
            raw, base, fast=False
        ), raw
        # seed-style (no base) call path too
        assert canonicalize_one(raw) == canonicalize_one(
            raw, fast=False
        ), raw


def test_strip_tracking_params(spark):
    from cocrawler_spark.functions.urls import strip_tracking_params_cols

    import pyspark.sql.functions as F

    cases = [
        ("http://a.test/p", "http://a.test/p", "http://a.test/p"),
        ("http://a.test/p?utm_source=x", "http://a.test/p", "http://a.test/p"),
        (
            "http://a.test/p?utm_source=x&id=1&b=2",
            "http://a.test/p?id=1&b=2",
            "http://a.test/p?b=2&id=1",
        ),
        (  # param-order aliasing collapses in dedup_key only
            "http://a.test/p?b=2&id=1",
            "http://a.test/p?b=2&id=1",
            "http://a.test/p?b=2&id=1",
        ),
        (  # exact click-ids, case-insensitive keys, empty params dropped
            "http://a.test/p?GCLID=z&&x=9&FBCLID=q",
            "http://a.test/p?x=9",
            "http://a.test/p?x=9",
        ),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "url string")
    cols = strip_tracking_params_cols(F.col("url"))
    got = {
        r["url"]: (r["s"], r["k"])
        for r in df.select(
            "url", cols["url_stripped"].alias("s"), cols["dedup_key"].alias("k")
        ).collect()
    }
    for url, want_s, want_k in cases:
        assert got[url] == (want_s, want_k), url

    # DuckDB twin parity on the same inputs
    import duckdb

    from cocrawler_spark.functions.urls import strip_tracking_params_sql

    sp = strip_tracking_params_sql("url")
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(c[0],) for c in cases])
    rows = con.execute(
        f"SELECT url, {sp['url_stripped']} AS s, {sp['dedup_key']} AS k FROM u"
    ).fetchall()
    for url, s_, k_ in rows:
        assert got[url] == (s_, k_), f"duckdb twin diverges on {url}"


def test_url_template_cols(spark):
    """Digit runs collapse to {d} in the PATH only; host preserved;
    bare-host URLs get path '/'."""
    from cocrawler_spark.functions.urls import url_template_cols

    rows = [
        (1, "http://h9.test/cal/2024/1/28"),
        (2, "https://a.example.com/art/12345"),
        (3, "http://b2.test"),
        (4, "http://c.test/x/y"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "id long, url string")
    c = url_template_cols(F.col("url"))
    got = {
        r["id"]: (r["host"], r["template"])
        for r in df.select(
            "id", c["host"].alias("host"), c["template"].alias("template")
        ).collect()
    }
    assert got[1] == ("h9.test", "/cal/{d}/{d}/{d}")
    assert got[2] == ("a.example.com", "/art/{d}")
    # digits in the HOST are untouched; empty path becomes '/'
    assert got[3] == ("b2.test", "/")
    assert got[4] == ("c.test", "/x/y")


def test_registered_domain_col_matches_py(spark):
    """registered_domain_col (pure JVM) must equal registered_domain_py
    on every host shape the crawl produces plus the classic edges."""
    from pyspark.sql import functions as F

    from cocrawler_spark.functions.domains import (
        registered_domain_col,
        registered_domain_py,
    )

    hosts = [
        "h3.test", "deep.sub.h7.test", "a.b.co.uk", "b.co.uk", "co.uk",
        "example.com", "www.example.com", "x.y.z.example.com",
        "single", "a.", "a..b", "UPPER.Example.COM", "h0.test.",
        "weird.unknownsuffix", "a.b.weird.unknownsuffix", "",
        "xn--bcher-kva.example", "127.0.0.1", "a.co", "sub.a.co",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registered_domain_col(F.col("host")).alias("d")
        ).collect()
    }
    for h in hosts:
        assert got[h] == registered_domain_py(h), (h, got[h])
