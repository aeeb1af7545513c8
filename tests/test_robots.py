import pytest

from cocrawler_spark.functions.robots import robots_allowed_py


@pytest.mark.parametrize(
    "path,allow,disallow,expected",
    [
        ("/a", [], [], True),  # no rules → allowed
        ("/a", [], ["/"], False),  # deny all
        ("/p/x", ["/p/"], ["/"], True),  # longest match: allow wins
        ("/q/x", ["/p/"], ["/"], False),
        ("/p/1", [], ["/p/1"], False),  # exact prefix
        ("/p/10", [], ["/p/1"], False),  # prefix semantics
        ("/p/2", [], ["/p/1"], True),
        ("/p/abc", ["/p/a"], ["/p/"], True),  # longer allow beats shorter deny
        ("/p/abc", ["/p/"], ["/p/a"], False),  # longer deny beats shorter allow
        ("/p/a", ["/p/a"], ["/p/a"], True),  # tie → allow
    ],
)
def test_longest_prefix_matrix(path, allow, disallow, expected):
    assert robots_allowed_py(path, allow, disallow) is expected


@pytest.mark.parametrize(
    "path,allow,disallow,expected",
    [
        # '*' matches any sequence (including empty)
        ("/a/x/b", [], ["/a/*/b"], False),
        ("/a//b", [], ["/a/*/b"], False),
        ("/a/b", [], ["/a*b"], False),          # '*' can match empty
        ("/a/x/c", [], ["/a/*/b"], True),
        ("/img/pic.jpg", [], ["*.jpg$"], False),  # leading wildcard + anchor
        ("/img/pic.jpg?x", [], ["*.jpg$"], True),  # anchor: no trailing junk
        ("/img/pic.jpg?x", [], ["*.jpg"], False),  # no anchor: prefix match
        # trailing '$' anchors; '$' elsewhere is literal
        ("/p/1", [], ["/p/1$"], False),
        ("/p/10", [], ["/p/1$"], True),
        ("/a$b/c", [], ["/a$b"], False),
        # specificity counts octets of the RULE, wildcards included:
        # allow '/p/*11$' (7) beats disallow '/p/*1$' (6) on /p/11
        ("/p/11", ["/p/*11$"], ["/p/*1$"], True),
        ("/p/21", ["/p/*11$"], ["/p/*1$"], False),
        # equal length → allow wins
        ("/p/ab", ["/p/a*"], ["/p/*b"], True),
    ],
)
def test_wildcard_matrix(path, allow, disallow, expected):
    assert robots_allowed_py(path, allow, disallow) is expected


# ---------------------------------------------------------------------------
# robots.txt TEXT parser (REP group selection)
# ---------------------------------------------------------------------------

def test_parse_robots_txt_group_selection():
    from cocrawler_spark.functions.robots import parse_robots_txt_py

    txt = (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /private  # trailing comment\n"
        "Crawl-delay: 2\n"
        "\n"
        "User-agent: cocrawler\n"
        "User-agent: googlebot\n"
        "Allow: /public\n"
        "Disallow: /tmp\n"
        "Disallow:\n"          # empty Disallow = allow-all, no prefix
        "\n"
        "User-agent: cocrawler-img\n"
        "Disallow: /img\n"
    )
    # exact-name group beats *
    assert parse_robots_txt_py(txt, "cocrawler") == (["/public"], ["/tmp"], None)
    # unknown agent falls back to *
    assert parse_robots_txt_py(txt, "somebody") == ([], ["/private"], 2.0)
    # longest substring match wins (cocrawler-img over cocrawler)
    assert parse_robots_txt_py(txt, "cocrawler-img/1.0") == ([], ["/img"], None)
    # degenerate inputs
    assert parse_robots_txt_py("", "x") == ([], [], None)
    assert parse_robots_txt_py("Disallow: /orphan", "x") == ([], [], None)
    assert parse_robots_txt_py(None, "x") == ([], [], None)


def test_parse_robots_txt_same_token_groups_merge():
    from cocrawler_spark.functions.robots import parse_robots_txt_py

    txt = (
        "User-agent: cocrawler\nDisallow: /a\n\n"
        "User-agent: cocrawler\nDisallow: /b\nCrawl-delay: 7\n"
    )
    allow, disallow, delay = parse_robots_txt_py(txt, "cocrawler")
    assert (allow, sorted(disallow), delay) == ([], ["/a", "/b"], 7.0)


def test_parse_robots_txt_udf_matches_py(spark):
    from cocrawler_spark.functions.robots import (
        parse_robots_txt_py,
        parse_robots_txt_udf,
    )

    bodies = [
        "User-agent: *\nDisallow: /x\nCrawl-delay: 1.5\n",
        "User-agent: cocrawler\nAllow: /a\nDisallow: /b\n",
        "",
        "garbage without colons\nDisallow /nope\n",
    ]
    df = spark.createDataFrame([(i, b) for i, b in enumerate(bodies)], ["i", "t"])
    got = {
        r["i"]: (r["r"]["allow"], r["r"]["disallow"], r["r"]["crawl_delay"])
        for r in df.select(
            "i", parse_robots_txt_udf("cocrawler")(df["t"]).alias("r")
        ).collect()
    }
    for i, b in enumerate(bodies):
        assert got[i] == parse_robots_txt_py(b, "cocrawler")


def test_parse_robots_txt_one_group_wins_and_empty_ua_ignored():
    from cocrawler_spark.functions.robots import parse_robots_txt_py

    # same-length DIFFERENT tokens do not merge: first seen wins
    txt = (
        "User-agent: bot-a\nDisallow: /a\n\n"
        "User-agent: bot-b\nDisallow: /b\nCrawl-delay: 9\n"
    )
    assert parse_robots_txt_py(txt, "x-bot-a-bot-b-x") == ([], ["/a"], None)
    # malformed empty User-agent token is ignored, not universal
    txt2 = "User-agent:\nDisallow: /all\n\nUser-agent: *\nDisallow: /tmp\n"
    assert parse_robots_txt_py(txt2, "anything") == ([], ["/tmp"], None)


def test_sitemap_directive_trailing_comment(spark):
    from cocrawler_spark.functions.robots import sitemap_urls_col

    txt = "Sitemap: http://a.test/s.xml # updated 2024\nSitemap: http://a.test/t.xml\n"
    df = spark.createDataFrame([(txt,)], ["t"])
    got = df.select(sitemap_urls_col(df["t"]).alias("u")).collect()[0]["u"]
    assert got == ["http://a.test/s.xml", "http://a.test/t.xml"]
