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
