"""Redirect-pair classification as a pure JVM when/otherwise chain.

Reference analog: cocrawler/urls.py — special_redirect† (SURVEY.md §2c:
"[SQL-oracle: CASE WHEN]"). Mirrors functions.urls.special_redirect
exactly; tests/test_engine_units.py cross-checks the two on generated
pairs so the column version and the Python version can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def special_redirect_col(
    from_scheme: Column,
    from_host: Column,
    from_surt: Column,
    from_path: Column,
    from_query: Column,
    to_scheme: Column,
    to_host: Column,
    to_surt: Column,
    to_path: Column,
    to_query: Column,
) -> Column:
    """NULL ⇒ ordinary redirect (caller coalesces to 'redirect')."""
    scheme_part = (
        F.when((from_scheme == "http") & (to_scheme == "https"), F.lit("tohttps"))
        .when((from_scheme == "https") & (to_scheme == "http"), F.lit("tohttp"))
        .otherwise(F.lit(""))
    )
    addw = to_host == F.concat(F.lit("www."), from_host)
    removew = from_host == F.concat(F.lit("www."), to_host)
    same_rest = (from_path == to_path) & (
        F.coalesce(from_query, F.lit("")) == F.coalesce(to_query, F.lit(""))
    )
    return (
        F.when(
            from_surt == to_surt,
            F.when(scheme_part != "", scheme_part).otherwise(F.lit("same surt")),
        )
        .when(
            same_rest & addw,
            F.when(scheme_part != "", F.concat(scheme_part, F.lit("+addw"))).otherwise(
                F.lit("addw")
            ),
        )
        .when(
            same_rest & removew,
            F.when(
                scheme_part != "", F.concat(scheme_part, F.lit("+removew"))
            ).otherwise(F.lit("removew")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
