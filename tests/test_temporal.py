"""Semantics + plan-shape tests for operators/temporal.py.

The driver oracle pair checks sf0.01 equality vs DuckDB; these pin the
edge semantics (strict vs non-strict as-of, tie-breaks, bucket
boundaries, cascade exactness, single-visit pages) on hand-built
frames where the expected answer is enumerable, and pin the SCALE
properties: the as-of join plans zero joins, the range join plans no
cartesian/BNLJ.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cocrawler_spark.operators.dedup import ngram_containment_pairs
from cocrawler_spark.operators.temporal import (
    asof_join,
    hypertable_rollup,
    range_join_buckets,
    recrawl_schedule,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # key, ts, id, val
        (1, _ts("2024-01-01 10:00:00"), 1, 1.0),   # view
        (1, _ts("2024-01-01 10:05:00"), 2, 2.0),   # view
        (1, _ts("2024-01-01 10:05:00"), 3, 3.0),   # view, same instant as id 2
        (1, _ts("2024-01-01 10:10:00"), 4, 4.0),   # click
        (1, _ts("2024-01-01 10:05:00"), 5, 5.0),   # click AT a view instant
        (2, _ts("2024-01-01 09:00:00"), 6, 6.0),   # click, no prior view
        (2, _ts("2024-01-01 09:30:00"), 7, 7.0),   # view
    ]
    views = [(k, t, i, v) for (k, t, i, v) in rows if i in (1, 2, 3, 7)]
    clicks = [(k, t, i, v) for (k, t, i, v) in rows if i in (4, 5, 6)]
    cols = ["user_id", "ts", "event_id", "value"]
    return (
        spark.createDataFrame(clicks, cols),
        spark.createDataFrame(views, cols),
    )


def test_asof_strict_semantics(events):
    clicks, views = events
    out = asof_join(
        clicks, views, key="user_id", ts="ts",
        left_id="event_id", right_id="event_id",
        right_payload=["value"], strict=True,
    )
    got = {r["event_id"]: (r["matched_event_id"], r["matched_value"])
           for r in out.collect()}
    # click 4 at 10:10 -> latest earlier view is the 10:05 pair; tie on
    # ts breaks to the LARGER id (3).
    assert got[4] == (3, 3.0)
    # click 5 AT 10:05 -> strict: only the 10:00 view qualifies.
    assert got[5] == (1, 1.0)
    # click 6 has no prior view -> left-outer NULLs.
    assert got[6] == (None, None)


def test_asof_non_strict_includes_same_instant(events):
    clicks, views = events
    out = asof_join(
        clicks, views, key="user_id", ts="ts",
        left_id="event_id", right_id="event_id", strict=False,
    )
    got = {r["event_id"]: r["matched_event_id"] for r in out.collect()}
    assert got[5] == 3  # same-instant views visible; max id wins


def test_asof_plan_has_no_join(events):
    clicks, views = events
    out = asof_join(clicks, views, key="user_id", ts="ts",
                    left_id="event_id", right_id="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, plan


def test_range_join_boundaries(spark):
    base = _ts("2024-01-01 00:00:00")
    iv = spark.createDataFrame(
        [(1, base, base + dt.timedelta(seconds=600), 100)],
        ["k", "st", "en", "iid"],
    )
    pts = spark.createDataFrame(
        [
            (1, base, 1),                                   # == start: in
            (1, base + dt.timedelta(seconds=599), 2),       # inside
            (1, base + dt.timedelta(seconds=600), 3),       # == end: OUT
            (1, base - dt.timedelta(microseconds=1), 4),    # before: out
            (2, base + dt.timedelta(seconds=300), 5),       # wrong key
        ],
        ["k", "ts", "pid"],
    )
    out = range_join_buckets(
        pts, iv, key="k", point_ts="ts", start_ts="st", end_ts="en",
        point_id="pid", interval_id="iid", bucket_s=300.0,
    )
    rows = sorted((r["iid"], r["pid"]) for r in out.collect())
    # interval spans 2 buckets; each matching point appears exactly once
    assert rows == [(100, 1), (100, 2)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, plan


def test_hypertable_cascade_matches_direct(spark):
    import random

    rnd = random.Random(7)
    base = _ts("2024-03-01 00:00:00")
    rows = [
        (base + dt.timedelta(minutes=rnd.randrange(0, 60 * 24 * 3)),
         rnd.choice(["a", "b"]), round(rnd.uniform(0, 10), 2))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, ["ts", "kind", "v"])
    out = hypertable_rollup(df, ts="ts", dims=["kind"], value="v",
                            grains=("hour", "day"))
    # day level of the cascade == direct day aggregation of raw rows
    day = {
        (r["bucket"], r["kind"]): (r["n_rows"], round(r["sum_v"], 6),
                                   r["min_v"], r["max_v"])
        for r in out.filter(F.col("grain") == "day").collect()
    }
    direct = {
        (r["bucket"], r["kind"]): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in df.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), F.col("kind")
        ).agg(
            F.count("*").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    assert day == direct
    # hour rows sum to the raw count
    n_hour = (
        out.filter(F.col("grain") == "hour")
        .agg(F.sum("n_rows")).collect()[0][0]
    )
    assert n_hour == 500


def test_recrawl_schedule_semantics(spark):
    base = _ts("2024-01-01 00:00:00")
    rows = []
    # page 1: 11 visits 1 day apart, changed on 5 -> moderate interval
    for i in range(11):
        rows.append((1, base + dt.timedelta(days=i), i < 5))
    # page 2: single visit -> max interval (nothing known)
    rows.append((2, base, True))
    # page 3: never changes -> clamps to max
    for i in range(10):
        rows.append((3, base + dt.timedelta(hours=i), False))
    df = spark.createDataFrame(rows, ["page", "ts", "chg"])
    out = {r["page"]: r for r in recrawl_schedule(
        df, page="page", ts="ts", changed=F.col("chg")
    ).collect()}
    assert out[2]["revisit_s"] == 30 * 86400.0
    # page 3 never changed, but the +0.5 smoothing keeps λ̂ > 0: with
    # n=10 at 1 h gaps, r = 0.5/11 and iv = 0.5·3600/−ln(1−r) ≈ 38693 s
    # — a finite, conservative revisit rather than "never".
    import math
    lam3 = -math.log(1 - 0.5 / 11) / 3600.0
    assert abs(out[3]["revisit_s"] - 0.5 / lam3) < 1.0
    r1 = out[1]
    assert r1["n_visits"] == 11 and r1["n_changed"] == 5
    # r = 5.5/12, lam = -ln(1-r)/86400, iv = .5/lam  (~71.5k s), in clamp range
    import math
    lam = -math.log(1 - 5.5 / 12) / 86400.0
    assert abs(r1["revisit_s"] - 0.5 / lam) < 1.0
    assert r1["next_fetch_us"] > 0


def test_containment_catches_subset_doc(spark):
    long_doc = " ".join(f"tok{i}" for i in range(60))
    short_doc = " ".join(f"tok{i}" for i in range(20, 40))  # embedded run
    other = " ".join(f"zzz{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)], ["doc_id", "text"]
    )
    pairs = ngram_containment_pairs(df, "text", "doc_id", threshold=0.9).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["containment"] == 1.0  # short fully inside long


def test_asof_null_payload_stays_consistent(spark):
    # matched right row has NULL payload -> matched_value must be NULL
    # (id+payload travel as one struct; per-column carry-forward would
    # stitch the newer id to the older row's value)
    base = _ts("2024-01-01 10:00:00")
    views = spark.createDataFrame(
        [(1, base, 1, 7.0), (1, base + dt.timedelta(minutes=5), 2, None)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    clicks = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=10), 9, 0.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    r = asof_join(
        clicks, views, key="user_id", ts="ts",
        left_id="event_id", right_id="event_id", right_payload=["value"],
    ).collect()[0]
    assert r["matched_event_id"] == 2
    assert r["matched_value"] is None


def test_asof_string_right_id(spark):
    # non-numeric right ids survive (no silent cast-to-long nulling)
    views = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "u-a"),
         (1, _ts("2024-01-01 10:05:00"), "u-b")],
        "user_id long, ts timestamp, url string",
    )
    clicks = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:07:00"), 5)],
        "user_id long, ts timestamp, event_id long",
    )
    r = asof_join(
        clicks, views, key="user_id", ts="ts",
        left_id="event_id", right_id="url",
    ).collect()[0]
    assert r["matched_url"] == "u-b"


def test_lastmod_refetch_gate(spark):
    from cocrawler_spark.operators.temporal import lastmod_refetch

    sitemap = spark.createDataFrame(
        [
            ("u1", "2024-05-09"),  # newer than fetch -> refetch
            ("u2", "2024-05-01"),  # older -> no
            ("u3", "2024-05-05"),  # equal -> no (strict >)
            ("u4", None),          # no lastmod -> estimator's job, no
            ("u5", "2024-05-02"),  # never fetched -> refetch
        ],
        "url string, lastmod string",
    )
    log = spark.createDataFrame(
        [("u1", "2024-05-05"), ("u2", "2024-05-05"),
         ("u3", "2024-05-05"), ("u4", "2024-05-05")],
        "url string, fetched_at string",
    )
    got = {
        r["url"]: r["refetch"]
        for r in lastmod_refetch(sitemap, log).collect()
    }
    assert got == {"u1": True, "u2": False, "u3": False,
                   "u4": False, "u5": True}
