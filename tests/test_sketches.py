"""Count-min and HyperLogLog sketches (operators/sketches.py): the
structural guarantees (CMS never underestimates; exact when the cell
table is collision-free) and estimator accuracy within the published
error bounds on synthetic data."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def test_cms_overestimates_and_is_exact_without_collisions(spark):
    from cocrawler_spark.operators.sketches import cms_token_counts

    rows = [(i, "alpha beta " * (i % 3 + 1) + "gamma") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["token"]: (r["true_count"], r["cms_count"])
        for r in cms_token_counts(df, "text", d=4, w=512).collect()
    }
    # exact truth: alpha/beta appear (i%3+1) times per doc, gamma once
    n_ab = sum(i % 3 + 1 for i in range(60))
    assert got["gamma"][0] == 60
    assert got["alpha"][0] == n_ab and got["beta"][0] == n_ab
    # CMS never underestimates
    assert all(cms >= true for true, cms in got.values())
    # 3 tokens in 4x512 cells: no collisions -> exact
    assert all(cms == true for true, cms in got.values())


def test_cms_collision_pressure_still_bounded(spark):
    """With w tiny, collisions inflate estimates but the lower bound
    (>= true) must always hold, for every one of many distinct
    tokens."""
    from cocrawler_spark.operators.sketches import cms_token_counts

    rows = [(i, " ".join(f"tok{j}" for j in range(i % 37))) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = cms_token_counts(df, "text", d=3, w=8).collect()
    assert len(got) == 36
    assert all(r["cms_count"] >= r["true_count"] for r in got)


def test_hll_estimate_within_error_bound(spark):
    """HLL at m=64 has relative standard error 1.04/sqrt(64) = 13%;
    assert within 4 sigma on a ~1500-distinct group and that the
    small-range linear-counting path engages (and is tight) on a
    ~20-distinct group."""
    from cocrawler_spark.operators.sketches import hll_distinct

    rows = [("big", f"u{i}") for i in range(1500)] * 2 + [
        ("small", f"v{i % 20}") for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["stratum"]: (r["exact_distinct"], r["hll_estimate"])
           for r in hll_distinct(df, "g", "v", m=64).collect()}
    ex_b, est_b = got["big"]
    assert ex_b == 1500
    assert abs(est_b - 1500) / 1500 < 0.52  # 4 sigma at 13%
    ex_s, est_s = got["small"]
    assert ex_s == 20
    assert abs(est_s - 20) / 20 < 0.35  # linear counting is tight here


def test_hll_deterministic_across_partitionings(spark):
    from cocrawler_spark.operators.sketches import hll_distinct

    rows = [(f"g{i % 3}", f"val{i % 97}") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v string")
    a = sorted(tuple(r) for r in hll_distinct(df, "g", "v").collect())
    b = sorted(
        tuple(r) for r in hll_distinct(df.repartition(11), "g", "v").collect()
    )
    assert a == b
