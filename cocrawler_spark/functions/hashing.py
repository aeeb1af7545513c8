"""Deterministic keyed 60-bit hash, computable identically in pure Python
(oracle simulator) and JVM-side Spark SQL (engine).

Reference analog: cocrawler/scheduler.py — queue_work† draws a *random*
tiebreaker ``(priority, rand, surt)`` to spread hosts across the priority
queue. Crawl-order equality between oracle and engine requires replacing
that RNG with a seeded keyed hash in BOTH (SURVEY.md §1 row 2, §3.2).

We use the first 15 hex digits (60 bits) of SHA-1 over
``"{key}\\x1f{value}"``:

* Python: ``int(hashlib.sha1(...).hexdigest()[:15], 16)``
* Spark:  ``conv(substring(sha1(concat_ws('\\x1f', key, col)), 1, 15), 16, 10)``

Both hash the UTF-8 bytes and both fit comfortably in a signed int64.
SHA-1 (not xxhash64) because Spark's xxhash64 has no cheap pure-Python
twin; this hash is only a tiebreaker/bucketer, never a hot inner loop —
where throughput matters (bloom filters) we use xxhash via
``pyspark.sql.functions.xxhash64`` on the engine side only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"
_HEX_DIGITS = 15  # 60 bits < 2^63, safe as signed long in both runtimes


def keyed_hash64(key: str, value: str) -> int:
    """Pure-Python side (oracle simulator, unit tests)."""
    h = hashlib.sha1(f"{key}{SEP}{value}".encode("utf-8")).hexdigest()
    return int(h[:_HEX_DIGITS], 16)


def keyed_hash64_col(key: str, col: Column) -> Column:
    """JVM-side equivalent — whole-stage-codegen friendly, no Python UDF."""
    return F.conv(
        F.substring(F.sha1(F.concat_ws(SEP, F.lit(key), col)), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("long")


def rand_key(rng_seed: int, wave: int) -> str:
    """Key string for the per-wave priority-queue tiebreaker."""
    return f"rand:{rng_seed}:{wave}"


def host_bucket(host: str, num_buckets: int) -> int:
    """Partition bucket for state tables — pure-Python twin (tests only;
    the engine computes it JVM-side via :func:`host_bucket_col`)."""
    return keyed_hash64("hostbucket", host) % num_buckets


def host_bucket_col(col: Column, num_buckets: int) -> Column:
    return F.pmod(keyed_hash64_col("hostbucket", col), F.lit(num_buckets)).cast("int")


def surt_bucket_col(col: Column, num_buckets: int) -> Column:
    """Bloom-state bucket routed by SURT hash. Host-hash routing carries
    the web's Zipf host skew into bucket VOLUME (one hot host's entire
    candidate stream lands in one bucket-task: measured 0.37 scaling
    efficiency on the probe cogroup from straggler tails); surt-hash is
    uniform over candidates by construction, so bucket tasks even out.
    Build and probe must use the same routing — membership is still
    keyed by the full surt string inside the bitmap."""
    return F.pmod(keyed_hash64_col("surtbucket", col), F.lit(num_buckets)).cast("int")


def is_flaky(url: str, flaky_mod: int) -> bool:
    """Deterministic 'fails first fetch attempt' predicate (config.flaky_mod)."""
    if flaky_mod <= 0:
        return False
    return keyed_hash64("flaky", url) % flaky_mod == 0


def is_flaky_col(col: Column, flaky_mod: int) -> Column:
    if flaky_mod <= 0:
        return F.lit(False)
    return F.pmod(keyed_hash64_col("flaky", col), F.lit(flaky_mod)) == 0
