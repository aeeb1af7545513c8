"""Partitioned Bloom-filter sidecar for the URL-seen set.

north_rule: "URL-seen dedup via a partitioned bloom/cuckoo filter
maintained as Iceberg state tables". Design (SURVEY.md §4.3):

- One bitmap per `host_bucket = pmod(H(host), P)` per wave, stored as
  rows ``(host_bucket, wave, m_bits, n_items, bitmap: binary)`` in the
  snapshot catalog — i.e. the filter IS a state table, versioned and
  resumable like everything else.
- Probe is a JOIN, not a side-input: candidates carry host_bucket, the
  bloom table is joined on it (co-partitioned; each task touches only
  its bucket's bitmaps) and a vectorized pandas UDF tests membership.
  With per-bucket compaction the join fan-out is one row per bucket.
- Fail-safe direction: a bloom *negative* is definitely-unseen (skips
  the exact anti-join entirely — at 10^10 scale this removes
  ~(1 − dup_rate) of the anti-join shuffle traffic); a bloom
  *positive* falls through to the exact anti-join, so false positives
  cost a recheck, never a wrong drop.
- Bloom (not cuckoo): the seen set never deletes (SURVEY.md §4.3).

Hashing: double hashing h1 + i·h2 with the sha1-keyed 60-bit hashes —
the same primitive the engine already guarantees Python/JVM parity
for; here only Python-side parity (build and probe both happen in
pandas UDFs) plus determinism matter.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

BITS_PER_ITEM = 10  # ~1% false-positive rate
NUM_HASHES = 7


def _h2(surt: str) -> tuple[int, int]:
    d = hashlib.sha1(b"bloom\x1f" + surt.encode("utf-8")).digest()
    h1 = int.from_bytes(d[0:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return h1, h2


def build_bitmap(surts: Iterable[str], m_bits: int) -> bytes:
    bm = bytearray((m_bits + 7) // 8)
    for s in surts:
        h1, h2 = _h2(s)
        for i in range(NUM_HASHES):
            pos = (h1 + i * h2) % m_bits
            bm[pos >> 3] |= 1 << (pos & 7)
    return bytes(bm)


def probe_bitmap(surt: str, bitmap: bytes, m_bits: int) -> bool:
    h1, h2 = _h2(surt)
    for i in range(NUM_HASHES):
        pos = (h1 + i * h2) % m_bits
        if not (bitmap[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def merge_bitmaps(bitmaps: list[bytes]) -> bytes:
    out = bytearray(max(len(b) for b in bitmaps))
    for b in bitmaps:
        for i, byte in enumerate(b):
            out[i] |= byte
    return bytes(out)


def m_bits_for(n_items: int) -> int:
    return max(64, int(math.ceil(n_items * BITS_PER_ITEM / 64.0)) * 64)


# ---------------------------------------------------------------------------
# DataFrame build / probe
# ---------------------------------------------------------------------------

def build_bloom_delta(new_rows: DataFrame, wave: int, num_buckets: int) -> DataFrame:
    """(host_bucket, wave, m_bits, n_items, bitmap) — one row per bucket
    holding this wave's newly-seen surts. Built partition-parallel via
    applyInPandas over the bucket key (the UDAF-equivalent build)."""
    from ..functions.hashing import host_bucket_col

    src = new_rows.select(
        host_bucket_col(F.col("host"), num_buckets).alias("host_bucket"), "surt"
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        surts = pdf["surt"].tolist()
        m = m_bits_for(len(surts))
        return pd.DataFrame(
            {
                "host_bucket": [int(pdf["host_bucket"].iloc[0])],
                "wave": [wave],
                "m_bits": [m],
                "n_items": [len(surts)],
                "bitmap": [build_bitmap(surts, m)],
            }
        )

    return src.groupBy("host_bucket").applyInPandas(
        build,
        "host_bucket int, wave int, m_bits long, n_items long, bitmap binary",
    )


def compact_bloom(bloom_df: DataFrame, num_buckets: int, wave: int) -> DataFrame:
    """OR-merge all bitmap versions of each bucket into one row (bounds
    the probe-join fan-out; run every few waves)."""
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["n_items"].sum())
        m = int(max(pdf["m_bits"].max(), m_bits_for(n)))
        # rebuild-free merge only valid for equal m; differing m ⇒ keep
        # the largest bitmaps separate is wrong — instead re-hash is
        # impossible here, so we merge equal-m groups and keep the rest.
        groups = []
        for mb, g in pdf.groupby("m_bits"):
            groups.append(
                {
                    "host_bucket": int(pdf["host_bucket"].iloc[0]),
                    "wave": wave,
                    "m_bits": int(mb),
                    "n_items": int(g["n_items"].sum()),
                    "bitmap": merge_bitmaps([bytes(b) for b in g["bitmap"]]),
                }
            )
        return pd.DataFrame(groups)

    return bloom_df.groupBy("host_bucket").applyInPandas(
        merge, "host_bucket int, wave int, m_bits long, n_items long, bitmap binary"
    )


def probe_udf():
    @F.pandas_udf(BooleanType())
    def probe(surt: pd.Series, bitmap: pd.Series, m_bits: pd.Series) -> pd.Series:
        # NULL bitmap (bucket with no bloom yet) ⇒ not seen. The UDF must
        # handle NULLs itself: when/otherwise does not short-circuit
        # vectorized UDF evaluation.
        return pd.Series(
            [
                False if b is None else probe_bitmap(s, bytes(b), int(m))
                for s, b, m in zip(surt.tolist(), bitmap.tolist(), m_bits.tolist())
            ]
        )

    return probe


def split_by_bloom(
    candidates: DataFrame, bloom_df: DataFrame, num_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """Partition candidates into (definitely_new, maybe_seen).

    A candidate is maybe_seen iff ANY bitmap of its bucket probes
    positive. Candidates in buckets with no bitmap yet are new.
    """
    from ..functions.hashing import host_bucket_col

    c = candidates.withColumn(
        "_hb", host_bucket_col(F.col("host"), num_buckets)
    )
    j = c.join(
        bloom_df.select(
            F.col("host_bucket").alias("_hb"), "m_bits", "bitmap"
        ),
        "_hb",
        "left",
    )
    j = j.withColumn(
        "_hit",
        F.when(F.col("bitmap").isNull(), F.lit(False)).otherwise(
            probe_udf()(F.col("surt"), F.col("bitmap"), F.col("m_bits"))
        ),
    )
    keys = [col for col in candidates.columns]
    agg = (
        j.groupBy(*keys)
        .agg(F.max(F.col("_hit").cast("int")).alias("_maybe"))
    )
    definitely_new = agg.filter(F.col("_maybe") == 0).drop("_maybe")
    maybe_seen = agg.filter(F.col("_maybe") == 1).drop("_maybe")
    return definitely_new, maybe_seen
