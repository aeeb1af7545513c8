"""Partitioned Cuckoo-filter sidecar for the URL-seen set.

north_rule: "URL-seen dedup via a partitioned bloom/cuckoo filter
maintained as Iceberg state tables". The bloom sidecar (state/bloom.py)
is the default — the seen set only grows during a crawl. The cuckoo
filter is the alternative for deployments that EXPIRE seen entries
(recrawl scheduling: a URL whose revisit interval elapsed must be
re-admitted to the frontier), because a cuckoo filter supports DELETE
(Fan, Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT'14) while a bloom bitmap cannot unset bits.

Same state-table discipline as the bloom sidecar:

- One filter per ``host_bucket = pmod(H(surt), P)`` per wave, stored as
  rows ``(host_bucket, wave, m_buckets, n_items, table: binary,
  overflow: array<long>)`` in the snapshot catalog — versioned and
  resumable like every other state table.
- Probe is a cogroup join (one filter deserialization per bucket task,
  only (host_bucket, surt) crosses the Arrow boundary).
- Fail-safe direction preserved: a cuckoo *negative* is
  definitely-unseen; a *positive* falls through to the exact anti-join.
  The no-false-negative guarantee survives insertion overflow because
  entries that cannot be placed after MAX_KICKS evictions spill to an
  exact ``overflow`` side list serialized with the table (at the 0.84
  design load factor overflow is ~never hit; the list bounds are
  asserted, not assumed).

Filter mechanics (partial-key cuckoo hashing):

- ``m`` power-of-two buckets × ``SLOTS_PER_BUCKET`` 16-bit fingerprint
  slots (0 = empty; fingerprints are forced nonzero).
- Candidate buckets: ``i1 = h(x) mod m``; ``i2 = i1 XOR g(fp)`` — i2 is
  derivable from (i1, fp) alone, which is what makes kick-out eviction
  (and filter merging at equal m) possible without the original keys.
- All tie-breaking is deterministic (sorted insertion order, eviction
  slot = kick_count mod SLOTS), so identical input builds identical
  bytes on every executor — the same determinism contract the bloom
  build keeps.

Deletes remove ONE matching fingerprint copy (standard cuckoo-filter
semantics): deleting a key that was never inserted can evict another
key with the same (bucket, fingerprint) pair and break the
no-false-negative guarantee — callers must only delete keys they
inserted (the engine deletes from the exact ``seen`` table in the same
transaction, which enforces this).

Routing/format version: CUCKOO_FORMAT_VERSION, recorded in snapshot
manifests exactly like BLOOM_FORMAT_VERSION — resuming under a
mismatched version rebuilds from the exact seen table.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SLOTS_PER_BUCKET = 4
MAX_KICKS = 500
LOAD_FACTOR = 0.84  # design load for 4-slot buckets (CoNEXT'14 §5.1)

CUCKOO_FORMAT_VERSION = 1


def _hashes(surt: str) -> tuple[int, int]:
    """(h, fp): 64-bit bucket hash + nonzero 16-bit fingerprint."""
    d = hashlib.sha1(b"cuckoo\x1f" + surt.encode("utf-8")).digest()
    h = int.from_bytes(d[0:8], "big")
    fp = int.from_bytes(d[8:10], "big") or 1
    return h, fp


def _fp_hash(fp: int) -> int:
    """g(fp) for the XOR partner bucket — depends on fp ONLY.
    int() coercion: fps read back from parquet/pandas arrive as
    numpy ints, which lack .to_bytes on this numpy build."""
    d = hashlib.sha1(b"cuckoo-fp\x1f" + int(fp).to_bytes(2, "big")).digest()
    return int.from_bytes(d[0:8], "big")


def m_buckets_for(n_items: int) -> int:
    """Power-of-two bucket count targeting the design load factor."""
    need = max(1, int(n_items / (SLOTS_PER_BUCKET * LOAD_FACTOR)) + 1)
    m = 1
    while m < need:
        m <<= 1
    return m


def _buckets(surt: str, m: int) -> tuple[int, int, int]:
    h, fp = _hashes(surt)
    i1 = h & (m - 1)
    i2 = (i1 ^ _fp_hash(fp)) & (m - 1)
    return i1, i2, fp


def _alt_bucket(i: int, fp: int, m: int) -> int:
    # int() coercions: bucket indexes and fingerprints read back from
    # parquet/pandas arrive as numpy int64, and numpy refuses XOR
    # against _fp_hash's unsigned-64-bit python int
    return (int(i) ^ _fp_hash(fp)) & (m - 1)


def _insert_pair(tab: np.ndarray, i1: int, fp: int, m: int) -> Optional[int]:
    """Insert fingerprint with home bucket i1; returns the overflow
    encoding (bucket << 16 | fp) if placement fails after MAX_KICKS."""
    i1, fp, m = int(i1), int(fp), int(m)
    i2 = _alt_bucket(i1, fp, m)
    for i in (i1, i2):
        row = tab[i]
        empties = np.nonzero(row == 0)[0]
        if len(empties):
            row[empties[0]] = fp
            return None
    # kick-out: deterministic eviction (alternate from i1's side)
    i, cur = i1, fp
    for kick in range(MAX_KICKS):
        slot = kick % SLOTS_PER_BUCKET
        cur, tab[i][slot] = int(tab[i][slot]), cur
        i = _alt_bucket(i, cur, m)
        row = tab[i]
        empties = np.nonzero(row == 0)[0]
        if len(empties):
            row[empties[0]] = cur
            return None
    return (i << 16) | cur


def build_table(
    surts: Iterable[str], m: int
) -> tuple[bytes, list[int], int]:
    """Build a filter over ``surts``: (table_bytes, overflow, n).
    Insertion order is sorted — identical input ⇒ identical bytes."""
    tab = np.zeros((m, SLOTS_PER_BUCKET), dtype=np.uint16)
    overflow: list[int] = []
    n = 0
    for s in sorted(set(surts)):
        i1, _, fp = _buckets(s, m)
        ov = _insert_pair(tab, i1, fp, m)
        if ov is not None:
            overflow.append(ov)
        n += 1
    return tab.tobytes(), overflow, n


def probe_table(
    surt: str, table: bytes, m: int, overflow: Optional[Sequence[int]]
) -> bool:
    tab = np.frombuffer(table, dtype=np.uint16).reshape(m, SLOTS_PER_BUCKET)
    i1, i2, fp = _buckets(surt, m)
    if fp in tab[i1] or fp in tab[i2]:
        return True
    if overflow is not None and len(overflow):
        # an overflow entry was evicted through arbitrary kick chains,
        # so its recorded bucket can be EITHER candidate of its key
        for enc in overflow:
            if (enc & 0xFFFF) == fp and (enc >> 16) in (i1, i2):
                return True
    return False


def delete_surt(
    table: bytes, m: int, overflow: Optional[Sequence[int]], surt: str
) -> tuple[bytes, list[int], bool]:
    """Remove ONE copy of surt's fingerprint; returns (table, overflow,
    removed?). Only delete keys that were inserted (module docstring)."""
    tab = np.frombuffer(table, dtype=np.uint16).reshape(
        m, SLOTS_PER_BUCKET
    ).copy()
    i1, i2, fp = _buckets(surt, m)
    for i in (i1, i2):
        hits = np.nonzero(tab[i] == fp)[0]
        if len(hits):
            tab[i][hits[0]] = 0
            return tab.tobytes(), list(overflow or []), True
    ov = list(overflow or [])
    for k, enc in enumerate(ov):
        if (enc & 0xFFFF) == fp and (enc >> 16) in (i1, i2):
            ov.pop(k)
            return tab.tobytes(), ov, True
    return tab.tobytes(), ov, False


def merge_tables(
    parts: list[tuple[bytes, list[int], int]], m: int
) -> tuple[bytes, list[int], int]:
    """Union equal-m filters by re-inserting stored (bucket, fp) pairs
    — possible without original keys because the partner bucket is
    derivable from (bucket, fp). Deterministic: pairs sorted."""
    pairs: list[tuple[int, int]] = []
    n = 0
    for table, overflow, cnt in parts:
        tab = np.frombuffer(table, dtype=np.uint16).reshape(
            m, SLOTS_PER_BUCKET
        )
        bi, si = np.nonzero(tab)
        pairs.extend(zip(bi.tolist(), tab[bi, si].astype(int).tolist()))
        pairs.extend(((enc >> 16), enc & 0xFFFF) for enc in overflow or [])
        n += cnt
    out = np.zeros((m, SLOTS_PER_BUCKET), dtype=np.uint16)
    ovf: list[int] = []
    for i, fp in sorted(pairs):
        ov = _insert_pair(out, i, fp, m)
        if ov is not None:
            ovf.append(ov)
    return out.tobytes(), ovf, n


# ---------------------------------------------------------------------------
# DataFrame build / compact / probe — signature-compatible with the
# bloom sidecar so the engine dispatches on config alone
# ---------------------------------------------------------------------------

_SCHEMA = (
    "host_bucket int, wave int, m_buckets long, n_items long, "
    "table binary, overflow array<long>"
)


def build_cuckoo_delta(
    new_rows: DataFrame, wave: int, num_buckets: int
) -> DataFrame:
    """One filter row per surt-hash-routed bucket over this wave's
    newly-seen surts (partition-parallel applyInPandas build)."""
    from ..functions.hashing import surt_bucket_col

    src = new_rows.select(
        surt_bucket_col(F.col("surt"), num_buckets).alias("host_bucket"),
        "surt",
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        surts = pdf["surt"].tolist()
        m = m_buckets_for(len(surts))
        table, overflow, n = build_table(surts, m)
        return pd.DataFrame(
            {
                "host_bucket": [int(pdf["host_bucket"].iloc[0])],
                "wave": [wave],
                "m_buckets": [m],
                "n_items": [n],
                "table": [table],
                "overflow": [overflow],
            }
        )

    return src.groupBy("host_bucket").applyInPandas(build, _SCHEMA)


def compact_cuckoo(
    cuckoo_df: DataFrame, num_buckets: int, wave: int
) -> DataFrame:
    """Merge each bucket's filter versions. Equal-m filters union via
    fingerprint re-insertion; differing-m groups stay separate rows
    (a fingerprint cannot be re-routed to a different m without its
    key — the same constraint compact_bloom has for differing m_bits)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for m, g in pdf.groupby("m_buckets"):
            table, overflow, n = merge_tables(
                [
                    (bytes(t), list(o) if o is not None else [], int(c))
                    for t, o, c in zip(
                        g["table"].tolist(),
                        g["overflow"].tolist(),
                        g["n_items"].tolist(),
                    )
                ],
                int(m),
            )
            rows.append(
                {
                    "host_bucket": int(pdf["host_bucket"].iloc[0]),
                    "wave": wave,
                    "m_buckets": int(m),
                    "n_items": n,
                    "table": table,
                    "overflow": overflow,
                }
            )
        return pd.DataFrame(rows)

    return cuckoo_df.groupBy("host_bucket").applyInPandas(merge, _SCHEMA)


def probe_cuckoo(
    candidates: DataFrame, cuckoo_df: DataFrame, num_buckets: int
) -> DataFrame:
    """Candidates + `_maybe`: true iff ANY filter version of the
    candidate's bucket probes positive. Same cogroup shape (and the
    same exchange-reuse property with the downstream surt-keyed
    anti-join) as state/bloom.py:probe_bloom."""
    from ..functions.hashing import surt_bucket_col

    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    cand_cols = candidates.columns
    slim = candidates.select(
        surt_bucket_col(F.col("surt"), num_buckets).alias("_hb"), "surt"
    )
    out_schema = StructType(
        [StructField("surt", StringType()), StructField("_maybe", BooleanType())]
    )

    def probe_group(
        cand_pdf: pd.DataFrame, filt_pdf: pd.DataFrame
    ) -> pd.DataFrame:
        surts = cand_pdf["surt"].drop_duplicates()
        if filt_pdf.empty:
            return pd.DataFrame({"surt": surts, "_maybe": False})
        # parse each filter version ONCE per task, not once per surt
        parsed = [
            (
                np.frombuffer(bytes(t), dtype=np.uint16).reshape(
                    int(m), SLOTS_PER_BUCKET
                ),
                int(m),
                set(o.tolist() if hasattr(o, "tolist") else o)
                if o is not None
                else set(),
            )
            for t, m, o in zip(
                filt_pdf["table"].tolist(),
                filt_pdf["m_buckets"].tolist(),
                filt_pdf["overflow"].tolist(),
            )
        ]

        def _maybe(s: str) -> bool:
            for tab, m, oset in parsed:
                i1, i2, fp = _buckets(s, m)
                if fp in tab[i1] or fp in tab[i2]:
                    return True
                if oset and (
                    ((i1 << 16) | fp) in oset or ((i2 << 16) | fp) in oset
                ):
                    return True
            return False

        return pd.DataFrame(
            {"surt": surts, "_maybe": [_maybe(s) for s in surts.tolist()]}
        )

    verdicts = (
        slim.groupBy("_hb")
        .cogroup(
            cuckoo_df.select(
                F.col("host_bucket").alias("_hb"),
                "m_buckets",
                "table",
                "overflow",
            ).groupBy("_hb")
        )
        .applyInPandas(probe_group, out_schema)
    )
    return candidates.join(verdicts, "surt").select(*cand_cols, "_maybe")


def delete_cuckoo(
    cuckoo_df: DataFrame, expired: DataFrame, num_buckets: int, wave: int
) -> DataFrame:
    """Remove expired surts from their bucket's filters (recrawl
    expiry). Cogrouped: each task sees one bucket's filter versions and
    its expired surts; each surt is deleted from the FIRST version that
    contains it (insert-once discipline: the engine inserts a surt in
    exactly one wave delta). Rows come back re-stamped at ``wave``."""
    from ..functions.hashing import surt_bucket_col

    exp = expired.select(
        surt_bucket_col(F.col("surt"), num_buckets).alias("_hb"), "surt"
    )

    def del_group(filt_pdf: pd.DataFrame, exp_pdf: pd.DataFrame) -> pd.DataFrame:
        if filt_pdf.empty:
            return pd.DataFrame(
                columns=[
                    "host_bucket", "wave", "m_buckets", "n_items",
                    "table", "overflow",
                ]
            )
        versions = [
            {
                "host_bucket": int(r["host_bucket"]),
                "m_buckets": int(r["m_buckets"]),
                "n_items": int(r["n_items"]),
                "table": bytes(r["table"]),
                "overflow": list(r["overflow"]) if r["overflow"] is not None else [],
            }
            for _, r in filt_pdf.iterrows()
        ]
        for s in sorted(exp_pdf["surt"].drop_duplicates().tolist()):
            for v in versions:
                t, o, removed = delete_surt(
                    v["table"], v["m_buckets"], v["overflow"], s
                )
                if removed:
                    v["table"], v["overflow"] = t, o
                    v["n_items"] = max(0, v["n_items"] - 1)
                    break
        return pd.DataFrame(
            {
                "host_bucket": [v["host_bucket"] for v in versions],
                "wave": [wave] * len(versions),
                "m_buckets": [v["m_buckets"] for v in versions],
                "n_items": [v["n_items"] for v in versions],
                "table": [v["table"] for v in versions],
                "overflow": [v["overflow"] for v in versions],
            }
        )

    return (
        cuckoo_df.withColumn("_hb", F.col("host_bucket"))
        .groupBy("_hb")
        .cogroup(exp.groupBy("_hb"))
        .applyInPandas(lambda f, e: del_group(f, e), _SCHEMA)
    )
