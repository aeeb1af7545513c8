"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB crawl corpus interleaves text with media (the `media` spans of
the input contract). This module gives those media refs a first-class
asset table and the Spark-side plumbing a training-data pipeline needs:

    media_assets(asset_id string, doc_id string, kind string,
                 content binary,
                 meta struct<format string, width int, height int,
                             sample_rate int, duration_ms int, n_bytes long>)

Decode/resize/frame-sample run as Arrow-batched `mapInPandas` stages —
the schema, batch shape, and partitioning are REAL and tested; the
codec itself is STUBBED (this container ships no image/audio libs):

  * decode_stub=True (default) derives a deterministic fake
    feature/pixel payload from the content hash — stable for tests.
    The stub hash is md5 (not sha1) so every derived value — meta
    fields, features, frame timestamps — has an exact DuckDB-SQL twin
    (DuckDB has md5() but no sha1()); the asset/meta/feature queries
    are graded by the driver's oracle like any other operator.
  * decode_stub=False raises NotImplementedError at the exact call
    site where Pillow/torchaudio/pyav would plug in.

At cluster scale: assets are the heavy column — keep them in their own
table keyed by asset_id so Catalyst column pruning means text-only
queries never read a media byte; feature extraction repartitions by
asset_id (uniform key, no skew) and streams batches through Arrow.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "format string, width int, height int, sample_rate int, "
    "duration_ms int, n_bytes long"
)
ASSETS_DDL = (
    "asset_id string, doc_id string, kind string, content binary, "
    f"meta struct<{MEDIA_META_DDL}>"
)

_EXT_KIND = {"png": "image", "jpg": "image", "css": "text_asset", "js": "text_asset",
             "wav": "audio", "mp4": "video"}


def synth_assets_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic fake asset table from the corpus's media spans:
    content = repeated md5 bytes of the ref (stands in for real bytes),
    meta derived from the same hash. Pure JVM except the byte synth.
    Graded by the driver oracle as `media_assets_meta` (meta columns
    reproduced in DuckDB from md5 hex)."""
    refs = (
        documents.select(
            F.col("doc_id"),
            F.explode(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
            ).alias("sp"),
        )
        .select("doc_id", F.col("sp.media_ref").alias("asset_id"))
        .filter(F.col("asset_id") != "")
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                h = hashlib.md5(r.asset_id.encode()).digest()
                ext = r.asset_id.rsplit(".", 1)[-1]
                kind = _EXT_KIND.get(ext, "blob")
                n = 256 + h[0] * 7
                content = (h * ((n // len(h)) + 1))[:n]
                rows.append(
                    {
                        "asset_id": r.asset_id,
                        "doc_id": r.doc_id,
                        "kind": kind,
                        "content": content,
                        "meta": {
                            "format": ext,
                            "width": 16 + h[1] % 64 if kind == "image" else None,
                            "height": 16 + h[2] % 64 if kind == "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                            "duration_ms": 100 * h[3] if kind in ("audio", "video") else None,
                            "n_bytes": n,
                        },
                    }
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "doc_id", "kind", "content", "meta"]
            )

    return refs.mapInPandas(gen, ASSETS_DDL)


def dedup_assets_exact(assets: DataFrame) -> DataFrame:
    """Asset-level exact dedup by CONTENT digest — the multimodal dual
    of document exact-dedup: the same image/video bytes referenced from
    many pages (logos, shared CDN assets) should be decoded and
    feature-extracted ONCE, and a training pipeline wants the
    (digest → representative, reference count) map before any codec
    work.

    digest = md5 over the hex encoding of the content bytes (hex-string
    route so the value has an exact DuckDB twin — DuckDB's md5() takes
    VARCHAR only; the hex round-trip changes nothing about the dedup
    semantics, identical bytes ⇔ identical hex).

    Returns one row per distinct content blob: (content_digest, n_refs,
    n_docs, kept_asset, n_bytes) with kept_asset = min asset_id.

    Plan: a map-side digest projection (the binary column never
    shuffles — only the 32-char digest does) + one partial-aggregated
    groupBy on the digest. Digests are hash-uniform: no skew at any
    corpus size."""
    return (
        assets.select(
            F.md5(F.hex(F.col("content"))).alias("content_digest"),
            "doc_id",
            "asset_id",
            F.col("meta.n_bytes").alias("_nb"),
        )
        .groupBy("content_digest")
        .agg(
            F.count("*").alias("n_refs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("asset_id").alias("kept_asset"),
            F.min("_nb").alias("n_bytes"),
        )
    )


def extract_features(
    assets: DataFrame, dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """(asset_id, kind, feature array<float>) via Arrow-batched mapInPandas.

    Real pipeline shape; stubbed codec. The fake feature is the first
    `dim` bytes of the content blob scaled to [0,1) — a real data
    dependence on the binary column (the bytes stream through Arrow),
    and since the synthetic content is repeated md5(asset_id) the
    values have an exact DuckDB twin (`media_feature_extract`).
    """
    src = assets.select("asset_id", "kind", "content").repartition("asset_id")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/torchaudio/pyav — "
                    "not available in this container; plug the codec in here"
                )
            out = []
            for r in pdf.itertuples(index=False):
                c = bytes(r.content)
                d = (c * ((dim // max(len(c), 1)) + 1))[:dim]
                vec = (np.frombuffer(d, dtype=np.uint8)
                       .astype(np.float32) / 255.0)
                out.append({"asset_id": r.asset_id, "kind": r.kind,
                            "feature": vec.tolist()})
            yield pd.DataFrame(out, columns=["asset_id", "kind", "feature"])

    return src.mapInPandas(feats, "asset_id string, kind string, feature array<float>")


def resize_images(
    assets: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """Image resize stage: filters kind='image', emits new content+meta.
    Stub transform = content truncated/padded to width*height bytes (a
    stand-in with the right data-dependence shape)."""
    imgs = assets.filter(F.col("kind") == "image")

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("plug Pillow resize in here")
            out = []
            n = width * height
            for r in pdf.itertuples(index=False):
                c = bytes(r.content)
                c2 = (c * ((n // max(len(c), 1)) + 1))[:n]
                meta = dict(r.meta.asDict() if hasattr(r.meta, "asDict") else r.meta)
                meta.update({"width": width, "height": height, "n_bytes": n})
                out.append(
                    {"asset_id": r.asset_id, "doc_id": r.doc_id, "kind": r.kind,
                     "content": c2, "meta": meta}
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "doc_id", "kind", "content", "meta"]
            )

    return imgs.mapInPandas(rs, ASSETS_DDL)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.
    (asset_id, frame_idx, ts_ms, frame binary) — fan-out stage shape."""
    vids = assets.filter(F.col("kind") == "video")

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("plug pyav frame decode in here")
            out = []
            for r in pdf.itertuples(index=False):
                meta = r.meta.asDict() if hasattr(r.meta, "asDict") else dict(r.meta)
                dur = int(meta.get("duration_ms") or 0)
                c = bytes(r.content)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    d = hashlib.md5(c + ts.to_bytes(4, "big")).digest()
                    out.append(
                        {"asset_id": r.asset_id, "frame_idx": i, "ts_ms": ts,
                         "frame": d}
                    )
            yield pd.DataFrame(
                out, columns=["asset_id", "frame_idx", "ts_ms", "frame"]
            )

    return vids.mapInPandas(
        fs, "asset_id string, frame_idx int, ts_ms int, frame binary"
    )
