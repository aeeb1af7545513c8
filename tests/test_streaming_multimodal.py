"""Streaming politeness seam + multimodal plumbing tests."""

import os

import pytest
from pyspark.sql import functions as F

from cocrawler_spark.streaming.curation import atomic_drop


def test_politeness_stream_end_to_end(spark, tmp_path):
    """Real streaming query: file source → applyInPandasWithState →
    memory sink. Two micro-batches; per-host state (seen set + slot
    cursor) must persist across them."""
    from cocrawler_spark.streaming.stateful import politeness_stream

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    b1 = spark.createDataFrame(
        [
            ("h1.test", "http://h1.test/a", "s/a", 0),
            ("h1.test", "http://h1.test/b", "s/b", 1),
            ("h2.test", "http://h2.test/x", "s/x", 0),
            ("h1.test", "http://h1.test/a", "s/a", 0),  # in-batch dup
        ],
        "host string, url string, surt string, priority int",
    )
    b1.write.parquet(os.path.join(src, "batch1"))

    stream = (
        spark.readStream.schema("host string, url string, surt string, priority int")
        .option("maxFilesPerTrigger", "100")
        .parquet(src + "/*")
    )
    out = politeness_stream(stream, crawl_delay=2.0)
    q = (
        out.writeStream.format("memory")
        .queryName("polstream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows1 = {
            (r["surt"]): (r["slot_index"], r["slot"])
            for r in spark.sql("select * from polstream").collect()
        }
        assert rows1["s/a"] == (0, 0.0)
        assert rows1["s/b"] == (1, 2.0)
        assert rows1["s/x"] == (0, 0.0)
        assert len(rows1) == 3  # dup suppressed

        # batch 2: cross-batch dup + new URL continues the slot cursor
        b2 = spark.createDataFrame(
            [
                ("h1.test", "http://h1.test/a", "s/a", 0),  # cross-batch dup
                ("h1.test", "http://h1.test/c", "s/c", 0),
            ],
            "host string, url string, surt string, priority int",
        )
        atomic_drop(b2, os.path.join(src, "batch2"))
        q.processAllAvailable()
        rows2 = {
            (r["surt"]): (r["slot_index"], r["slot"])
            for r in spark.sql("select * from polstream").collect()
        }
        assert len(rows2) == 4
        assert rows2["s/c"] == (2, 4.0)  # state persisted: next slot
    finally:
        q.stop()


@pytest.fixture(scope="module")
def assets(spark, tiny_web, tmp_path_factory):
    from cocrawler_spark.sources.multimodal import synth_assets_from_documents
    from cocrawler_spark.synth import write_parquet

    d = tmp_path_factory.mktemp("mm")
    paths = write_parquet(tiny_web, str(d))
    docs = spark.read.parquet(paths["documents"])
    return synth_assets_from_documents(docs).cache()


def test_assets_schema_and_determinism(assets):
    rows = assets.collect()
    assert len(rows) > 10
    r = rows[0]
    assert set(r.asDict()) == {"asset_id", "doc_id", "kind", "content", "meta"}
    assert r["meta"]["n_bytes"] == len(r["content"])
    # deterministic: same asset_id ⇒ same bytes across builds
    again = {x["asset_id"]: bytes(x["content"]) for x in assets.collect()}
    for x in rows[:20]:
        assert again[x["asset_id"]] == bytes(x["content"])


def test_feature_extraction_shape(assets):
    from cocrawler_spark.sources.multimodal import extract_features

    feats = extract_features(assets, dim=16).collect()
    assert len(feats) == assets.count()
    for f in feats[:10]:
        assert len(f["feature"]) == 16
        assert all(0.0 <= v <= 1.0 for v in f["feature"])


def test_resize_images(assets, spark):
    from cocrawler_spark.sources.multimodal import resize_images

    out = resize_images(assets, 8, 8).collect()
    n_images = assets.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out[:10]:
        assert len(r["content"]) == 64
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8


def test_decode_stub_raises_without_codec(assets):
    from cocrawler_spark.sources.multimodal import extract_features

    with pytest.raises(Exception) as ei:
        extract_features(assets, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_dedup_assets_exact(assets):
    """Asset-level content dedup vs a python mirror over the same
    collected rows: digest groups, doc counts, min-id representative."""
    import hashlib

    from cocrawler_spark.sources.multimodal import dedup_assets_exact

    rows = assets.collect()
    mirror = {}
    for r in rows:
        hx = bytes(r["content"]).hex().upper()
        dg = hashlib.md5(hx.encode()).hexdigest()
        g = mirror.setdefault(dg, {"refs": 0, "docs": set(), "kept": None, "nb": None})
        g["refs"] += 1
        g["docs"].add(r["doc_id"])
        aid, nb = r["asset_id"], r["meta"]["n_bytes"]
        if g["kept"] is None or aid < g["kept"]:
            g["kept"] = aid
        g["nb"] = nb if g["nb"] is None else min(g["nb"], nb)
    got = {
        r["content_digest"]: (
            r["n_refs"], r["n_docs"], r["kept_asset"], r["n_bytes"]
        )
        for r in dedup_assets_exact(assets).collect()
    }
    assert set(got) == set(mirror)
    for dg, g in mirror.items():
        assert got[dg] == (g["refs"], len(g["docs"]), g["kept"], g["nb"])
    # the corpus genuinely shares assets across docs (the dedup matters)
    assert any(len(g["docs"]) > 1 for g in mirror.values())
