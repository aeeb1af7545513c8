"""Golden tests for span parsing — the span-sequence-equality invariant."""

import hashlib

from cocrawler_spark.functions.parse import (
    content_sha1_py,
    extract_outlinks_py,
    redirect_target_py,
    text_of,
)


def _span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_outlinks_ordered_by_offset_then_document_order():
    spans = [
        _span("text", 'x <a href="http://b.test/2">l</a> y', offset=2),
        _span("media", media_ref="http://a.test/s.png", offset=1),
        _span("text", 'pre <a href="http://a.test/1">a</a> mid '
                      '<a href="/rel">b</a> post', offset=0),
    ]
    out = extract_outlinks_py(spans)
    assert [(o["target"], o["kind"], o["span_offset"]) for o in out] == [
        ("http://a.test/1", "link", 0),
        ("/rel", "link", 0),
        ("http://a.test/s.png", "embed", 1),
        ("http://b.test/2", "link", 2),
    ]


def test_per_page_dedup_first_occurrence_wins():
    spans = [
        _span("text", '<a href="http://a.test/1">x</a>', offset=0),
        _span("text", '<a href="http://a.test/1">y</a> <a href="http://a.test/2">z</a>', offset=1),
        _span("media", media_ref="http://a.test/1", offset=2),  # dup across kinds
    ]
    out = extract_outlinks_py(spans)
    assert [(o["target"], o["kind"]) for o in out] == [
        ("http://a.test/1", "link"),
        ("http://a.test/2", "link"),
    ]


def test_href_cleaning():
    spans = [_span("text", '<a href=" http://a.test/1\t">x</a>', offset=0)]
    assert extract_outlinks_py(spans)[0]["target"] == "http://a.test/1"


def test_redirect_detection():
    assert redirect_target_py([_span("redirect", "http://t.test/x")]) == "http://t.test/x"
    assert redirect_target_py([_span("text", "a"), _span("redirect", "b", offset=1)]) is None
    assert redirect_target_py([_span("text", "a")]) is None


def test_sha1_over_ordered_texts():
    spans = [
        _span("text", "B", offset=1),
        _span("text", "A", offset=0),
        _span("media", media_ref="m", offset=2),  # empty text still included
    ]
    expected = hashlib.sha1("A\x1fB\x1f".encode()).hexdigest()
    assert content_sha1_py(spans) == expected


def test_text_of_orders_and_filters():
    spans = [
        _span("text", "world", offset=1),
        _span("media", media_ref="m", offset=0),
        _span("text", "hello", offset=0),
    ]
    # same offset: stable sort keeps input order among equals? offsets differ in practice;
    # here text offset 0 sorts before offset 1 regardless of media interleave
    assert text_of(spans).split() == ["hello", "world"]


def test_extract_outlinks_col_parity(spark):
    """JVM extract_outlinks_col ≡ extract_outlinks_py on goldens + a
    noise matrix (quotes/backslashes/tabs in hrefs, empty targets,
    null text, media dups, redirect spans, null spans arrays)."""
    from pyspark.sql import functions as F

    from cocrawler_spark.functions.parse import extract_outlinks_col

    docs = [
        [
            _span("text", 'x <a href="http://b.test/2">l</a> y', offset=2),
            _span("media", media_ref="http://a.test/s.png", offset=1),
            _span("text", 'pre <a href="http://a.test/1">a</a> mid '
                          '<a href="/rel">b</a> post', offset=0),
        ],
        [
            _span("text", '<a href="http://a.test/1">x</a>', offset=0),
            _span("text", '<a href="http://a.test/1">y</a> '
                          '<a href="http://a.test/2">z</a>', offset=1),
            _span("media", media_ref="http://a.test/1", offset=2),
        ],
        [
            _span("text", 'href="  \' http://w.test/p\\\\ \t"', offset=0),
            _span("text", 'href=""', offset=1),
            _span("media", media_ref="   ", offset=2),
            _span("media", media_ref="\thttp://m.test/x\n", offset=3),
        ],
        [_span("redirect", "http://t.test/", offset=0)],
        [_span("text", None, offset=0), _span("other", "x", offset=1)],
        [
            # Unicode whitespace between href and '=' — \xa0 (NBSP) and
            # \x85 (NEL) match Python-re \s on str but not Java \s; the
            # shared explicit ASCII class must reject both identically
            _span("text", 'href\xa0=\xa0"http://u.test/nbsp"', offset=0),
            _span("text", 'href\x85="http://u.test/nel"', offset=1),
            _span("text", 'href \t= "http://u.test/ascii"', offset=2),
        ],
        [],
    ]
    rows = [(i, d) for i, d in enumerate(docs)] + [(len(docs), None)]
    df = spark.createDataFrame(
        rows,
        "id int, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        r["id"]: [tuple(o) for o in r["out"]]
        for r in df.select(
            "id", extract_outlinks_col(F.col("spans")).alias("out")
        ).collect()
    }
    for i, d in enumerate(docs):
        exp = [
            (o["target"], o["kind"], o["span_offset"])
            for o in extract_outlinks_py(d)
        ]
        assert got[i] == exp, f"doc {i}: {got[i]} != {exp}"
    assert got[len(docs)] == []
