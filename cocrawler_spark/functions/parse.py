"""Interleaved-document parsing: outlink/embed extraction over span arrays.

Reference analogs: cocrawler/parse.py — find_html_links_re /
find_body_links_re† (anchors = "links", resources = "embeds"), executed
in the reference inside Burner worker *processes* (cocrawler/burner.py†).
Our process boundary is the Arrow batch: `extract_outlinks_udf` runs as
a pandas UDF on executors (SURVEY.md §3.3).

The per-row invariant of BASELINE.json:input_hint lives here:
**span-sequence equality (kind, text, media_ref, order)** — spans are
processed strictly in ascending-offset order, link extraction order
within a text span is document order, and the sha1 content digest is
computed over '\\x1f'-joined ordered text fields. The pure-Python core is
shared with the oracle simulator; tests/test_parse.py pins its semantics
with hand-written goldens.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .urls import clean_link, clean_link_col

# anchors in text spans carry explicit markup: <a href="...">
# Whitespace class is spelled out because Python-re \s on str also
# matches Unicode whitespace (\xa0, \x85) while Java \s is ASCII-only —
# the explicit class is identical on both sides, keeping the pandas-UDF
# and JVM extractors bit-equal on exotic whitespace (ADVICE r2; parity
# pinned with a \xa0 case in tests/test_parse.py).
_WS = r"[ \t\r\n\f\x0b]"
_HREF_PATTERN = f'href{_WS}*={_WS}*"([^"]*)"'
_HREF_RE = re.compile(_HREF_PATTERN)

KIND_LINK = "link"
KIND_EMBED = "embed"
SHA_SEP = "\x1f"


def sorted_spans(spans: Iterable) -> list:
    """Spans in canonical order: ascending offset (FIXTURES.md §1)."""
    return sorted(spans, key=lambda s: s["offset"])


def extract_outlinks_py(spans: Iterable) -> list[dict]:
    """Pure-Python core. Returns ordered, per-page-deduped outlinks:
    [{target, kind, span_offset}, ...].

    - text spans → every href="..." in document order → kind='link'
    - media spans → media_ref → kind='embed'
    - redirect spans → handled by the fetch stage, not here
    - per-page dedup: first occurrence of a cleaned target wins
      (reference keeps per-page links in a Python set†; order is then
      irrelevant upstream because the priority queue re-sorts — we keep
      first-occurrence order so the golden fixture is deterministic).
    """
    seen: set[str] = set()
    out: list[dict] = []
    for sp in sorted_spans(spans):
        kind = sp["kind"]
        if kind == "text":
            for m in _HREF_RE.finditer(sp["text"] or ""):
                t = clean_link(m.group(1))
                if t and t not in seen:
                    seen.add(t)
                    out.append(
                        {"target": t, "kind": KIND_LINK, "span_offset": sp["offset"]}
                    )
        elif kind == "media":
            t = clean_link(sp["media_ref"] or "")
            if t and t not in seen:
                seen.add(t)
                out.append(
                    {"target": t, "kind": KIND_EMBED, "span_offset": sp["offset"]}
                )
    return out


def redirect_target_py(spans: Iterable) -> Optional[str]:
    """If the document is a redirect page (single span, kind='redirect'),
    return its target URL, else None."""
    sp = sorted_spans(spans)
    if len(sp) == 1 and sp[0]["kind"] == "redirect":
        return clean_link(sp[0]["text"] or "")
    return None


def content_sha1_py(spans: Iterable) -> str:
    """sha1 over '\\x1f'-joined ordered text fields — the WARC payload
    digest analog (cocrawler/warc.py†) doubling as the span-sequence
    equality checksum (SURVEY.md §1 row 14)."""
    texts = [sp["text"] or "" for sp in sorted_spans(spans)]
    return hashlib.sha1(SHA_SEP.join(texts).encode("utf-8")).hexdigest()


def text_of(spans: Iterable) -> str:
    """Concatenated text of text-kind spans in order (text-analysis ops)."""
    return " ".join(
        sp["text"] or "" for sp in sorted_spans(spans) if sp["kind"] == "text"
    )


# ---------------------------------------------------------------------------
# Spark bindings
# ---------------------------------------------------------------------------

OUTLINK_STRUCT = ArrayType(
    StructType(
        [
            StructField("target", StringType()),
            StructField("kind", StringType()),
            StructField("span_offset", IntegerType()),
        ]
    )
)


def extract_outlinks_udf():
    """pandas UDF: spans array<struct> -> array<struct<target,kind,span_offset>>.

    Arrow delivers the nested column as a pandas Series of lists of dicts.
    """
    @F.pandas_udf(OUTLINK_STRUCT)
    def extract(spans: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_outlinks_py(s) if s is not None else [] for s in spans]
        )

    return extract


_OUTLINK_SQL_TYPE = "array<struct<target:string,kind:string,span_offset:int>>"


def extract_outlinks_col(spans: Column) -> Column:
    """JVM-side twin of extract_outlinks_py — whole-stage codegen, no
    Python in the loop (parity pinned in tests/test_parse.py against the
    pandas UDF on the same goldens + synth docs).

    Same semantics, expression by expression:
    - spans in ascending-offset order (offsets are unique per doc —
      FIXTURES.md §1 — so comparator stability is moot)
    - text spans: every href="..." in document order → clean_link →
      kind='link'; media spans: media_ref → clean_link → kind='embed'
    - empty targets dropped; per-page first-occurrence dedup by target
      via a linear aggregate (pages have O(10) links, so the
      array_contains inner scan is trivial)

    This replaces the engine's hottest pandas UDF: outlink extraction
    runs once per page over the whole corpus, and the Arrow hand-off of
    a nested array<struct> column plus per-row Python dict assembly was
    ~10x the cost of the actual regex work.
    """
    srt = spans_sorted_col(spans)
    per_span = F.transform(
        srt,
        lambda s: F.when(
            s["kind"] == F.lit("text"),
            F.transform(
                F.regexp_extract_all(
                    F.coalesce(s["text"], F.lit("")),
                    F.lit(_HREF_PATTERN),
                    F.lit(1),
                ),
                lambda t: F.struct(
                    clean_link_col(t).alias("target"),
                    F.lit(KIND_LINK).alias("kind"),
                    s["offset"].cast("int").alias("span_offset"),
                ),
            ),
        )
        .when(
            s["kind"] == F.lit("media"),
            F.array(
                F.struct(
                    clean_link_col(F.coalesce(s["media_ref"], F.lit(""))).alias(
                        "target"
                    ),
                    F.lit(KIND_EMBED).alias("kind"),
                    s["offset"].cast("int").alias("span_offset"),
                )
            ),
        )
        .otherwise(F.array().cast(_OUTLINK_SQL_TYPE)),
    )
    flat = F.filter(
        F.flatten(per_span),
        lambda x: x["target"].isNotNull() & (x["target"] != F.lit("")),
    )
    acc0 = F.struct(
        F.array().cast("array<string>").alias("seen"),
        F.array().cast(_OUTLINK_SQL_TYPE).alias("out"),
    )
    deduped = F.aggregate(
        flat,
        acc0,
        lambda acc, x: F.when(
            F.array_contains(acc["seen"], x["target"]), acc
        ).otherwise(
            F.struct(
                F.concat(acc["seen"], F.array(x["target"])).alias("seen"),
                F.concat(acc["out"], F.array(x)).alias("out"),
            )
        ),
        lambda acc: acc["out"],
    )
    return F.when(spans.isNull(), F.array().cast(_OUTLINK_SQL_TYPE)).otherwise(
        deduped
    )


def spans_sorted_col(spans: Column) -> Column:
    """JVM-side: spans ordered by offset (whole-stage codegen, no UDF)."""
    return F.array_sort(
        spans,
        lambda l, r: F.when(l["offset"] < r["offset"], F.lit(-1))
        .when(l["offset"] > r["offset"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def content_sha1_col(spans: Column) -> Column:
    """JVM-side sha1 digest equal to content_sha1_py (tested)."""
    ordered_texts = F.transform(
        spans_sorted_col(spans), lambda s: F.coalesce(s["text"], F.lit(""))
    )
    return F.sha1(F.array_join(ordered_texts, SHA_SEP, ""))


def redirect_target_col(spans: Column) -> Column:
    """JVM-side redirect detection: single span of kind='redirect'."""
    first = spans_sorted_col(spans)[0]
    return F.when(
        (F.size(spans) == 1) & (first["kind"] == F.lit("redirect")),
        clean_link_col(F.coalesce(first["text"], F.lit(""))),
    ).otherwise(F.lit(None).cast("string"))


def has_text_span_col(spans: Column) -> Column:
    """Content-type gate analog: parse only docs with ≥1 text span
    (cocrawler/post_fetch.py† only parses text/html)."""
    return F.exists(spans, lambda s: s["kind"] == F.lit("text"))


def text_of_col(spans: Column) -> Column:
    """JVM twin of text_of: ' '-joined text of text-kind spans in
    ascending-offset order (the training-pipeline page-text source)."""
    return F.array_join(
        F.transform(
            F.filter(
                spans_sorted_col(spans), lambda s: s["kind"] == F.lit("text")
            ),
            lambda s: F.coalesce(s["text"], F.lit("")),
        ),
        " ",
    )
