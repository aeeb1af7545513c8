"""Text-analysis functions for large-scale training-data pipelines —
all pure JVM column expressions (whole-stage codegen; no Python in the
hot path), each with an exact DuckDB-SQL twin used by the driver's
correctness oracle.

These extend the reference's scope (a crawler has no corpus analytics)
with the operations a 100 TB crawl→training-data pipeline needs:
language ID, quality scoring, token counting, document fingerprinting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# md5-based 60-bit hash — the Spark/DuckDB-portable workhorse for
# shingle/minhash/simhash ops (sha1 is unavailable in DuckDB)
# ---------------------------------------------------------------------------

def md5_hash64_col(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash64_sql(expr: str) -> str:
    """DuckDB twin of md5_hash64_col."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"


# ---------------------------------------------------------------------------
# tokenization (identical regex semantics in Spark and DuckDB)
# ---------------------------------------------------------------------------

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text: Column) -> Column:
    """lowercase word tokens; empty strings removed."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def token_count_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# ---------------------------------------------------------------------------
# language ID — stopword-overlap heuristic (n-gram-free, exact-SQL-able)
# ---------------------------------------------------------------------------

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "pour", "dans", "une", "que"],
    "es": ["el", "los", "las", "es", "por", "para", "una", "con", "del", "se"],
}


def lang_scores_col(text: Column) -> dict[str, Column]:
    toks = tokens_col(text)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def langid_col(text: Column) -> Column:
    """argmax language by distinct-stopword overlap; ties and zero-overlap
    resolve to 'und' / lexicographically smallest (deterministic)."""
    scores = lang_scores_col(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("s"), F.lit(lang).alias("l"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(pairs)
    # array_max on struct compares (s, l) lexicographically: highest score,
    # then lexicographically greatest lang — deterministic. zero ⇒ 'und'.
    return F.when(best["s"] <= 0, F.lit("und")).otherwise(best["l"])


def langid_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    structs = ", ".join(
        "{'s': len(list_intersect(t, ["
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"])), 'l': '{lang}'}}"
        for lang in sorted(STOPWORDS)
    )
    return (
        f"(SELECT CASE WHEN m.s <= 0 THEN 'und' ELSE m.l END FROM "
        f"(SELECT list_max([{structs}]) AS m FROM (SELECT {toks} AS t)))"
    )


# ---------------------------------------------------------------------------
# quality scoring — length / punctuation / stopword ratios
# ---------------------------------------------------------------------------

def quality_cols(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6),
        "mean_token_len": F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ),
    }


# ---------------------------------------------------------------------------
# repetition signals — Gopher-style duplicate n-gram fractions
# ---------------------------------------------------------------------------

def _ngrams_col(toks: Column, n: int) -> Column:
    """word n-grams of a token array; short docs fall back to one
    (shorter) gram — the same convention as shingle_hashes_col."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def repetition_cols(text: Column) -> dict[str, Column]:
    """Duplicate n-gram fractions (1 - distinct/total for n = 1, 2, 3):
    the machine-generated / boilerplate text signal from the Gopher
    quality rules (Rae et al. 2021, §A1.1) — high values mean the doc
    repeats itself. Pure JVM expressions, linear in doc length."""
    toks = tokens_col(text)
    out: dict[str, Column] = {}
    for n, name in ((1, "dup_token_frac"), (2, "dup_bigram_frac"), (3, "dup_trigram_frac")):
        g = _ngrams_col(toks, n)
        out[name] = F.round(
            F.lit(1.0) - F.size(F.array_distinct(g)) / F.greatest(F.size(g), F.lit(1)),
            6,
        )
    return out


def repetition_sql(expr: str) -> str:
    """DuckDB twin of repetition_cols (same short-doc fallback)."""
    cols = []
    for n, name in ((1, "dup_token_frac"), (2, "dup_bigram_frac"), (3, "dup_trigram_frac")):
        g = (
            f"list_transform(range(1, greatest(len(t) - {n - 1}, 1) + 1), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' '))"
        )
        cols.append(
            f"ROUND(1.0 - len(list_distinct({g})) / greatest(len({g}), 1), 6) AS {name}"
        )
    return f"SELECT doc_id, {', '.join(cols)} FROM (SELECT doc_id, {tokens_sql(expr)} AS t FROM documents)"


# ---------------------------------------------------------------------------
# PII scrubbing — regex redaction (emails, IPv4), dialect-portable patterns
# ---------------------------------------------------------------------------

# Patterns restricted to the syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically: char classes, bounded repetition, \b word
# boundaries — no lookaround, no backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_cols(text: Column) -> dict[str, Column]:
    """Counts + redacted text for the standard pre-training scrub:
    emails → <EMAIL>, IPv4 → <IP>. Emails are redacted first so an
    address's host part is never half-eaten by the IP pass."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    n_ips = F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return {
        "n_emails": n_emails.cast("int"),
        "n_ips": n_ips.cast("int"),
        "redacted": redacted,
    }


def pii_sql(expr: str) -> str:
    """DuckDB twin of pii_cols over a text expression."""
    e, i = EMAIL_RE.replace("'", "''"), IPV4_RE.replace("'", "''")
    return (
        f"CAST(len(regexp_extract_all({expr}, '{e}')) AS INT) AS n_emails, "
        f"CAST(len(regexp_extract_all({expr}, '{i}')) AS INT) AS n_ips, "
        f"regexp_replace(regexp_replace({expr}, '{e}', '<EMAIL>', 'g'), "
        f"'{i}', '<IP>', 'g') AS redacted"
    )


# ---------------------------------------------------------------------------
# document fingerprint — min over word-shingle hashes (rolling-hash analog)
# ---------------------------------------------------------------------------

def fingerprint_col(text: Column, n: int = 3) -> Column:
    """min_{i} md5h(shingle_i) over word n-gram shingles; short docs fall
    back to hashing the whole token array."""
    toks = tokens_col(text)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_min(F.transform(shingles, md5_hash64_col))


def fingerprint_sql(expr: str, n: int = 3) -> str:
    toks = tokens_sql(expr)
    shingle = "array_to_string(t[i:i+" + str(n - 1) + "], ' ')"
    inner = md5_hash64_sql(shingle)
    return (
        f"(SELECT list_min(list_transform(range(1, greatest(len(t) - {n - 1}, 1) + 1), "
        f"i -> {inner})) FROM (SELECT {toks} AS t))"
    )


# ---------------------------------------------------------------------------
# character-level entropy (zero-shuffle repetition/garbage signal)
# ---------------------------------------------------------------------------


def char_entropy_cols(text: Column) -> dict[str, Column]:
    """Per-doc character-unigram Shannon entropy (nats) + distinct-char
    count — the classic low-entropy spam/repetition signal ("aaaa…",
    padded separators) and its high-entropy dual (base64/binary junk).

    Zero-shuffle by construction: counts come from the
    occurrences(ch) = len(text) - len(remove(text, ch)) identity folded
    over the distinct-char array INSIDE the row — map-only, whole-stage
    codegen, O(distinct_chars × len) per row. At 10^10 docs this scores
    at scan speed; no explode, no groupBy. (A per-char explode would
    shuffle ~len(text) rows per doc for the same answer.)"""
    n = F.length(text)
    uniq = F.array_distinct(F.filter(F.split(text, ""), lambda c: c != ""))

    def _plogp(ch: Column) -> Column:
        p = (n - F.length(F.replace(text, ch, F.lit("")))) / n.cast("double")
        return p * F.log(p)

    ent = F.when(n > 0, -F.aggregate(
        uniq, F.lit(0.0), lambda acc, ch: acc + _plogp(ch)
    )).otherwise(F.lit(0.0))
    return {
        "n_chars": n.cast("long"),
        "n_distinct_chars": F.size(uniq),
        "char_entropy": F.round(ent, 6),
    }


def char_entropy_sql(expr: str) -> str:
    """DuckDB twin of char_entropy_cols (select-list fragment producing
    the same three columns)."""
    # list_filter matches the Spark side's F.filter(..., c != ""): DuckDB's
    # string_split('', '') yields [''] so an unfiltered distinct would count
    # 1 char on empty text where Spark counts 0.
    u = f"list_distinct(list_filter(string_split({expr}, ''), c -> c <> ''))"
    p = (
        f"(length({expr}) - length(replace({expr}, ch, '')))"
        f" / CAST(length({expr}) AS DOUBLE)"
    )
    ent = (
        f"CASE WHEN length({expr}) > 0 THEN "
        f"-list_aggregate(list_transform({u}, ch -> ({p}) * ln({p})), 'sum')"
        f" ELSE 0.0 END"
    )
    return (
        f"CAST(length({expr}) AS BIGINT) AS n_chars, "
        f"CAST(len({u}) AS INT) AS n_distinct_chars, "
        f"ROUND({ent}, 6) AS char_entropy"
    )


# ---------------------------------------------------------------------------
# Unicode normalization (the one text op with no JVM builtin)
# ---------------------------------------------------------------------------

# Explicit class on BOTH sides (Python re here, RE2 in the DuckDB twin)
# so the collapse is engine-independent: ASCII whitespace + NBSP.
_WS_RUN_PATTERN = r"[ \t\r\n\f\x0b\xa0]+"


def normalize_text_py(s: str) -> str:
    """NFC-normalize (UAX #15), collapse whitespace runs (incl. NBSP)
    to single spaces, strip ends. The canonical first step of a text
    pipeline: dedup/fingerprint/langid all assume composed codepoints
    and uniform spacing."""
    import re
    import unicodedata

    return re.sub(_WS_RUN_PATTERN, " ", unicodedata.normalize("NFC", s or "")).strip()


def normalize_text_udf():
    """Arrow-batched pandas UDF for :func:`normalize_text_py`.

    Spark has no NFC builtin, so this is the documented slow-path
    exception (SURVEY §2j discipline: vectorized Arrow batches, never
    row-at-a-time). DuckDB twin: trim(regexp_replace(nfc_normalize(x),
    '<same class>', ' ', 'g')) — RE2 parses the identical escape
    sequence, pinned by the sitemap/normalize unit tests.
    """
    import re
    import unicodedata

    from pyspark.sql.types import StringType

    rx = re.compile(_WS_RUN_PATTERN)

    @F.pandas_udf(StringType())
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: rx.sub(" ", unicodedata.normalize("NFC", v)).strip()
            if v is not None
            else None
        )

    return norm


def normalize_text_sql(expr: str) -> str:
    """DuckDB twin of normalize_text_udf (same op order: NFC first,
    then one collapse pass, then trim)."""
    return (
        f"trim(regexp_replace(nfc_normalize({expr}), "
        f"'{_WS_RUN_PATTERN}', ' ', 'g'))"
    )


# ---------------------------------------------------------------------------
# Gopher composite quality gate — the published rule set as ONE pass
# ---------------------------------------------------------------------------

GOPHER_RULES = (
    # (name, default threshold) — evaluation order IS the reason order
    ("too_few_tokens", 30),       # n_tokens < t
    ("too_many_tokens", 100_000), # n_tokens > t
    ("mean_token_len_low", 3.0),  # mean token length < t
    ("mean_token_len_high", 10.0),# mean token length > t
    ("alpha_word_frac", 0.8),     # frac of tokens containing a letter < t
    ("stopwords", 1),             # count of stoplist tokens < t
    ("dup_trigrams", 0.05),       # duplicate-trigram fraction > t
)


def gopher_gate_cols(text: Column, thresholds: dict | None = None) -> dict[str, Column]:
    """A Gopher-STYLE quality gate (after Rae et al. 2021, §A1.1) with
    repo defaults — NOT a faithful reproduction of the published
    thresholds: min word count defaults to 30 (paper: 50), the stopword
    rule requires ≥1 hit against this repo's 10-word stoplist (paper:
    ≥2 of its 8-word list), and the paper's symbol-ratio, ellipsis-line
    and bullet-line rules are intentionally out of scope here (the
    repetition side lives in repetition/top_ngram_char_frac ops).
    Callers wanting published-threshold behavior pass ``thresholds``.
    The gate composes: token-count window, mean word length window,
    alphabetic-word fraction, stopword presence, duplicate-trigram
    fraction. Returns (n_tokens, keep, reason) where
    ``reason`` is the FIRST failing rule in GOPHER_RULES order (null
    when the doc passes). Every signal is a JVM column expression over
    one tokenization — the whole gate is a zero-shuffle map."""
    t = {k: v for k, v in GOPHER_RULES}
    t.update(thresholds or {})
    toks = tokens_col(text)
    n = F.size(toks).cast("long")
    mtl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    ).cast("double") / F.greatest(n, F.lit(1))
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
        / F.greatest(n, F.lit(1))
    )
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    g3 = _ngrams_col(toks, 3)
    dup3 = F.lit(1.0) - F.size(F.array_distinct(g3)) / F.greatest(
        F.size(g3), F.lit(1)
    )
    checks = [
        ("too_few_tokens", n < int(t["too_few_tokens"])),
        ("too_many_tokens", n > int(t["too_many_tokens"])),
        ("mean_token_len_low", mtl < float(t["mean_token_len_low"])),
        ("mean_token_len_high", mtl > float(t["mean_token_len_high"])),
        ("alpha_word_frac", alpha_frac < float(t["alpha_word_frac"])),
        ("stopwords", n_stop < int(t["stopwords"])),
        ("dup_trigrams", dup3 > float(t["dup_trigrams"])),
    ]
    reason = None
    for name, cond in checks:
        reason = F.when(cond, name) if reason is None else reason.when(cond, name)
    reason = reason.otherwise(F.lit(None).cast("string"))
    return {"n_tokens": n, "reason": reason, "keep": reason.isNull()}


def gopher_gate_sql(expr: str, thresholds: dict | None = None) -> str:
    """DuckDB twin of gopher_gate_cols — a full SELECT over documents
    producing (doc_id, n_tokens, keep, reason)."""
    t = {k: v for k, v in GOPHER_RULES}
    t.update(thresholds or {})
    en_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    g3 = (
        "list_transform(range(1, greatest(len(tk) - 2, 1) + 1), "
        "i -> array_to_string(tk[i:i+2], ' '))"
    )
    checks = [
        ("too_few_tokens", f"n < {int(t['too_few_tokens'])}"),
        ("too_many_tokens", f"n > {int(t['too_many_tokens'])}"),
        ("mean_token_len_low", f"mtl < {float(t['mean_token_len_low'])}"),
        ("mean_token_len_high", f"mtl > {float(t['mean_token_len_high'])}"),
        ("alpha_word_frac", f"af < {float(t['alpha_word_frac'])}"),
        ("stopwords", f"ns < {int(t['stopwords'])}"),
        ("dup_trigrams", f"d3 > {float(t['dup_trigrams'])}"),
    ]
    cases = " ".join(f"WHEN {cond} THEN '{name}'" for name, cond in checks)
    return f"""
WITH t AS (SELECT doc_id, {tokens_sql(expr)} AS tk FROM documents),
sig AS (
  SELECT doc_id,
    CAST(len(tk) AS BIGINT) AS n,
    CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
      / greatest(len(tk), 1) AS mtl,
    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
      / greatest(len(tk), 1) AS af,
    len(list_filter(tk, x -> list_contains([{en_list}], x))) AS ns,
    1.0 - len(list_distinct({g3})) / greatest(len({g3}), 1) AS d3
  FROM t),
lab AS (SELECT doc_id, n, CASE {cases} ELSE NULL END AS reason FROM sig)
SELECT doc_id, n AS n_tokens, reason IS NULL AS keep, reason FROM lab"""


def top_ngram_char_frac_cols(
    text: Column, ns: tuple = (2, 3), max_tokens: int = 100_000
) -> dict[str, Column]:
    """The other half of the Gopher repetition rules (Rae et al. 2021
    §A1.1): the fraction of the document's characters contained in its
    MOST FREQUENT word n-gram (count · len(gram) / n_chars). Template
    pages repeating one navigation phrase light this up even when the
    overall duplicate-gram fraction stays low. Winner = max count, ties
    broken toward the lexicographically larger gram (array_max struct
    order — mirrored exactly in the DuckDB twin). Computed INSIDE the
    row (distinct grams × occurrence count via filter-size), so the
    whole signal is a zero-shuffle map; per-row cost is O(grams ·
    distinct grams) on ordinary docs. ``max_tokens`` (the Gopher gate's
    too-many-tokens ceiling by default) bounds that product — a
    pathological multi-million-token doc is scored on its first
    ``max_tokens`` words instead of stalling an executor core; the SQL
    twin applies the identical truncation."""
    toks = F.slice(tokens_col(text), 1, int(max_tokens))
    n_chars = F.greatest(F.length(text), F.lit(1))
    out: dict[str, Column] = {}
    for n in ns:
        g = _ngrams_col(toks, n)
        d = F.array_distinct(g)
        best = F.array_max(
            F.transform(
                d,
                lambda x: F.struct(
                    F.size(F.filter(g, lambda y: y == x)).alias("c"),
                    x.alias("gr"),
                ),
            )
        )
        frac = (best["c"] * F.length(best["gr"])).cast("double") / n_chars
        out[f"top_{n}gram_char_frac"] = F.round(frac, 6)
    return out


def top_ngram_char_frac_sql(
    expr: str, ns: tuple = (2, 3), max_tokens: int = 100_000
) -> str:
    """DuckDB twin of top_ngram_char_frac_cols — full SELECT over
    documents producing (doc_id, top_2gram_char_frac, ...) from the
    column/expression ``expr``, with the same ``max_tokens`` cap."""
    cols = []
    for n in ns:
        g = (
            f"list_transform(range(1, greatest(len(tk) - {n - 1}, 1) + 1), "
            f"i -> array_to_string(tk[i:i+{n - 1}], ' '))"
        )
        best = (
            f"list_max(list_transform(list_distinct({g}), "
            f"x -> {{'c': len(list_filter({g}, y -> y = x)), 'gr': x}}))"
        )
        cols.append(
            f"ROUND(({best}).c * length(({best}).gr) "
            f"/ CAST(greatest(length(_txt), 1) AS DOUBLE), 6) "
            f"AS top_{n}gram_char_frac"
        )
    return (
        f"SELECT doc_id, {', '.join(cols)} "
        f"FROM (SELECT doc_id, {expr} AS _txt, "
        f"({tokens_sql(expr)})[1:{int(max_tokens)}] AS tk FROM documents)"
    )
