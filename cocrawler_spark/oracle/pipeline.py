"""Pure-Python mirror of plans/pipeline.train_data_pipeline — the
correctness oracle for the end-to-end training-data chain.

Bit-compatible with the Spark plan by construction: the same md5-based
60-bit hash (int(md5hex[:15], 16) == conv(substr(md5(x),1,15),16,10)),
the same tokenizer regex, the same shingle/band formulas, the same
min-id survivor rules. tests/test_engine_oracle.py asserts the Spark
pipeline's surviving doc set equals this mirror's on the simulator's
fetched set.
"""

from __future__ import annotations

import hashlib
import re

TOKEN_RE = re.compile(r"[^a-z0-9]+")

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "pour", "dans", "une", "que"],
    "es": ["el", "los", "las", "es", "por", "para", "una", "con", "del", "se"],
}


def md5h(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def tokens(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


def shingle_hashes(text: str, n: int = 3) -> list[int]:
    """Distinct hashed word n-grams, first-occurrence order (mirrors
    shingle_hashes_col: slice windows 1..max(len-n+1, 1))."""
    toks = tokens(text)
    upper = max(len(toks) - (n - 1), 1)
    seen: set[int] = set()
    out: list[int] = []
    for i in range(upper):
        h = md5h(" ".join(toks[i:i + n]))
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out


def minhash_sig(text: str, k: int = 8, shingle_n: int = 3) -> list[int] | None:
    sh = shingle_hashes(text, shingle_n)
    if not sh:
        return None
    return [min(md5h(f"{i}:{s}") for s in sh) for i in range(k)]


def quality(text: str) -> dict:
    toks = tokens(text)
    n_chars = len(text)
    n_alpha = sum(1 for c in text if c.isascii() and c.isalpha())
    en = set(STOPWORDS["en"])
    n_stop = sum(1 for t in toks if t in en)
    return {
        "n_tokens": len(toks),
        "alpha_ratio": round(n_alpha / max(n_chars, 1), 6),
        "stopword_ratio": round(n_stop / max(len(toks), 1), 6),
    }


def langid(text: str) -> str:
    toks = set(tokens(text))
    # mirrors langid_col's array_max over (score, lang) structs:
    # highest score, then lexicographically greatest lang; 0 → 'und'
    best = max((len(toks & set(w)), lang) for lang, w in STOPWORDS.items())
    return "und" if best[0] <= 0 else best[1]


def train_pipeline_mirror(
    docs: dict[str, str],
    minhash_k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = 1024,
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    langs: tuple[str, ...] = ("en",),
    neardup: str = "pairwise",
    survivor: str = "min_id",
    eval_texts: list[str] | None = None,
) -> set[str]:
    """docs: {id: text} → set of surviving ids. neardup='components'
    mirrors the transitive connected-components survivor rule
    (union-find over the candidate pairs, keep each component's min).
    survivor='quality' keeps each component's most-token member
    instead (ties min id), mirroring keep_best_representative.
    eval_texts mirrors the optional decontamination stage: survivors
    sharing any shingle with the eval set are dropped."""
    # 1. exact collapse: min-id representative per byte-identical text
    by_text: dict[str, str] = {}
    for i in sorted(docs):
        t = docs[i]
        key = hashlib.md5(t.encode("utf-8")).hexdigest()
        if key not in by_text or i < by_text[key]:
            by_text[key] = i
    reps = {i: docs[i] for i in by_text.values()}

    # 2. LSH banding; drop the larger id of every candidate pair
    rows_per_band = minhash_k // bands
    buckets: dict[tuple[int, str], list[str]] = {}
    for i, t in reps.items():
        sig = minhash_sig(t, minhash_k, shingle_n)
        if sig is None:
            continue
        for b in range(bands):
            cols = sig[b * rows_per_band:(b + 1) * rows_per_band]
            bkey = hashlib.md5(",".join(str(c) for c in cols).encode()).hexdigest()
            buckets.setdefault((b, bkey), []).append(i)
    losers: set[str] = set()
    if neardup == "components" or survivor == "quality":
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for members in buckets.values():
            if len(members) < 2:
                continue
            if max_bucket is not None and len(members) > max_bucket:
                continue
            ra = find(members[0])
            for m in members[1:]:
                rb = find(m)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
                    ra = lo
        comp: dict[str, list[str]] = {}
        for x in list(parent):
            comp.setdefault(find(x), []).append(x)
        for root, members in comp.items():
            all_m = members + [root]
            if survivor == "quality":
                keep = min(all_m, key=lambda m: (-quality(reps[m])["n_tokens"], m))
            else:
                keep = min(all_m)
            losers.update(m for m in all_m if m != keep)
    else:
        for members in buckets.values():
            if len(members) < 2:
                continue
            if max_bucket is not None and len(members) > max_bucket:
                continue
            keep = min(members)
            losers.update(m for m in members if m != keep)
    survivors = {i: t for i, t in reps.items() if i not in losers}

    # 2c. optional decontamination: any shingle shared with the eval set
    if eval_texts is not None:
        eval_sh: set[int] = set()
        for t in eval_texts:
            eval_sh.update(shingle_hashes(t, shingle_n))
        survivors = {
            i: t
            for i, t in survivors.items()
            if not (set(shingle_hashes(t, shingle_n)) & eval_sh)
        }

    # 3+4. quality + language gates
    out: set[str] = set()
    for i, t in survivors.items():
        q = quality(t)
        if (
            q["n_tokens"] >= min_tokens
            and q["alpha_ratio"] >= min_alpha_ratio
            and q["stopword_ratio"] >= min_stopword_ratio
            and langid(t) in langs
        ):
            out.add(i)
    return out


def band_keys_mirror(text: str, k: int = 8, bands: int = 4, shingle_n: int = 3):
    """(band, bkey) set of one doc — mirrors operators/dedup.band_keys."""
    sig = minhash_sig(text, k, shingle_n)
    if sig is None:
        return set()
    rows = k // bands
    out = set()
    for b in range(bands):
        cols = sig[b * rows:(b + 1) * rows]
        out.add((b, hashlib.md5(",".join(str(c) for c in cols).encode()).hexdigest()))
    return out


def incremental_pipeline_mirror(
    batches: list[dict[str, str]],
    minhash_k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = 1024,
    min_tokens: int = 5,
    min_alpha_ratio: float = 0.5,
    min_stopword_ratio: float = 0.0,
    langs: tuple[str, ...] = ("en",),
) -> list[set[str]]:
    """Mirror of plans/pipeline.train_data_pipeline_incremental:
    first-seen wins across batches, min-id within a batch. Returns the
    surviving id set per batch."""
    hashes: set[str] = set()
    buckets: set[tuple[int, str]] = set()
    out: list[set[str]] = []
    for docs in batches:
        # 1. exact: drop prior-batch dups, min-id rep per hash in batch
        fresh = {
            i: t
            for i, t in docs.items()
            if hashlib.md5(t.encode("utf-8")).hexdigest() not in hashes
        }
        by_h: dict[str, str] = {}
        for i in sorted(fresh):
            key = hashlib.md5(fresh[i].encode("utf-8")).hexdigest()
            if key not in by_h or i < by_h[key]:
                by_h[key] = i
        reps = {i: fresh[i] for i in by_h.values()}
        rep_bands = {
            i: band_keys_mirror(t, minhash_k, bands, shingle_n)
            for i, t in reps.items()
        }
        # 2. near-dup: state-occupied bucket drops; then batch-local
        # pairwise min-id among the remaining reps
        state_hit = {i for i, bs in rep_bands.items() if bs & buckets}
        local: dict[tuple[int, str], list[str]] = {}
        for i, bs in rep_bands.items():
            if i in state_hit:
                continue
            for bk in bs:
                local.setdefault(bk, []).append(i)
        losers: set[str] = set()
        for members in local.values():
            if len(members) < 2:
                continue
            if max_bucket is not None and len(members) > max_bucket:
                continue
            keep = min(members)
            losers.update(m for m in members if m != keep)
        survivors = {
            i: t
            for i, t in reps.items()
            if i not in state_hit and i not in losers
        }
        # 3. gates
        kept: set[str] = set()
        for i, t in survivors.items():
            q = quality(t)
            if (
                q["n_tokens"] >= min_tokens
                and q["alpha_ratio"] >= min_alpha_ratio
                and q["stopword_ratio"] >= min_stopword_ratio
                and langid(t) in langs
            ):
                kept.add(i)
        out.append(kept)
        # 4. state absorbs the whole batch
        hashes.update(
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in docs.values()
        )
        for bs in rep_bands.values():
            buckets.update(bs)
    return out
