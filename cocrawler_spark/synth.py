"""Deterministic synthetic interleaved-document web (FIXTURES.md §1–§3).

Generates, from a single integer seed (default 42):
  - ``documents``: (doc_id, spans:array<struct<kind,text,media_ref,offset>>)
    with Zipf(s=1.2) host skew (hot-host tests), 3–20 spans/doc, text
    spans embedding 0–5 ``<a href="...">`` outlinks (80% same-host, 10%
    relative, 5% messy — fragments/default ports/uppercase hosts), ~8%
    single-span redirect docs exercising every special_redirect class,
    and media spans referencing /static/ assets.
  - ``robots_src``: per-host rules (~15% deny something, 2 hosts deny all,
    1 host forces longest-match allow-over-disallow).
  - ``seeds``: messy seed URLs (missing scheme, uppercase, fragments,
    duplicates-post-canonicalization, one robots-denied).

Everything is plain Python first (the oracle simulator consumes it
directly) and is written to parquet via pyarrow for the Spark engine —
identical bytes on every run for a given (seed, size).
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

SIZES = {
    # name: (n_hosts, n_docs)
    "tiny": (5, 60),
    "small": (40, 2000),
    "medium": (120, 20000),
    "bench": (400, 200000),
}

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua".split()
)


@dataclass
class SynthWeb:
    seed: int
    n_hosts: int
    docs: dict[str, list[dict]] = field(default_factory=dict)  # url -> spans
    robots: dict[str, dict] = field(default_factory=dict)  # host -> rules
    seeds: list[str] = field(default_factory=list)

    @property
    def hosts(self) -> list[str]:
        return [f"h{k}.test" for k in range(self.n_hosts)]


def _zipf_counts(rng: random.Random, n_hosts: int, n_docs: int, s: float = 1.2):
    weights = [1.0 / (k + 1) ** s for k in range(n_hosts)]
    total = sum(weights)
    counts = [max(1, int(round(n_docs * w / total))) for w in weights]
    # trim/pad deterministically to hit n_docs exactly
    i = 0
    while sum(counts) > n_docs:
        if counts[i % n_hosts] > 1:
            counts[i % n_hosts] -= 1
        i += 1
    i = 0
    while sum(counts) < n_docs:
        counts[i % n_hosts] += 1
        i += 1
    return counts


def _mk_target(rng: random.Random, host: str, hosts: list[str], counts: dict) -> str:
    """One outlink target with the FIXTURES messiness distribution."""
    if rng.random() < 0.8:
        t_host = host
    else:
        t_host = hosts[rng.randrange(len(hosts))]
    n = rng.randrange(max(1, counts.get(t_host, 1) + 3))  # some 404s
    r = rng.random()
    if r < 0.02:  # private/loopback targets the crawler must refuse
        return ("http://127.0.0.1/admin", "http://localhost/x",
                "http://10.1.2.3/p/0")[rng.randrange(3)]
    if r < 0.10 and t_host == host:
        return f"/p/{n}" if rng.random() < 0.7 else f"../p/{n}"
    url = f"http://{t_host}/p/{n}"
    if r < 0.15:  # 5% messy
        m = rng.random()
        if m < 0.34:
            url += "#frag"
        elif m < 0.67:
            url = f"http://{t_host}:80/p/{n}"
        else:
            url = f"http://{t_host.upper()}/p/{n}"
    return url


def _prose(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def generate(size: str = "small", seed: int = 42) -> SynthWeb:
    n_hosts, n_docs = SIZES[size] if isinstance(size, str) else size
    rng = random.Random(seed)
    web = SynthWeb(seed=seed, n_hosts=n_hosts)
    hosts = web.hosts
    counts_l = _zipf_counts(rng, n_hosts, n_docs)
    counts = dict(zip(hosts, counts_l))

    all_urls = [
        f"http://{h}/p/{n}" for h in hosts for n in range(counts[h])
    ]

    redirect_classes = (
        ["plain"] * 4 + ["addw"] * 2 + ["tohttps"] * 2 + ["same_surt"] + ["xhost"]
    )
    for h in hosts:
        for n in range(counts[h]):
            url = f"http://{h}/p/{n}"
            if rng.random() < 0.08:
                # single-span redirect doc
                cls = redirect_classes[rng.randrange(len(redirect_classes))]
                if cls == "plain":
                    tgt = f"http://{h}/p/{rng.randrange(counts[h])}"
                elif cls == "addw":
                    tgt = f"http://www.{h}/p/{n}"
                elif cls == "tohttps":
                    tgt = f"https://{h}/p/{n}"
                elif cls == "same_surt":
                    tgt = f"http://{h}:80/p/{n}#top"
                else:
                    oh = hosts[rng.randrange(len(hosts))]
                    tgt = f"http://{oh}/p/{rng.randrange(counts[oh])}"
                web.docs[url] = [
                    {"kind": "redirect", "text": tgt, "media_ref": "", "offset": 0}
                ]
                continue
            n_spans = rng.randint(3, 20)
            spans = []
            for off in range(n_spans):
                r = rng.random()
                if r < 0.25:
                    ext = ("png", "css", "js")[rng.randrange(3)]
                    spans.append(
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": f"http://{h}/static/{rng.randrange(50)}.{ext}",
                            "offset": off,
                        }
                    )
                else:
                    n_links = rng.randint(0, 5)
                    parts = [_prose(rng, rng.randint(3, 10))]
                    for _ in range(n_links):
                        t = _mk_target(rng, h, hosts, counts)
                        parts.append(f'<a href="{t}">{_prose(rng, 2)}</a>')
                        parts.append(_prose(rng, rng.randint(1, 5)))
                    spans.append(
                        {
                            "kind": "text",
                            "text": " ".join(parts),
                            "media_ref": "",
                            "offset": off,
                        }
                    )
            # shuffle storage order; ascending-offset is the semantic order
            rng.shuffle(spans)
            web.docs[url] = spans

    # robots: ~70% of hosts have an entry
    deny_all = set(hosts[1:3]) if n_hosts >= 3 else set()
    longest_match_host = hosts[3] if n_hosts >= 4 else None
    for h in hosts:
        if rng.random() < 0.30 and h not in deny_all and h != longest_match_host:
            continue
        rules = {
            "crawl_delay": (0.5, 1.0, 2.0)[rng.randrange(3)],
            "ttl_waves": (2, 3, 5)[rng.randrange(3)],
            "disallow": [],
            "allow": [],
        }
        if h in deny_all:
            rules["disallow"] = ["/"]
        elif h == longest_match_host:
            rules["disallow"] = ["/"]
            rules["allow"] = ["/p/"]
        elif rng.random() < 0.15:
            rules["disallow"] = [f"/p/{rng.randrange(3)}"]
        web.robots[h] = rules

    # One host carries RFC 9309 wildcard rules (* and trailing $) so the
    # wildcard matcher is exercised on every synthetic web. Applied as a
    # deterministic post-pass with ZERO rng draws, so the random stream —
    # and therefore every other table (docs, seeds) — is byte-identical
    # to the wildcard-free generator. Engine and simulator share
    # robots_allowed_py, so engine/sim equality holds by construction.
    if n_hosts >= 5:
        wh = hosts[4]
        ent = web.robots.setdefault(
            wh,
            {"crawl_delay": 1.0, "ttl_waves": 3, "disallow": [], "allow": []},
        )
        # blocks /p/1, /p/11, /p/21, ... exactly (trailing anchor); the
        # longer allow rule re-admits /p/*11 (e.g. /p/11, /p/211)
        ent["disallow"] = list(ent["disallow"]) + ["/p/*1$"]
        ent["allow"] = list(ent["allow"]) + ["/p/*11$"]

    # seeds: messy variants of real URLs
    n_seeds = 3 if n_docs <= 60 else 25
    pool = [u for u in all_urls if u in web.docs]
    chosen = [pool[rng.randrange(len(pool))] for _ in range(n_seeds)]
    for i, u in enumerate(chosen):
        host = u.split("//")[1].split("/")[0]
        path = "/" + u.split("//")[1].split("/", 1)[1]
        style = i % 5
        if style == 0:
            web.seeds.append(u)
        elif style == 1:
            web.seeds.append(u.replace("http://", ""))  # missing scheme
        elif style == 2:
            web.seeds.append(f"http://{host.upper()}{path}#frag")
        elif style == 3:
            web.seeds.append(f"  http://{host}:80{path}  ")
        else:
            web.seeds.append(u)  # duplicate-prone
    if deny_all:
        web.seeds.append(f"http://{next(iter(sorted(deny_all)))}/p/0")
    return web


# ---------------------------------------------------------------------------
# parquet materialization (pyarrow — identical schema to schema.DOCUMENTS)
# ---------------------------------------------------------------------------

SPAN_PA = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def write_parquet(web: SynthWeb, out_dir: str) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    doc_ids = list(web.docs.keys())
    spans_py = [
        [
            {
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": s["media_ref"],
                "offset": s["offset"],
            }
            for s in web.docs[u]
        ]
        for u in doc_ids
    ]
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_py, pa.list_(SPAN_PA)),
        }
    )
    # Shard the corpus into multiple part files: Spark plans input
    # splits per FILE for small files (an 11 MB single file is one
    # split at the default 128 MB maxPartitionBytes), and a single
    # split serializes every whole-corpus scan — the distillate parse
    # ran on one core of 32 before this. A real web corpus is never
    # one file; one shard per ~500 docs keeps tiny test webs at a
    # single file while bench-size corpora scan in parallel.
    n_shards = max(1, min(32, len(doc_ids) // 500))
    paths["documents"] = os.path.join(out_dir, "documents_spans.parquet")
    if n_shards == 1:
        pq.write_table(docs_tbl, paths["documents"])
    else:
        os.makedirs(paths["documents"], exist_ok=True)
        per = (len(doc_ids) + n_shards - 1) // n_shards
        for s in range(n_shards):
            pq.write_table(
                docs_tbl.slice(s * per, per),
                os.path.join(paths["documents"], f"part-{s:05d}.parquet"),
            )

    hosts = sorted(web.robots.keys())
    robots_tbl = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "crawl_delay": pa.array(
                [web.robots[h]["crawl_delay"] for h in hosts], pa.float64()
            ),
            "ttl_waves": pa.array(
                [web.robots[h]["ttl_waves"] for h in hosts], pa.int32()
            ),
            "disallow": pa.array(
                [web.robots[h]["disallow"] for h in hosts], pa.list_(pa.string())
            ),
            "allow": pa.array(
                [web.robots[h]["allow"] for h in hosts], pa.list_(pa.string())
            ),
        }
    )
    paths["robots_src"] = os.path.join(out_dir, "robots_src.parquet")
    pq.write_table(robots_tbl, paths["robots_src"])

    seeds_tbl = pa.table({"url": pa.array(web.seeds, pa.string())})
    paths["seeds"] = os.path.join(out_dir, "seeds.parquet")
    pq.write_table(seeds_tbl, paths["seeds"])
    return paths


def generate_parquet(out_dir: str, size: str = "small", seed: int = 42):
    """Generate-if-absent cache keyed by (size, seed) under out_dir."""
    tag = os.path.join(out_dir, f"{size}_{seed}")
    marker = os.path.join(tag, "_SUCCESS")
    if not os.path.exists(marker):
        web = generate(size, seed)
        write_parquet(web, tag)
        with open(marker, "w") as f:
            f.write("ok")
    return {
        "documents": os.path.join(tag, "documents_spans.parquet"),
        "robots_src": os.path.join(tag, "robots_src.parquet"),
        "seeds": os.path.join(tag, "seeds.parquet"),
    }
