"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F1).

Generates the ``pages`` table with columns exactly matching the
BASELINE.json input_hint: (url string, warc_ts timestamp, html binary,
text string, lang string). Duplicate structure:

- ~60% singletons;
- planted clusters of sizes 2-10 whose members are derived from a base
  text by token substitutions at controlled rates (pairwise shingle
  Jaccard straddles tau=0.9);
- one hot-domain/template cluster (>=5% of rows, shared boilerplate) to
  force band-key skew;
- a handful of exact byte-duplicates and empty/near-empty texts
  (zero-cardinality rows must be skipped like
  /root/reference/src/selection.cpp:281 does).

Everything is a pure function of (seed, n_rows); html wraps text so
extraction is a pure function of the bytes (byte-identity invariant).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

_BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

_WORDS = [
    "web", "page", "data", "spark", "scale", "crawl", "index", "token",
    "shingle", "sketch", "signature", "band", "bucket", "join", "shuffle",
    "partition", "cluster", "domain", "template", "boiler", "plate",
    "content", "article", "news", "story", "report", "update", "market",
    "price", "stock", "value", "trade", "global", "local", "region",
    "nation", "policy", "science", "energy", "climate", "health", "sport",
    "match", "score", "team", "player", "season", "record", "event",
    "music", "video", "image", "photo", "media", "social", "network",
    "server", "client", "browser", "mobile", "device", "search", "query",
]


def html_wrap(text: str) -> bytes:
    """Deterministic html wrapper; extract_text inverts it exactly."""
    return b"<html><head><title>t</title></head><body><p>" + text.encode("utf-8") + b"</p></body></html>"


def extract_text(html: bytes) -> str:
    """Pure function of the html bytes (byte-identity invariant vs oracle).

    Web analogue of the reference's record reader (SURVEY.md §2 S2):
    deterministic extraction between the fixed wrapper markers.
    """
    start = html.find(b"<p>") + 3
    end = html.rfind(b"</p>")
    if start < 3 or end < 0 or end < start:
        return ""
    return html[start:end].decode("utf-8", errors="replace")


@dataclass
class PageRow:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str


def _mk_text(rng: random.Random, n_tokens: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_tokens))


def _mutate(rng: random.Random, base_tokens: list[str], sub_rate: float) -> str:
    toks = list(base_tokens)
    for i in range(len(toks)):
        if rng.random() < sub_rate:
            toks[i] = rng.choice(_WORDS)
    return " ".join(toks)


def generate_pages(n_rows: int = 2000, seed: int = 42) -> tuple[list[PageRow], dict[str, int]]:
    """Return (rows, truth_cluster) where truth_cluster maps url ->
    planted cluster id (only urls in a planted duplicate cluster appear).

    Deterministic in (n_rows, seed). Cluster text lengths are large
    (200-400 tokens) so that token-substitution rate maps tightly onto
    shingle Jaccard.
    """
    rng = random.Random(seed)
    rows: list[PageRow] = []
    truth: dict[str, int] = {}
    cluster_id = 0
    i = 0

    def push(domain: str, text: str, lang: str = "en", cl: int | None = None):
        nonlocal i
        url = f"https://{domain}/p-{i:07d}"
        rows.append(
            PageRow(
                url=url,
                warc_ts=_BASE_TS + timedelta(seconds=i),
                html=html_wrap(text),
                text=text,
                lang=lang,
            )
        )
        if cl is not None:
            truth[url] = cl
        i += 1

    # hot-domain/template cluster: >=5% of rows, shared boilerplate,
    # near-identical bodies (exercises band-key skew + salting)
    hot_n = max(5, n_rows // 18)
    hot_base = _mk_text(rng, 300).split()
    for _ in range(hot_n):
        text = "hot template boilerplate header " + _mutate(rng, hot_base, 0.004) + " footer contact legal"
        push("hot.example.com", text, cl=cluster_id)
    cluster_id += 1

    # exact byte-duplicates (Jaccard 1.0)
    for _ in range(3):
        dup_text = _mk_text(rng, 250)
        for _ in range(rng.randint(2, 3)):
            push(f"dup{cluster_id}.example.org", dup_text, cl=cluster_id)
        cluster_id += 1

    # empty / near-empty texts (cardinality 0 at k=31 bytes)
    push("empty.example.net", "")
    push("empty.example.net", "tiny")
    push("empty.example.net", "")

    # planted clusters at controlled substitution rates. sub-rate to
    # char-shingle-jaccard is monotone; these straddle tau=0.9.
    sub_rates = [0.001, 0.004, 0.012, 0.05]
    while i < int(n_rows * 0.4):
        size = rng.randint(2, 10)
        base = _mk_text(rng, rng.randint(200, 400)).split()
        rate = rng.choice(sub_rates)
        lang = rng.choice(["en", "en", "en", "es", "de"])
        for _ in range(size):
            push(f"site{cluster_id % 97}.example.com", _mutate(rng, base, rate), lang, cl=cluster_id)
        cluster_id += 1

    # singletons
    while i < n_rows:
        lang = rng.choice(["en"] * 8 + ["es", "de"])
        push(f"single{i % 211}.example.org", _mk_text(rng, rng.randint(80, 350)), lang)

    return rows, truth


def pages_to_pandas(rows: list[PageRow]):
    import pandas as pd

    return pd.DataFrame(
        {
            "url": [r.url for r in rows],
            "warc_ts": [r.warc_ts for r in rows],
            "html": [r.html for r in rows],
            "text": [r.text for r in rows],
            "lang": [r.lang for r in rows],
        }
    )
