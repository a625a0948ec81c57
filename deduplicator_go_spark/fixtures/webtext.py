"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Generates ``documents(url, warc_ts, html, text, lang)`` — exactly the
input shape mandated by BASELINE.json:input_hint — plus ground truth
(``truth_pairs``, ``truth_clusters``) for recall / cluster-equivalence
assertions.  Pure numpy + python, seeded; no external data.

``text`` is a pure function of ``html`` (template wrap, see
``render_html`` / the extraction in functions/text.py) so extraction
can be golden-tested byte-identical per url — the per-row invariant
from BASELINE.json.

Injected duplicate structure mirrors the reference's test corpus
(/root/reference/files/duplicates_scenarios_test.go:17-135 — same
content across hosts/paths; :60 — same hash different size splits
groups) extended with the near-dup / shared-substring / hot-band
classes the north rule requires.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

EPOCH = pd.Timestamp("2025-01-01 00:00:00")

# fraction of docs per fixture class (FIXTURES.md §2)
FRAC_EXACT = 0.10
FRAC_NEAR = 0.10
FRAC_SUBSTR = 0.05
FRAC_SAMELEN = 0.05
FRAC_TEMPLATE = 0.02
FRAC_EDGE = 0.03

N_DOMAINS = 20
CATEGORIES = ["news", "blog", "docs", "shop", "forum"]
LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "unk"]


def _vocab(rng: np.random.Generator, size: int = 5000) -> np.ndarray:
    syll = np.array(
        ["ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
         "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
         "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
         "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
         "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu"]
    )
    n_syll = rng.integers(2, 5, size=size)
    words = ["".join(rng.choice(syll, k)) for k in n_syll]
    # disambiguate collisions deterministically
    seen: dict[str, int] = {}
    out = []
    for w in words:
        c = seen.get(w, 0)
        seen[w] = c + 1
        out.append(w if c == 0 else f"{w}{c}")
    return np.array(out)


def _salad(rng: np.random.Generator, vocab: np.ndarray, min_chars: int, max_chars: int) -> list[str]:
    """One document body: list of tokens totalling ~[min_chars, max_chars]."""
    target = int(rng.integers(min_chars, max_chars + 1))
    # avg word ~7 chars + space
    n = max(3, target // 8)
    idx = rng.integers(0, len(vocab), size=n)
    return [str(vocab[i]) for i in idx]


def _edit_tokens(rng: np.random.Generator, tokens: list[str], vocab: np.ndarray, rate: float) -> list[str]:
    """Seeded token-level edits (swap/insert/delete) at ``rate``."""
    out = list(tokens)
    n_edits = max(1, int(len(out) * rate))
    for _ in range(n_edits):
        op = int(rng.integers(0, 3))
        pos = int(rng.integers(0, len(out)))
        if op == 0:  # substitute
            out[pos] = str(vocab[int(rng.integers(0, len(vocab)))])
        elif op == 1 and len(out) > 4:  # delete
            out.pop(pos)
        else:  # insert
            out.insert(pos, str(vocab[int(rng.integers(0, len(vocab)))]))
    return out


def _url(rng: np.random.Generator, i: int) -> str:
    dom = int(rng.integers(0, N_DOMAINS))
    cat = CATEGORIES[int(rng.integers(0, len(CATEGORIES)))]
    return f"https://site{dom:02d}.example/{cat}/doc{i:07d}"


def render_html(text: str) -> bytes:
    """Deterministic template wrap; text is recoverable byte-identically
    by the extraction in functions/text.py (extract_text)."""
    paras = text.split("\n\n")
    body = "".join(f"<p>{p}</p>" for p in paras)
    page = (
        "<html><head><title>fixture</title><meta charset=\"utf-8\"/></head>"
        f"<body><header>site chrome</header><main>{body}</main>"
        "<footer>footer chrome</footer></body></html>"
    )
    return page.encode("utf-8")


def char_shingles(text: str, k: int) -> set[str]:
    if len(text) < k:
        return {text} if text else set()
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


@dataclass
class Corpus:
    documents: pd.DataFrame       # url, warc_ts, html, text, lang
    truth_pairs: pd.DataFrame     # url_a, url_b, kind, jaccard
    truth_clusters: pd.DataFrame  # url, cluster_id  (cluster_id = min url)


def generate(n_docs: int = 1200, seed: int = 42, shingle_k: int = 5) -> Corpus:
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    urls: list[str] = []
    texts: list[str] = []
    langs: list[str] = []
    kinds: list[str] = []
    cluster_of: dict[str, str] = {}   # url -> cluster key (min url later)
    pairs: list[tuple[str, str, str, float]] = []

    next_id = 0

    def add(text: str, kind: str, lang: str | None = None) -> str:
        nonlocal next_id
        u = _url(rng, next_id)
        next_id += 1
        urls.append(u)
        texts.append(text)
        langs.append(lang if lang is not None else LANGS[int(rng.integers(0, len(LANGS)))])
        kinds.append(kind)
        return u

    clusters: list[list[str]] = []

    # --- exact duplicate clusters ---
    n_exact = int(n_docs * FRAC_EXACT)
    while n_exact > 0:
        csize = int(rng.integers(2, 6))
        csize = min(csize, n_exact) if n_exact >= 2 else 0
        if csize < 2:
            break
        body = " ".join(_salad(rng, vocab, 300, 3000))
        members = [add(body, "exact") for _ in range(csize)]
        clusters.append(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.append((members[i], members[j], "exact", 1.0))
        n_exact -= csize

    # --- near-duplicate clusters (1-5% token edits) ---
    n_near = int(n_docs * FRAC_NEAR)
    near_sets: list[tuple[str, set[str]]] = []
    while n_near > 0:
        csize = int(rng.integers(2, 4))
        csize = min(csize, n_near)
        if csize < 2:
            break
        base_tokens = _salad(rng, vocab, 800, 3500)
        members: list[str] = []
        member_sets: list[set[str]] = []
        for m in range(csize):
            toks = base_tokens if m == 0 else _edit_tokens(
                rng, base_tokens, vocab, float(rng.uniform(0.01, 0.05)))
            body = " ".join(toks)
            u = add(body, "near")
            members.append(u)
            member_sets.append(char_shingles(body, shingle_k))
        clusters.append(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                jj = jaccard(member_sets[i], member_sets[j])
                pairs.append((members[i], members[j], "near", jj))
        near_sets.extend(zip(members, member_sets))
        n_near -= csize

    # --- long-shared-substring pairs (distinct docs, identical >=512-char block) ---
    n_sub = int(n_docs * FRAC_SUBSTR)
    while n_sub >= 2:
        block = " ".join(_salad(rng, vocab, 600, 900))  # >=512 chars shared
        a_body = " ".join(_salad(rng, vocab, 400, 1200)) + " " + block + " " + \
            " ".join(_salad(rng, vocab, 400, 1200))
        b_body = " ".join(_salad(rng, vocab, 400, 1200)) + " " + block + " " + \
            " ".join(_salad(rng, vocab, 400, 1200))
        ua = add(a_body, "substr")
        ub = add(b_body, "substr")
        pairs.append((ua, ub, "substr", float(len(block))))  # jaccard col holds block len for this kind
        n_sub -= 2

    # --- same-length non-duplicates (size-blocking must not merge) ---
    n_same = int(n_docs * FRAC_SAMELEN)
    while n_same >= 2:
        a_toks = _salad(rng, vocab, 500, 1500)
        a_body = " ".join(a_toks)
        b_body = " ".join(_salad(rng, vocab, len(a_body) + 50, len(a_body) + 400))[: len(a_body)]
        ua = add(a_body, "samelen")
        ub = add(b_body, "samelen")
        pairs.append((ua, ub, "negative", 0.0))
        n_same -= 2

    # --- hot-band boilerplate template (~2% share one template + short slug) ---
    n_tmpl = max(4, int(n_docs * FRAC_TEMPLATE))
    template = " ".join(_salad(rng, vocab, 1500, 2500))
    tmpl_members = []
    for t in range(n_tmpl):
        slug = f"slug{t:05d} " + " ".join(_salad(rng, vocab, 20, 60))
        tmpl_members.append(add(template + " " + slug, "template", lang="en"))
    clusters.append(tmpl_members)

    # --- edge rows (excluded from all clusters) ---
    n_edge = int(n_docs * FRAC_EDGE)
    for e in range(n_edge):
        kind = e % 4
        if kind == 0:
            add("", "edge")
        elif kind == 1:
            add("   \t  ", "edge")
        elif kind == 2:
            add(chr(0x4E00 + e), "edge")  # unique 1-char doc per index
        else:
            add(" ".join(_salad(rng, vocab, 100, 300)), "edge", lang="unk")

    # --- unique singletons ---
    while next_id < n_docs:
        add(" ".join(_salad(rng, vocab, 200, 4000)), "single")

    # cluster ids = min(url) in component (deterministic, reference W2 analog)
    rows = []
    for members in clusters:
        cid = min(members)
        for u in members:
            rows.append((u, cid))
        cluster_of.update({u: cid for u in members})

    n = len(urls)
    order = rng.permutation(n)  # shuffle row order; determinism comes from seed
    warc_ts = [EPOCH + pd.Timedelta(seconds=13 * i) for i in range(n)]

    docs = pd.DataFrame(
        {
            "url": [urls[i] for i in order],
            "warc_ts": [warc_ts[i] for i in order],
            "html": [render_html(texts[i]) for i in order],
            "text": [texts[i] for i in order],
            "lang": [langs[i] for i in order],
            "kind": [kinds[i] for i in order],  # dropped for pipeline input; kept for tests
        }
    )
    truth_pairs = pd.DataFrame(pairs, columns=["url_a", "url_b", "kind", "jaccard"])
    truth_clusters = pd.DataFrame(rows, columns=["url", "cluster_id"])
    return Corpus(docs, truth_pairs, truth_clusters)


DOCUMENTS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def to_spark(spark, corpus: Corpus, with_kind: bool = False):
    cols = ["url", "warc_ts", "html", "text", "lang"] + (["kind"] if with_kind else [])
    schema = DOCUMENTS_SCHEMA + (", kind string" if with_kind else "")
    return spark.createDataFrame(corpus.documents[cols], schema=schema)
