"""Deterministic fixture corpus + query set (FIXTURES.md §1-§2, seed 42).

Every cell is a pure function of ``(seed, row_index)`` — never of
partitioning, wall clock, or iteration order — so goldens regenerate
bit-identically at any parallelism level (SURVEY.md §7.6).

The ``pages`` table follows BASELINE.json's input_hint schema exactly:
``(url, warc_ts, html, text, lang)`` with the byte-identical invariant
``extract_text(html) == text`` for every row (enforced in tests and by the
shared template here and in functions/extract.py).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from .schemas import CLAIMS, EVIDENCE, PAGES

SEED = 42
FIXTURES_VERSION = "fixtures-v1"

VOCAB = [f"w{i:04d}" for i in range(1000)]
ENTITIES = [
    "Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi",
    "Ivan", "Judy", "Mallory", "Niaj", "Olivia", "Peggy", "Rupert",
    "Sybil", "Paris", "Berlin", "Tokyo", "Lima",
]
VERBS = ["visited", "founded", "described", "painted", "measured", "wrote"]
LANGS_OTHER = ["de", "es", "zh", "fr"]

_ZIPF_S = 1.1
_zipf_w = 1.0 / np.arange(1, len(VOCAB) + 1) ** _ZIPF_S
ZIPF_P = _zipf_w / _zipf_w.sum()

_EPOCH = _dt.datetime(2024, 1, 1)

HTML_TEMPLATE = (
    "<html><head><title>{title}</title></head><body>"
    "<nav>BOILERPLATE NAV</nav><p>{body}</p>"
    "<footer>BOILERPLATE FOOTER</footer></body></html>"
)


def _rng(i: int, tag: int = 0) -> np.random.Generator:
    return np.random.default_rng([SEED, tag, i])


def _row_content(i: int) -> tuple[str, str]:
    """(title_i, body_i) for row i — pure function of (SEED, i)."""
    rng = _rng(i, tag=1)
    n_title = int(rng.integers(2, 6))
    ent = ENTITIES[int(rng.integers(0, len(ENTITIES)))]
    # ~30% of titles are exactly one entity token -> gives the J1
    # entity->title exact-match route real hits (FIXTURES.md §1).
    if rng.random() < 0.30:
        title = ent
    else:
        words = [VOCAB[j] for j in rng.choice(len(VOCAB), size=n_title - 1, p=ZIPF_P)]
        pos = int(rng.integers(0, n_title))
        words.insert(pos, ent)
        title = " ".join(words)
    n_body = int(rng.integers(50, 301))
    body = " ".join(VOCAB[j] for j in rng.choice(len(VOCAB), size=n_body, p=ZIPF_P))
    return title, body


def make_pages(n: int, seed: int = SEED) -> pa.Table:
    """Common-Crawl-style corpus (FIXTURES.md §1).

    ~2% of rows duplicate an earlier row's text under a different url
    (content-dedup D1 targets); ~1% duplicate an earlier url with a later
    warc_ts (url-dedup / as-of pick F5 targets).
    """
    return make_pages_range(0, n, seed)


def make_pages_range(start: int, end: int, seed: int = SEED) -> pa.Table:
    """Rows [start, end) of the pinned corpus — every cell is a pure
    function of (seed, i), so chunked parallel generation concatenates to
    exactly ``make_pages(end)`` sliced (used by bench.py)."""
    assert seed == SEED, "fixtures are pinned to seed 42 (FIXTURES.md)"
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, end):
        rng = _rng(i, tag=0)
        url = f"https://example.org/d/{i:08d}"
        r = rng.random()
        if i > 10 and r < 0.02:  # content duplicate of an earlier row
            j = int(rng.integers(0, i))
            title, body = _row_content(j)
        elif i > 10 and r < 0.03:  # url duplicate, later crawl
            j = int(rng.integers(0, i))
            url = f"https://example.org/d/{j:08d}"
            title, body = _row_content(i)
        else:
            title, body = _row_content(i)
        lang = "en" if rng.random() < 0.90 else LANGS_OTHER[int(rng.integers(0, 4))]
        text = title + "\n" + body
        html = HTML_TEMPLATE.format(title=title, body=body).encode("utf-8")
        urls.append(url)
        tss.append(_EPOCH + _dt.timedelta(seconds=i))
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
        schema=PAGES,
    )


def make_claims(q: int, n_pages: int, seed: int = SEED) -> pa.Table:
    """FEVER-style query set (FIXTURES.md §2): each claim borrows >=1 token
    from some target page's title so top-1 retrieval is meaningful, and
    carries the reference's 3-deep nested evidence shape.
    """
    assert seed == SEED
    qids, claims, labels, evidence = [], [], [], []
    label_set = ["SUPPORTS", "REFUTES", "NOT ENOUGH INFO"]
    for qi in range(q):
        rng = _rng(qi, tag=2)
        tgt = int(rng.integers(0, n_pages))
        title, _body = _row_content(tgt)
        title_toks = title.split(" ")
        ent = next((t for t in title_toks if t in ENTITIES), ENTITIES[qi % len(ENTITIES)])
        verb = VERBS[int(rng.integers(0, len(VERBS)))]
        n_extra = int(rng.integers(3, 9))
        extra = [VOCAB[j] for j in rng.choice(len(VOCAB), size=n_extra, p=ZIPF_P)]
        borrow = [t for t in title_toks if t not in ENTITIES][:2]
        claim = " ".join([ent, verb] + borrow + extra)
        label = label_set[int(rng.integers(0, 3))]
        if label == "NOT ENOUGH INFO":
            ev = []
        else:
            n_sets = int(rng.integers(1, 3))
            ev = [[{"page": f"https://example.org/d/{tgt:08d}", "sent": 0}]] * n_sets
        qids.append(qi)
        claims.append(claim)
        labels.append(label)
        evidence.append(ev)
    return pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "claim": claims,
            "label": labels,
            "evidence": pa.array(evidence, EVIDENCE),
        },
        schema=CLAIMS,
    )


def make_query_terms(q: int, seed: int = SEED) -> list[tuple[int, list[str]]]:
    """Plain term queries over the VOCAB Zipf distribution (BM25 bench/golden
    query set — 2-5 terms each, deduped at query time by the engine)."""
    assert seed == SEED
    out = []
    for qi in range(q):
        rng = _rng(qi, tag=3)
        k = int(rng.integers(2, 6))
        terms = [VOCAB[j] for j in rng.choice(len(VOCAB), size=k, p=ZIPF_P)]
        out.append((qi, terms))
    return out
