"""Sentence explode + sentence retrieval (SURVEY.md §2.2 M2, §2.6 K2).

Reference: pages carry a ``lines`` field of ``"<idx>\\t<sentence>..."``
rows; ``sentence_retrieval.py`` point-looks-up retrieved pages, splits
lines, scores each sentence against the claim by tf-idf similarity and
keeps top-n (arXiv:1809.00509 §2.2; paths unverified — SURVEY.md §0).

Engine: the pinned splitter turns ``text`` into a ``sentences`` child
table (vectorized explode, one row per sentence); retrieval is a
semi-join of sentences against the retrieved doc set (broadcast keyset —
ray_guide.md:148-150), BM25-style scoring per (claim, sentence), and a
per-claim top-n via groupby().map_groups.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.tokenizer import tokenize
from .util import pool_size

SPLITTER_VERSION = "sentsplit-v1"


def split_sentences(text: str) -> list[str]:
    """Pinned splitter: split on newline, then on '. ' (FIXTURES.md §4);
    drop empties; keep original order (sent_id = position)."""
    out = []
    for line in text.split("\n"):
        for part in line.split(". "):
            part = part.strip()
            if part:
                out.append(part)
    return out


def split_sentences_column(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Vectorized pinned splitter over a string column.

    Returns ``(sentences, row_idx, sent_id)`` flat arrays — identical
    per-row output to :func:`split_sentences` (property-tested): split
    on newline, then on '. ', trim whitespace, drop empties, original
    order."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    l1 = pc.split_pattern(texts, "\n")
    if isinstance(l1, pa.ChunkedArray):
        l1 = l1.combine_chunks()
    flat1 = l1.flatten()
    parents1 = pc.list_parent_indices(l1)
    l2 = pc.split_pattern(flat1, ". ")
    if isinstance(l2, pa.ChunkedArray):
        l2 = l2.combine_chunks()
    flat2 = l2.flatten()
    parents2 = pc.list_parent_indices(l2)
    row_of = parents1.take(parents2).to_numpy(zero_copy_only=False)
    trimmed = pc.utf8_trim_whitespace(flat2)
    keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    kept_rows = row_of[keep]
    kept_text = pc.filter(trimmed, pa.array(keep))
    # sent_id = position within row (flatten order preserves row order)
    n = len(texts)
    counts = np.bincount(kept_rows, minlength=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sent_id = np.arange(kept_rows.size, dtype=np.int64) - starts[kept_rows]
    return kept_text, kept_rows, sent_id


def explode_sentences(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """docs -> sentences(doc_id, sent_id, text), vectorized explode (the
    pinned splitter as Arrow kernels — no per-row Python)."""

    def explode(batch: pa.Table) -> pa.Table:
        sents, row_idx, sent_id = split_sentences_column(batch[text_col])
        if sents.type != pa.string():
            sents = sents.cast(pa.string())
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": ids.take(pa.array(row_idx)),
                "sent_id": pa.array(sent_id.astype(np.int32), pa.int32()),
                "text": sents,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def semi_join_docs(
    sentences: "ray.data.Dataset", doc_ids: set[int]
) -> "ray.data.Dataset":
    """Filter sentences to a retrieved doc set — broadcast keyset semi-join
    (no shuffle; ray_guide.md:148-150)."""
    ref = ray.put(pa.array(sorted(doc_ids), pa.int64()))

    def filt(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        return batch.filter(pc.is_in(batch["doc_id"], value_set=keys))

    return sentences.map_batches(filt, batch_format="pyarrow")


def score_sentences_vs_claims(
    sentences: "ray.data.Dataset",
    claims: list[tuple[int, list[int], list[str]]],
    *,
    top_n: int = 5,
) -> "ray.data.Dataset":
    """For each claim (query_id, candidate_doc_ids, claim_terms): score
    every candidate sentence by a simple overlap-idf similarity and keep
    top-n per claim — the reference's threshold/top-5 step (K2).

    ``claims`` is small (per-batch query set) and broadcast once.
    """
    ref = ray.put(claims)

    class ScoreStage:
        def __init__(self):
            rows = ray.get(ref)
            self.by_doc: dict[int, list[tuple[int, frozenset]]] = {}
            for qid, did_list, terms in rows:
                tset = frozenset(terms)
                for did in did_list:
                    self.by_doc.setdefault(did, []).append((qid, tset))

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_q, out_d, out_s, out_score, out_text = [], [], [], [], []
            for did, sid, text in zip(
                batch["doc_id"].to_pylist(),
                batch["sent_id"].to_pylist(),
                batch["text"].to_pylist(),
            ):
                claims_here = self.by_doc.get(did)
                if not claims_here:
                    continue
                stoks = Counter(tokenize(text))
                n = sum(stoks.values())
                for qid, tset in claims_here:
                    overlap = sum(c for t, c in stoks.items() if t in tset)
                    if overlap == 0 or n == 0:
                        continue
                    score = overlap / n * math.log1p(len(tset))
                    out_q.append(qid)
                    out_d.append(did)
                    out_s.append(sid)
                    out_score.append(score)
                    out_text.append(text)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "doc_id": pa.array(out_d, pa.int64()),
                    "sent_id": pa.array(out_s, pa.int32()),
                    "score": pa.array(out_score, pa.float64()),
                    "text": pa.array(out_text, pa.string()),
                }
            )

    scored = sentences.map_batches(ScoreStage, batch_format="pyarrow", concurrency=pool_size(2))

    def topn(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["score", "doc_id", "sent_id"], ascending=[False, True, True]
        ).head(top_n)
        return g

    return scored.groupby("query_id").map_groups(topn, batch_format="pandas")


def flatten_evidence(claims: "ray.data.Dataset") -> "ray.data.Dataset":
    """M9: nested evidence list<list<struct<page,sent>>> -> flat rows
    (query_id, page, sent).  Stays in pyarrow — nested cols don't
    round-trip pandas (ray_guide.md:236-238)."""

    def fl(batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        ev = batch["evidence"].to_pylist()
        out_q, out_p, out_s = [], [], []
        for qid, sets in zip(qids, ev):
            seen = set()
            for es in sets or []:
                for item in es:
                    key = (item["page"], item["sent"])
                    if key not in seen:
                        seen.add(key)
                        out_q.append(qid)
                        out_p.append(item["page"])
                        out_s.append(item["sent"])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "page": pa.array(out_p, pa.string()),
                "sent": pa.array(out_s, pa.int32()),
            }
        )

    return claims.map_batches(fl, batch_format="pyarrow")
