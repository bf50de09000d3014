"""Positional phrase + boolean query operators (SURVEY.md §2.6 extension;
fulltext_index tier).

The reference retrieval stack (DrQA TF-IDF over hashed uni/bigrams,
fever-baselines — unverified, SURVEY.md §0) has no positional queries;
these operators follow the standard positional-postings design (IIR
ch.2.4; Lucene PhraseQuery semantics) over this engine's segment layout:

* Phrase: a doc matches when the phrase's terms occur at CONSECUTIVE
  token positions; ``n_occ`` counts every (possibly overlapping) start
  position.  Matching is fully vectorized — each term's candidate
  occurrences become int64 keys ``doc * M + (pos - i)`` (``i`` = term
  offset in the phrase) and the phrase's occurrence set is the sorted
  intersection of the per-term key sets; no per-doc Python loop.
* Phrase ranking: BM25 treating the phrase as a pseudo-term — tf = the
  doc's phrase count, df = the number of matching docs (exact, computed
  globally inside the fused all-segments pass), k1/b and the idf shape
  identical to the term scorer (stages/search.py), so scores follow the
  same cross-engine float policy (round-6 re-rank at the registry edge).
* Boolean: ``must`` (AND) / ``should`` (OR) / ``must_not`` (NOT) over
  posting docid sets, ranked by the same BM25 sum over must+should terms
  restricted to the filtered candidates.  Needs no positions.

Execution shape: queries are a Dataset; ``map_batches(Actor,
concurrency=N)`` actor pools whose reader state loads once per actor;
postings (incl. ``pos_blob``) arrive via the reader's ``term IN``
row-group-pruned point reads — segments are never loaded whole, the
trait that survives 10^12 docs.  Scale note: per-query cost is bounded by
the RAREST term's postings for the intersection plus that many position
decodes; head-term-only phrases degrade to the TAAT cost of the same
terms, exactly like Lucene's.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

from ..sources import manifest as mf
from .codec import decode_positions
from .search import (
    B,
    K1,
    IndexReader,
    _ranges_to_indices,
    _topk_exact,
)
from .util import pool_size


def _pos_pack(reader: IndexReader, seg_ids: list[int], term: str):
    """Per-term positional arrays concatenated across ``seg_ids``
    (ascending sid = ascending docids; position streams reset per posting
    so per-segment decodes concatenate validly): ``(docids, dls,
    positions, occ_bounds)`` or None when the term is absent.  Cached per
    reader — positions are query-invariant, like the WAND packs."""
    cache = getattr(reader, "_pos_packs", None)
    if cache is None:
        cache = reader._pos_packs = {}
    elif len(cache) > 200_000:  # bound long-running serving actors
        cache.clear()
    key = (tuple(seg_ids), term)
    if key in cache:
        return cache[key]
    p_doc, p_dl, p_pos, p_tf = [], [], [], []
    for sid in seg_ids:
        row = reader.postings(sid, term)
        if row is None:
            continue
        if row.get("pos_blob") is None:
            raise ValueError(
                "phrase_search requires an index built with positions=True "
                "(segment row has no pos_blob)"
            )
        docids, tfs, dls = row["decoded"]
        pos, _ = decode_positions(row["pos_blob"], tfs)
        p_doc.append(docids)
        p_dl.append(dls)
        p_pos.append(pos)
        p_tf.append(tfs)
    if not p_doc:
        cache[key] = None
        return None
    tfs_all = np.concatenate(p_tf)
    occ_bounds = np.zeros(tfs_all.size + 1, dtype=np.int64)
    np.cumsum(tfs_all, out=occ_bounds[1:])
    out = (
        np.concatenate(p_doc),
        np.concatenate(p_dl),
        np.concatenate(p_pos),
        occ_bounds,
    )
    cache[key] = out
    return out


def match_phrase(
    reader: IndexReader, seg_ids: list[int], terms: list[str]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact phrase match over the fused segments -> ``(doc_ids, n_occ,
    dls)`` for every matching doc (doc-ascending).  Overlapping
    occurrences count (``"a a"`` occurs twice in ``"a a a"``)."""
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if not terms:
        return empty
    packs = []
    for t in terms:
        p = _pos_pack(reader, seg_ids, t)
        if p is None:
            return empty
        packs.append(p)
    m = len(terms)
    # candidate docs: intersect docid sets, rarest first (cheapest chain)
    order = np.argsort([p[0].size for p in packs], kind="stable")
    cand = packs[order[0]][0]
    for oi in order[1:]:
        cand = cand[np.isin(cand, packs[oi][0], assume_unique=True)]
        if cand.size == 0:
            return empty
    # key space: doc * M + shifted position; M bounds any position+m so
    # keys never collide across docs (int64 holds doc ~1e12 at M ~1e6)
    M = int(max(int(p[1].max()) for p in packs)) + m + 1
    inter: Optional[np.ndarray] = None
    for i, (docids, _dls, pos, occ_bounds) in enumerate(packs):
        idx = np.searchsorted(docids, cand)
        starts, ends = occ_bounds[idx], occ_bounds[idx + 1]
        gi = _ranges_to_indices(starts, ends)
        doc_of_occ = np.repeat(cand, ends - starts)
        shifted = pos[gi] - i
        keep = shifted >= 0
        keys = doc_of_occ[keep] * M + shifted[keep]
        inter = keys if inter is None else np.intersect1d(
            inter, keys, assume_unique=True
        )
        if inter.size == 0:
            return empty
    docs, counts = np.unique(inter // M, return_counts=True)
    d0, dl0 = packs[0][0], packs[0][1]
    dls = dl0[np.searchsorted(d0, docs)]
    return docs, counts.astype(np.int64), dls


def score_phrase(
    reader: IndexReader, seg_ids: list[int], terms: list[str], k: int
) -> list[tuple[float, int, int]]:
    """BM25 top-k over the phrase-as-pseudo-term: tf = per-doc phrase
    count, df = global matching-doc count (exact — the fused pass sees
    every segment), idf/k1/b identical to the term scorer.  Returns
    ``[(score, doc_id, n_occ)]`` ranked by (-score, doc_id)."""
    docs, counts, dls = match_phrase(reader, seg_ids, terms)
    if docs.size == 0:
        return []
    df = int(docs.size)
    idf = math.log(1.0 + (reader.n_docs - df + 0.5) / (df + 0.5))
    c = counts.astype(np.float64)
    dl = dls.astype(np.float64)
    scores = idf * (c * (K1 + 1.0)) / (c + K1 * (1.0 - B + B * dl / reader.avgdl))
    top = _topk_exact(scores, docs, k)
    cnt_of = dict(zip(docs.tolist(), counts.tolist()))
    return [(s, d, cnt_of[d]) for s, d in top]


class PhraseSearcherActor:
    """Actor-pool stage: batch of (query_id, terms[ordered phrase]) ->
    (query_id, rank, doc_id, n_occ, score).  Reader state loads once per
    actor; per-term positional packs are cached across queries."""

    def __init__(self, index_dir: str, k: int = 10):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one filtered point-read per segment for the whole batch
        all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_c, out_s = [], [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            for rank, (score, doc_id, n_occ) in enumerate(
                score_phrase(self.reader, self.seg_ids, list(terms), self.k), 1
            ):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_c.append(n_occ)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "n_occ": pa.array(out_c, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def phrase_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Phrase query pipeline: (query_id, terms) -> (query_id, rank,
    doc_id, n_occ, score) over a ``positions=True`` index."""
    return queries.map_batches(
        PhraseSearcherActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ------------------------------------------------------------- proximity

def match_window(
    reader: IndexReader, seg_ids: list[int], terms: list[str], window: int
) -> np.ndarray:
    """Docs where ONE occurrence of EVERY term fits inside a ``window``-
    token span (max(pos) - min(pos) <= window - 1; unordered — the
    proximity/within operator).  Returns matching doc_ids ascending.

    Vectorized anchor sweep: any satisfying assignment has a minimum
    position, and that minimum is an occurrence of one of the terms — so
    for each anchor term j, test every occurrence p of j (restricted to
    the docid-intersection candidates) for "every term has an occurrence
    in [p, p + window - 1]" with two searchsorteds per term over the
    doc*M+pos key arrays, then OR-reduce per doc.  O(m^2 · occ) numpy
    kernels, no per-doc Python loop."""
    uniq = sorted(set(terms))
    if not uniq or window < 1:
        return np.empty(0, dtype=np.int64)
    packs = []
    for t in uniq:
        p = _pos_pack(reader, seg_ids, t)
        if p is None:
            return np.empty(0, dtype=np.int64)
        packs.append(p)
    order = np.argsort([p[0].size for p in packs], kind="stable")
    cand = packs[order[0]][0]
    for oi in order[1:]:
        cand = cand[np.isin(cand, packs[oi][0], assume_unique=True)]
        if cand.size == 0:
            return cand
    if len(uniq) == 1:
        return cand
    M = int(max(int(p[1].max()) for p in packs)) + window + 1
    # per-term sorted key arrays restricted to candidate docs
    keys = []
    occ_docs = []
    for docids, _dls, pos, occ_bounds in packs:
        idx = np.searchsorted(docids, cand)
        starts, ends = occ_bounds[idx], occ_bounds[idx + 1]
        gi = _ranges_to_indices(starts, ends)
        doc_of_occ = np.repeat(cand, ends - starts)
        keys.append(doc_of_occ * M + pos[gi])
        occ_docs.append(doc_of_occ)
    hit = np.zeros(cand.size, dtype=bool)
    for j in range(len(packs)):
        anchors = keys[j]
        ok = np.ones(anchors.size, dtype=bool)
        for i in range(len(packs)):
            if i == j:
                continue
            lo = np.searchsorted(keys[i], anchors)
            hi = np.searchsorted(keys[i], anchors + window, side="left")
            # the window must stay inside the anchor's doc: keys are
            # doc*M+pos with pos+window < M, so cross-doc bleed is
            # impossible by construction of M
            ok &= hi > lo
        di = np.searchsorted(cand, occ_docs[j][ok])
        hit[di] = True
    return cand[hit]


def score_window(
    reader: IndexReader,
    seg_ids: list[int],
    terms: list[str],
    window: int,
    k: int,
) -> list[tuple[float, int]]:
    """Proximity top-k: docs passing :func:`match_window`, ranked by the
    plain BM25 sum over the (distinct) terms — per-(doc, term)
    contributions identical to the exact scorer, so this is the must-AND
    boolean query further filtered by the positional window."""
    docs = match_window(reader, seg_ids, terms, window)
    if docs.size == 0:
        return []
    uniq = sorted(set(terms))
    reader.dfs(uniq)
    scores = np.zeros(docs.size, dtype=np.float64)
    for t in uniq:  # ascending-term accumulation order (pinned)
        arrs = reader.term_arrays(seg_ids, t)
        if arrs is None:
            continue
        docids, w = arrs
        p = np.searchsorted(docids, docs)
        ok = p < docids.size
        ok[ok] &= docids[p[ok]] == docs[ok]
        scores[ok] += reader.idf(t) * w[p[ok]]
    return _topk_exact(scores, docs, k)


class WindowSearcherActor:
    """Actor-pool stage: batch of (query_id, terms, window) ->
    (query_id, rank, doc_id, score)."""

    def __init__(self, index_dir: str, k: int = 10):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms, win in zip(
            batch["query_id"].to_pylist(),
            batch["terms"].to_pylist(),
            batch["window"].to_pylist(),
        ):
            top = score_window(
                self.reader, self.seg_ids, list(terms), int(win), self.k
            )
            for rank, (score, doc_id) in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def window_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Proximity query pipeline: (query_id, terms, window) -> (query_id,
    rank, doc_id, score) over a ``positions=True`` index."""
    return queries.map_batches(
        WindowSearcherActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# -------------------------------------------------------------- boolean

def score_boolean(
    reader: IndexReader,
    seg_ids: list[int],
    must: list[str],
    should: list[str],
    must_not: list[str],
    k: int,
) -> list[tuple[float, int]]:
    """AND/OR/NOT candidate filtering + BM25 ranking over must+should.

    Candidates: docs containing ALL ``must`` terms (posting-set
    intersection, rarest first) — or, with no ``must``, ANY ``should``
    term — minus docs containing any ``must_not`` term.  Scores sum
    idf*w over the distinct must+should terms present per candidate, in
    ascending-term order (the pinned accumulation order), using GLOBAL
    df for idf — identical per-(doc, term) contributions to the plain
    BM25 scorer, so a boolean query with no filters ranks exactly like
    ``search`` does."""
    must = sorted(set(must))
    should = sorted(set(should))
    must_not = sorted(set(must_not))
    arrs = {
        t: reader.term_arrays(seg_ids, t)
        for t in set(must) | set(should) | set(must_not)
    }
    if must:
        if any(arrs[t] is None for t in must):
            return []
        order = sorted(must, key=lambda t: arrs[t][0].size)
        cand = arrs[order[0]][0]
        for t in order[1:]:
            cand = cand[np.isin(cand, arrs[t][0], assume_unique=True)]
            if cand.size == 0:
                return []
    else:
        parts = [arrs[t][0] for t in should if arrs[t] is not None]
        if not parts:
            return []
        cand = parts[0]
        for p in parts[1:]:
            cand = np.union1d(cand, p)
    for t in must_not:
        if arrs[t] is not None:
            cand = cand[~np.isin(cand, arrs[t][0], assume_unique=True)]
    if cand.size == 0:
        return []
    scoring = sorted(set(must) | set(should))
    dfs = reader.dfs(scoring)
    scores = np.zeros(cand.size, dtype=np.float64)
    touched = np.zeros(cand.size, dtype=bool)
    for t in scoring:  # ascending-term accumulation order (pinned)
        if arrs[t] is None or dfs[t] == 0:
            continue
        docids, w = arrs[t]
        p = np.searchsorted(docids, cand)
        ok = p < docids.size
        ok[ok] &= docids[p[ok]] == cand[ok]
        scores[ok] += reader.idf(t) * w[p[ok]]
        touched |= ok
    live = np.flatnonzero(touched)
    if live.size == 0:
        return []
    return _topk_exact(scores[live], cand[live], k)


class BooleanSearcherActor:
    """Actor-pool stage: batch of (query_id, must, should, must_not) ->
    (query_id, rank, doc_id, score)."""

    def __init__(self, index_dir: str, k: int = 10):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {
                t
                for col in ("must", "should", "must_not")
                for ts in batch[col].to_pylist()
                for t in ts
            }
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, mu, sh, mn in zip(
            batch["query_id"].to_pylist(),
            batch["must"].to_pylist(),
            batch["should"].to_pylist(),
            batch["must_not"].to_pylist(),
        ):
            top = score_boolean(
                self.reader, self.seg_ids, list(mu), list(sh), list(mn), self.k
            )
            for rank, (score, doc_id) in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def boolean_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Boolean query pipeline: (query_id, must, should, must_not) ->
    (query_id, rank, doc_id, score)."""
    return queries.map_batches(
        BooleanSearcherActor,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
