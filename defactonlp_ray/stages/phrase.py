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

import ray
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


# fixed per-index occurrence-key radix: key = doc_id * _POS_M + pos.
# pos < _POS_M - _POS_SLACK is validated at pack build, so a window/phrase
# probe of up to _POS_SLACK tokens can never cross a doc boundary in key
# space; doc_id must stay below 2^63 / _POS_M ≈ 4.4e12 (comfortably above
# the 10^12-doc design point).  A fixed radix (vs per-query max-dl) is
# what lets the key arrays be built ONCE per term and probed by every
# query with constant shifts.
_POS_M = 1 << 21
_POS_SLACK = 1024


def _pos_pack(reader: IndexReader, seg_ids: list[int], term: str):
    """Per-term positional arrays concatenated across ``seg_ids``
    (ascending sid = ascending docids; position streams reset per posting
    so per-segment decodes concatenate validly): ``(docids, dls,
    positions, occ_bounds, keys)`` where ``keys`` is the sorted
    occurrence-key array ``doc*_POS_M + pos`` — or None when the term is
    absent.  Cached per reader — positions are query-invariant, like the
    WAND packs, so every query probes the same arrays."""
    cache = getattr(reader, "_pos_packs", None)
    if cache is None:
        cache = reader._pos_packs = {}
    key = (tuple(seg_ids), term)
    if key in cache:
        return cache[key]
    if len(cache) > 200_000:  # bound long-running serving actors
        # evict only organically-cached entries: the driver-broadcast
        # seeded packs must survive (the actor's batched pre-load
        # excludes seeded terms, so wiping them degrades every later
        # seeded-term query to per-term point reads + re-decodes)
        seeded = getattr(reader, "_pos_seeded_keys", frozenset())
        for k in [k for k in cache if k not in seeded]:
            del cache[k]
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
    docids = np.concatenate(p_doc)
    pos = np.concatenate(p_pos)
    if pos.size and int(pos.max()) >= _POS_M - _POS_SLACK:
        raise ValueError(
            f"document position {int(pos.max())} exceeds the positional "
            f"key radix ({_POS_M - _POS_SLACK}); raise _POS_M"
        )
    keys = np.repeat(docids, tfs_all) * _POS_M + pos
    out = (docids, np.concatenate(p_dl), pos, occ_bounds, keys)
    cache[key] = out
    return out


def _decode_pos_packs(index_dir: str, terms: list[str],
                      seg_ids: list[int]) -> dict:
    """Decode the positional packs for ``terms`` with a fresh reader
    (one filtered point-read per segment) — the per-chunk unit of
    :func:`build_pos_packs`, runnable as a Ray task.  ``seg_ids`` is
    the DRIVER's segment snapshot: a concurrent compaction can land
    between the driver's manifest read and this task's, and a pack
    decoded over a different segment set must never ship under the
    driver's key (the consumer-side equality check could not detect
    it)."""
    reader = IndexReader(index_dir)
    if list(reader.seg_ids) != list(seg_ids):
        raise RuntimeError(
            "build_pos_packs: segment set changed during decode "
            f"({seg_ids} -> {reader.seg_ids}); retry after the "
            "compaction/expunge settles"
        )
    for sid in seg_ids:
        reader.load_postings(sid, terms)
    return {t: _pos_pack(reader, list(seg_ids), t) for t in terms}


def build_pos_packs(index_dir: str, terms, *, chunk: int = 64) -> dict:
    """Decode the positional packs for a workload's term union ONCE —
    made to be ``ray.put`` once and read zero-copy by every phrase/window
    actor, instead of each actor re-reading and re-decoding ``pos_blob``
    for the same head terms (the same broadcast-small-side pattern as
    :func:`search.build_shared_index`).  Fans out per-term-chunk Ray
    tasks when a session is live.  The term set is the QUERY vocabulary,
    not the index vocabulary, so the blob stays O(workload) at any
    corpus size."""
    terms = sorted(set(terms))
    seg_ids = list(IndexReader(index_dir).seg_ids)
    chunks = [terms[i : i + chunk] for i in range(0, len(terms), chunk)]
    if ray.is_initialized() and len(chunks) > 1:
        task = ray.remote(_decode_pos_packs)
        parts = ray.get([task.remote(index_dir, c, seg_ids) for c in chunks])
    else:
        parts = [_decode_pos_packs(index_dir, c, seg_ids) for c in chunks]
    packs: dict = {}
    for p in parts:
        packs.update(p)
    return {"seg_ids": seg_ids, "packs": packs}


def _seed_shared_packs(reader: IndexReader, blob: dict) -> set:
    """Install a :func:`build_pos_packs` blob into a reader's caches:
    positional packs directly, and the BM25 ``term_arrays`` recomputed
    from the pack (tf = per-posting occurrence-count diff, dl from the
    pack) — elementwise the SAME float64 expression ``postings()``
    caches, so shared and unshared scoring are bit-identical (tested).
    Returns the seeded term set."""
    if list(blob["seg_ids"]) != list(reader.seg_ids):
        raise ValueError(
            "shared pos packs were built for a different segment set"
        )
    seg_key = tuple(blob["seg_ids"])
    cache = getattr(reader, "_pos_packs", None)
    if cache is None:
        cache = reader._pos_packs = {}
    for t, p in blob["packs"].items():
        cache[(seg_key, t)] = p
        if p is None:
            reader._term_arrays[(seg_key, t)] = None
        else:
            docids, dls, _pos, occ_bounds, _keys = p
            tfs_f = np.diff(occ_bounds).astype(np.float64)
            dls_f = dls.astype(np.float64)
            w = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls_f / reader.avgdl)
            )
            reader._term_arrays[(seg_key, t)] = (docids, w)
    # seeded keys are exempt from the _pos_pack cache bound's eviction
    reader._pos_seeded_keys = {(seg_key, t) for t in blob["packs"]}
    return set(blob["packs"])


def _get_and_seed(reader: IndexReader, packs_ref) -> set:
    """Actor-side half of the shared-packs route: resolve ``packs_ref``
    (an ``ObjectRef`` of a :func:`build_pos_packs` blob, or the blob
    itself) and seed the reader.  Returns the seeded term set (empty
    when no ref was given) — ``__call__`` subtracts it from the batch's
    term union so point-reads only fetch terms OUTSIDE the workload
    vocabulary the driver pre-decoded."""
    if packs_ref is None:
        return set()
    blob = (
        ray.get(packs_ref)
        if isinstance(packs_ref, ray.ObjectRef)
        else packs_ref
    )
    return _seed_shared_packs(reader, blob)


def _member(sorted_arr: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """Boolean membership of ``probes`` in sorted ``sorted_arr``."""
    idx = np.searchsorted(sorted_arr, probes)
    ok = idx < sorted_arr.size
    ok[ok] &= sorted_arr[idx[ok]] == probes[ok]
    return ok


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
    if len(terms) - 1 > _POS_SLACK:
        # probes shift keys by at most len-1, which must stay inside the
        # per-doc radix slack; raise (like match_window) instead of
        # silently fabricating an empty result
        raise ValueError(
            f"phrase length {len(terms)} exceeds the positional key "
            f"slack ({_POS_SLACK + 1} terms max)"
        )
    packs = []
    for t in terms:
        p = _pos_pack(reader, seg_ids, t)
        if p is None:
            return empty
        packs.append(p)
    # a phrase occurrence anchored at token position p contributes, for
    # term i, the occurrence key doc*M + (p + i); relative to the anchor
    # that is the CONSTANT shift +i of the term's cached key array — so
    # the phrase's anchor set is X = ∩_i (keys_i - i), computed by
    # starting from the SMALLEST key array (rarest term) and probing the
    # others with searchsorted.  Per-query cost is O(|rarest| · m · log),
    # never a gather of a head term's full occurrence list.
    order = np.argsort([p[4].size for p in packs], kind="stable")
    j = int(order[0])
    pj = packs[j]
    X = pj[4] - j
    if j > 0:  # anchor position p = pos_j - j must be >= 0
        X = X[pj[2] >= j]
    for oi in order[1:]:
        i = int(oi)
        X = X[_member(packs[i][4], X + i)]
        if X.size == 0:
            return empty
    docs, counts = np.unique(X // _POS_M, return_counts=True)
    d0, dl0 = packs[0][0], packs[0][1]
    dls = dl0[np.searchsorted(d0, docs)]
    return docs, counts.astype(np.int64), dls


def _score_pseudo(
    reader: IndexReader,
    docs: np.ndarray,
    counts: np.ndarray,
    dls: np.ndarray,
    k: int,
) -> list[tuple[float, int, int]]:
    """Shared pseudo-term BM25 tail (phrase / phrase-prefix / span_not):
    tf = the doc's surviving-occurrence count, df = live matching docs
    (exact — computed at query time over the fused all-segments pass),
    idf/k1/b identical to the term scorer.  Returns ``[(score, doc_id,
    n_occ)]`` ranked by (-score, doc_id)."""
    if reader.deleted.size and docs.size:
        from .deletes import live_mask

        m = live_mask(docs, reader.deleted)
        docs, counts, dls = docs[m], counts[m], dls[m]
    if docs.size == 0:
        return []
    df = int(docs.size)
    idf = math.log(1.0 + (reader.n_docs - df + 0.5) / (df + 0.5))
    c = counts.astype(np.float64)
    dl = dls.astype(np.float64)
    scores = idf * (c * (K1 + 1.0)) / (c + K1 * (1.0 - B + B * dl / reader.avgdl))
    top = _topk_exact(scores, docs, k)
    # docs is sorted: O(k log n) count lookups, no full-match-set dict
    return [
        (s, d, int(counts[np.searchsorted(docs, d)])) for s, d in top
    ]


def score_phrase(
    reader: IndexReader, seg_ids: list[int], terms: list[str], k: int
) -> list[tuple[float, int, int]]:
    """BM25 top-k over the phrase-as-pseudo-term (see _score_pseudo)."""
    docs, counts, dls = match_phrase(reader, seg_ids, terms)
    return _score_pseudo(reader, docs, counts, dls, k)


class PhraseSearcherActor:
    """Actor-pool stage: batch of (query_id, terms[ordered phrase]) ->
    (query_id, rank, doc_id, n_occ, score).  Reader state loads once per
    actor; per-term positional packs are cached across queries."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one filtered point-read per segment for the whole batch
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts} - self.seeded
        )
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
    packs_ref=None,
) -> "ray.data.Dataset":
    """Phrase query pipeline: (query_id, terms) -> (query_id, rank,
    doc_id, n_occ, score) over a ``positions=True`` index.

    ``packs_ref``: ``ray.put`` ref of a :func:`build_pos_packs` blob for
    the workload's term union — every actor then seeds its caches from
    one zero-copy object-store read instead of re-reading and re-decoding
    ``pos_blob`` per actor (serving route; results are bit-identical)."""
    return queries.map_batches(
        PhraseSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ------------------------------------- match_phrase_prefix (MultiPhrase)

def match_phrase_prefix(
    reader: IndexReader,
    seg_ids: list[int],
    fixed: list[str],
    alts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Multi-phrase match (Lucene MultiPhraseQuery, the engine of ES
    match_phrase_prefix): terms ``fixed[0..m-1]`` at consecutive offsets
    followed by ANY of ``alts`` at offset ``m``.  Returns ``(docs,
    n_occ, dls)`` with occurrences summed over alternatives — a token
    position holds exactly one term, so per-alternative anchor sets are
    disjoint and the union is a concatenation.  Cost: the fixed-prefix
    intersection once (rarest-first, like match_phrase) plus ONE probe
    pass per alternative over the surviving anchors."""
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if not alts:
        return empty
    if len(fixed) > _POS_SLACK:
        raise ValueError(
            f"phrase length {len(fixed) + 1} exceeds the positional key "
            f"slack ({_POS_SLACK + 1} terms max)"
        )
    packs = []
    for t in fixed:
        p = _pos_pack(reader, seg_ids, t)
        if p is None:
            return empty
        packs.append(p)
    last_off = len(fixed)
    if fixed:
        # anchor set from the fixed prefix, rarest term first
        order = np.argsort([p[4].size for p in packs], kind="stable")
        j = int(order[0])
        pj = packs[j]
        X = pj[4] - j
        if j > 0:
            X = X[pj[2] >= j]
        for oi in order[1:]:
            i = int(oi)
            X = X[_member(packs[i][4], X + i)]
            if X.size == 0:
                return empty
    else:
        X = None  # anchors come straight from the alternatives
    kept = []
    for alt in alts:
        pal = _pos_pack(reader, seg_ids, alt)
        if pal is None:
            continue
        if X is None:
            kept.append(pal[4])
        else:
            kept.append(X[_member(pal[4], X + last_off)])
    if not kept:
        return empty
    anchors = np.concatenate(kept)
    docs, counts = np.unique(anchors // _POS_M, return_counts=True)
    if fixed:
        d0, dl0 = packs[0][0], packs[0][1]
    else:
        # doc lengths merged across the alternatives' packs
        all_p = [
            _pos_pack(reader, seg_ids, a)
            for a in alts
            if _pos_pack(reader, seg_ids, a) is not None
        ]
        d0 = np.concatenate([p[0] for p in all_p])
        dl0 = np.concatenate([p[1] for p in all_p])
        d0, first = np.unique(d0, return_index=True)
        dl0 = dl0[first]
    dls = dl0[np.searchsorted(d0, docs)]
    return docs, counts.astype(np.int64), dls


def score_phrase_prefix(
    reader: IndexReader,
    seg_ids: list[int],
    fixed: list[str],
    alts: list[str],
    k: int,
) -> list[tuple[float, int, int]]:
    """BM25 top-k over the multi-phrase-as-pseudo-term."""
    docs, counts, dls = match_phrase_prefix(reader, seg_ids, fixed, alts)
    return _score_pseudo(reader, docs, counts, dls, k)


class PhrasePrefixSearcherActor:
    """Actor-pool stage: batch of (query_id, terms[fixed prefix words],
    alts[dictionary expansions of the trailing prefix]) -> (query_id,
    rank, doc_id, n_occ, score).  Expansion happens ONCE at the driver
    (the dictionary read is a capped point scan); actors only probe."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {
                t
                for ts, al in zip(
                    batch["terms"].to_pylist(), batch["alts"].to_pylist()
                )
                for t in list(ts) + list(al)
            }
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_c, out_s = [], [], [], [], []
        for qid, terms, alts in zip(
            batch["query_id"].to_pylist(),
            batch["terms"].to_pylist(),
            batch["alts"].to_pylist(),
        ):
            for rank, (score, doc_id, n_occ) in enumerate(
                score_phrase_prefix(
                    self.reader, self.seg_ids, list(terms), list(alts), self.k
                ),
                1,
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


def phrase_prefix_search(
    index_dir: str,
    queries: list[tuple[int, list[str], str]],
    *,
    k: int = 10,
    max_expansions: int = 50,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """ES match_phrase_prefix: ``(query_id, fixed_terms, prefix)`` -> the
    trailing prefix expands against the index term dictionary (capped to
    the ``max_expansions`` highest-df terms, ties by term — the same
    rewrite cap as wildcard_search), then a MultiPhrase match scored as
    a pseudo-term.  Dictionary expansion is one streamed capped scan at
    the driver; matching runs in the actor pool."""
    from .expand import expand_wildcard

    pats = [(qid, prefix + "%") for qid, _fixed, prefix in queries]
    exp = expand_wildcard(index_dir, pats, max_expansions=max_expansions)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _, _ in queries], pa.int64()),
                "terms": pa.array(
                    [f for _, f, _ in queries], pa.list_(pa.string())
                ),
                "alts": pa.array(
                    [exp.get(qid, []) for qid, _, _ in queries],
                    pa.list_(pa.string()),
                ),
            }
        )
    )
    return qds.map_batches(
        PhrasePrefixSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# --------------------------------------------------- span_not (exclusion)

def score_span_not(
    reader: IndexReader,
    seg_ids: list[int],
    term_a: str,
    term_b: str,
    dist: int,
    k: int,
) -> list[tuple[float, int, int]]:
    """Lucene SpanNotQuery (pre=post=``dist``): occurrences of
    ``term_a`` with NO ``term_b`` within ``dist`` token positions,
    doc-ranked by the surviving-occurrence pseudo-term BM25.  Fully
    vectorized: both terms' occurrence-key arrays are sorted, so the
    exclusion test is two searchsorted probes per a-occurrence (a
    b-key in ``[key_a - dist, key_a + dist]`` means exclusion; the
    positional radix slack guarantees the window never crosses a doc
    boundary in key space for ``dist <= _POS_SLACK``)."""
    if dist > _POS_SLACK:
        raise ValueError(
            f"span_not distance {dist} exceeds the positional key slack "
            f"({_POS_SLACK})"
        )
    pa_ = _pos_pack(reader, seg_ids, term_a)
    if pa_ is None:
        return []
    keys_a = pa_[4]
    pb = _pos_pack(reader, seg_ids, term_b)
    if pb is None:
        surviving = keys_a
    else:
        kb = pb[4]
        lo = np.searchsorted(kb, keys_a - dist, side="left")
        hi = np.searchsorted(kb, keys_a + dist, side="right")
        surviving = keys_a[lo == hi]
    if surviving.size == 0:
        return []
    docs, counts = np.unique(surviving // _POS_M, return_counts=True)
    dls = pa_[1][np.searchsorted(pa_[0], docs)]
    return _score_pseudo(reader, docs, counts.astype(np.int64), dls, k)


class SpanNotSearcherActor:
    """Actor-pool stage: batch of (query_id, term_a, term_b, dist) ->
    (query_id, rank, doc_id, n_occ, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            (
                set(batch["term_a"].to_pylist())
                | set(batch["term_b"].to_pylist())
            )
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_c, out_s = [], [], [], [], []
        for qid, ta, tb, dist in zip(
            batch["query_id"].to_pylist(),
            batch["term_a"].to_pylist(),
            batch["term_b"].to_pylist(),
            batch["dist"].to_pylist(),
        ):
            for rank, (score, doc_id, n_occ) in enumerate(
                score_span_not(
                    self.reader, self.seg_ids, ta, tb, int(dist), self.k
                ),
                1,
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


def span_not_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """SpanNot pipeline: (query_id, term_a, term_b, dist) -> (query_id,
    rank, doc_id, n_occ, score) over a ``positions=True`` index."""
    return queries.map_batches(
        SpanNotSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def score_span_first(
    reader: IndexReader,
    seg_ids: list[int],
    term: str,
    first_n: int,
    k: int,
) -> list[tuple[float, int, int]]:
    """Lucene SpanFirstQuery (``end=first_n``): occurrences of ``term``
    whose token position is within the FIRST ``first_n`` tokens of the
    doc (0-based engine positions ``pos < first_n``, i.e. 1-based oracle
    positions ``i <= first_n``), doc-ranked by the surviving-occurrence
    pseudo-term BM25 — tf = surviving occurrences, df = docs with at
    least one.  Fully vectorized: the pack's position array aligns with
    its occurrence-key array, so survival is ONE boolean mask — no
    per-occurrence loop and no window probe at all (position is an
    absolute attribute, unlike span_not's relative test)."""
    p = _pos_pack(reader, seg_ids, term)
    if p is None:
        return []
    surviving = p[4][p[2] < first_n]
    if surviving.size == 0:
        return []
    docs, counts = np.unique(surviving // _POS_M, return_counts=True)
    dls = p[1][np.searchsorted(p[0], docs)]
    return _score_pseudo(reader, docs, counts.astype(np.int64), dls, k)


class SpanFirstSearcherActor:
    """Actor-pool stage: batch of (query_id, term, first_n) ->
    (query_id, rank, doc_id, n_occ, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(set(batch["term"].to_pylist()) - self.seeded)
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_c, out_s = [], [], [], [], []
        for qid, t, n in zip(
            batch["query_id"].to_pylist(),
            batch["term"].to_pylist(),
            batch["first_n"].to_pylist(),
        ):
            for rank, (score, doc_id, n_occ) in enumerate(
                score_span_first(
                    self.reader, self.seg_ids, t, int(n), self.k
                ),
                1,
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


def span_first_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """SpanFirst pipeline: (query_id, term, first_n) -> (query_id, rank,
    doc_id, n_occ, score) over a ``positions=True`` index."""
    return queries.map_batches(
        SpanFirstSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def score_span_containing(
    reader: IndexReader,
    seg_ids: list[int],
    term_a: str,
    term_b: str,
    gap: int,
    little: str,
    k: int,
) -> list[tuple[float, int, int]]:
    """Lucene SpanContainingQuery with ``big`` = the unordered pair
    (term_a, term_b) within ``gap`` (``|i - j| <= gap``, i a position of
    A, j of B, A != B) and ``little`` = an occurrence of ``little``:
    a big span [min(i,j), max(i,j)] matches iff it CONTAINS at least one
    little position (endpoints inclusive); per-doc tf = matching (i, j)
    pair count, ranked by the pseudo-term BM25 tail.

    Fully vectorized over the fixed-radix occurrence keys: each A
    occurrence's B-window is two searchsorted probes; pairs flatten via
    repeat + offset arange; containment is ONE probe of the little key
    array per pair.  ``gap < _POS_SLACK`` keeps windows from bleeding
    across the >= _POS_SLACK inter-doc key gaps, so no per-doc loop and
    no doc-equality checks are needed (same guard as match_ordered)."""
    if term_a == term_b:
        raise ValueError("span_containing big pair must use distinct terms")
    if gap < 0 or gap >= _POS_SLACK:
        raise ValueError(f"gap must be in [0, {_POS_SLACK})")
    pa_ = _pos_pack(reader, seg_ids, term_a)
    pb = _pos_pack(reader, seg_ids, term_b)
    pl = _pos_pack(reader, seg_ids, little)
    if pa_ is None or pb is None or pl is None:
        return []
    ka, kb, kl = pa_[4], pb[4], pl[4]
    lo = np.searchsorted(kb, ka - gap, side="left")
    hi = np.searchsorted(kb, ka + gap, side="right")
    cnt = hi - lo
    m = cnt > 0
    if not m.any():
        return []
    ka_m, lo_m, cnt_m = ka[m], lo[m], cnt[m]
    # flatten the per-anchor B windows into explicit pair indices
    pair_a = np.repeat(ka_m, cnt_m)
    steps = np.arange(int(cnt_m.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(cnt_m)[:-1])), cnt_m
    )
    pair_b = kb[np.repeat(lo_m, cnt_m) + steps]
    span_lo = np.minimum(pair_a, pair_b)
    span_hi = np.maximum(pair_a, pair_b)
    idx = np.searchsorted(kl, span_lo, side="left")
    ok = idx < kl.size
    ok[ok] &= kl[idx[ok]] <= span_hi[ok]
    if not ok.any():
        return []
    docs, counts = np.unique(span_lo[ok] // _POS_M, return_counts=True)
    dls = pa_[1][np.searchsorted(pa_[0], docs)]
    return _score_pseudo(reader, docs, counts.astype(np.int64), dls, k)


class SpanContainingSearcherActor:
    """Actor-pool stage: batch of (query_id, term_a, term_b, gap,
    little) -> (query_id, rank, doc_id, n_occ, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        want = (
            set(batch["term_a"].to_pylist())
            | set(batch["term_b"].to_pylist())
            | set(batch["little"].to_pylist())
        )
        all_terms = sorted(want - self.seeded)
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_c, out_s = [], [], [], [], []
        for qid, a, b, g, c in zip(
            batch["query_id"].to_pylist(),
            batch["term_a"].to_pylist(),
            batch["term_b"].to_pylist(),
            batch["gap"].to_pylist(),
            batch["little"].to_pylist(),
        ):
            for rank, (score, doc_id, n_occ) in enumerate(
                score_span_containing(
                    self.reader, self.seg_ids, a, b, int(g), c, self.k
                ),
                1,
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


def span_containing_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """SpanContaining pipeline: (query_id, term_a, term_b, gap, little)
    -> (query_id, rank, doc_id, n_occ, score) over a ``positions=True``
    index."""
    return queries.map_batches(
        SpanContainingSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def score_span_within(
    reader: IndexReader,
    seg_ids: list[int],
    term_a: str,
    term_b: str,
    gap: int,
    little: str,
    k: int,
) -> list[tuple[float, int, int]]:
    """Lucene SpanWithinQuery — the dual of :func:`score_span_containing`:
    ``little`` occurrences that are enclosed by at least one ``big``
    span, where big = the unordered pair (term_a, term_b) within ``gap``
    (``|i - j| <= gap``, A != B) and the enclosing test is endpoint-
    inclusive.  Per-doc tf = the count of DISTINCT little positions
    contained by any big span (each occurrence matches at most once,
    Lucene's span-stream semantics), ranked by the pseudo-term BM25
    tail over the little pack's doc lengths.

    Vectorized dual of the containing probe: big spans are enumerated
    exactly as in :func:`score_span_containing`, then sorted by span_lo
    with a running max of span_hi; each little key is ONE searchsorted
    probe against span_lo + one running-max comparison.  The
    ``gap < _POS_SLACK`` guard keeps spans inside their doc's key range
    (inter-doc key gaps are >= _POS_SLACK), so a running max from an
    earlier doc can never reach a later doc's little keys and no per-doc
    loop is needed."""
    if term_a == term_b:
        raise ValueError("span_within big pair must use distinct terms")
    if gap < 0 or gap >= _POS_SLACK:
        raise ValueError(f"gap must be in [0, {_POS_SLACK})")
    pa_ = _pos_pack(reader, seg_ids, term_a)
    pb = _pos_pack(reader, seg_ids, term_b)
    pl = _pos_pack(reader, seg_ids, little)
    if pa_ is None or pb is None or pl is None:
        return []
    ka, kb, kl = pa_[4], pb[4], pl[4]
    lo = np.searchsorted(kb, ka - gap, side="left")
    hi = np.searchsorted(kb, ka + gap, side="right")
    cnt = hi - lo
    m = cnt > 0
    if not m.any():
        return []
    ka_m, lo_m, cnt_m = ka[m], lo[m], cnt[m]
    pair_a = np.repeat(ka_m, cnt_m)
    steps = np.arange(int(cnt_m.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(cnt_m)[:-1])), cnt_m
    )
    pair_b = kb[np.repeat(lo_m, cnt_m) + steps]
    span_lo = np.minimum(pair_a, pair_b)
    span_hi = np.maximum(pair_a, pair_b)
    # little key kp is enclosed iff some span has span_lo <= kp <= span_hi:
    # with spans sorted by span_lo, that is runmax(span_hi up to the last
    # span starting <= kp) >= kp — one probe per little occurrence
    order = np.argsort(span_lo, kind="stable")
    slo = span_lo[order]
    run_hi = np.maximum.accumulate(span_hi[order])
    idx = np.searchsorted(slo, kl, side="right") - 1
    ok = idx >= 0
    ok[ok] &= run_hi[idx[ok]] >= kl[ok]
    if not ok.any():
        return []
    docs, counts = np.unique(kl[ok] // _POS_M, return_counts=True)
    dls = pl[1][np.searchsorted(pl[0], docs)]
    return _score_pseudo(reader, docs, counts.astype(np.int64), dls, k)


class SpanWithinSearcherActor(SpanContainingSearcherActor):
    """Actor-pool stage: same (query_id, term_a, term_b, gap, little)
    batch contract as SpanContainingSearcherActor, scored by
    :func:`score_span_within` (little-side hits instead of big-side)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        want = (
            set(batch["term_a"].to_pylist())
            | set(batch["term_b"].to_pylist())
            | set(batch["little"].to_pylist())
        )
        all_terms = sorted(want - self.seeded)
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_c, out_s = [], [], [], [], []
        for qid, a, b, g, c in zip(
            batch["query_id"].to_pylist(),
            batch["term_a"].to_pylist(),
            batch["term_b"].to_pylist(),
            batch["gap"].to_pylist(),
            batch["little"].to_pylist(),
        ):
            for rank, (score, doc_id, n_occ) in enumerate(
                score_span_within(
                    self.reader, self.seg_ids, a, b, int(g), c, self.k
                ),
                1,
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


def span_within_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """SpanWithin pipeline: (query_id, term_a, term_b, gap, little) ->
    (query_id, rank, doc_id, n_occ, score) over a ``positions=True``
    index; n_occ counts enclosed little occurrences."""
    return queries.map_batches(
        SpanWithinSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ------------------------------------------------- synonym graph (multi-word)

def score_all_syngraph(
    reader: IndexReader,
    seg_ids: list[int],
    groups: list[list],
    k: int,
) -> list[tuple[float, int]]:
    """Multi-word synonym scoring — the Lucene ``SynonymGraphFilter`` +
    ``SynonymQuery`` composition: a query term's group may contain
    PHRASES ("big data" ≈ bigdata), and the group scores as ONE
    pseudo-term with per-doc tf = sum of member tfs (a phrase member's
    tf is its per-doc occurrence count from the positional intersection)
    and df = max over member dfs (a phrase's df = its live matching-doc
    count).  Exactly :func:`..stages.search.score_all_syn`'s merged-stat
    rule with :func:`match_phrase` as the extra tf source — needs a
    ``positions=True`` index.  ``groups`` members are ``str`` (term) or
    ``list[str]`` (ordered phrase)."""
    from .deletes import live_mask

    merged: list[tuple[np.ndarray, np.ndarray]] = []
    lo = hi = None
    for members in groups:
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        dfs: list[int] = []
        for m in members:
            if isinstance(m, str):
                arrs = reader.term_tf_dl(seg_ids, m)
                if arrs is not None:
                    parts.append(arrs)
                dfs.append(int(reader.dfs([m])[m]))
            else:
                docs, cnt, dls = match_phrase(reader, seg_ids, list(m))
                if reader.deleted.size and docs.size:
                    mask = live_mask(docs, reader.deleted)
                    docs, cnt, dls = docs[mask], cnt[mask], dls[mask]
                if docs.size:
                    parts.append((docs, cnt, dls))
                dfs.append(int(docs.size))
        if not parts:
            continue
        df_g = max(dfs)
        idf = math.log(1.0 + (reader.n_docs - df_g + 0.5) / (df_g + 0.5))
        alldoc = np.concatenate([p[0] for p in parts])
        alltf = np.concatenate([p[1] for p in parts])
        alldl = np.concatenate([p[2] for p in parts])
        uniq, inv = np.unique(alldoc, return_inverse=True)
        tfm = np.bincount(inv, weights=alltf.astype(np.float64))
        dlm = np.zeros(uniq.size, dtype=np.float64)
        dlm[inv] = alldl
        w = (tfm * (K1 + 1.0)) / (
            tfm + K1 * (1.0 - B + B * dlm / reader.avgdl)
        )
        merged.append((uniq, idf * w))
        tlo, thi = int(uniq[0]), int(uniq[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not merged:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for docids, contrib in merged:
        idx = docids - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        cand = cand[live_mask(cand + lo, reader.deleted)]
    return _topk_exact(scores[cand], cand + lo, k)


class SynGraphSearcherActor:
    """Actor-pool stage: batch of (query_id, terms) -> (query_id, rank,
    doc_id, score); each term expands to its synonym-graph group
    ``[term] + syn_map.get(term, [])`` where mapped members may be
    multi-word phrases.  Reader + positional packs load once per
    actor."""

    def __init__(self, index_dir: str, syn_map: dict, k: int = 10,
                 packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        # keys -> list of members; a member is a term or a phrase list
        self.syn_map = {
            t: [list(m) if not isinstance(m, str) else m for m in ms]
            for t, ms in syn_map.items()
        }
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        need = set()
        for ts in batch["terms"].to_pylist():
            for t in ts:
                need.add(t)
                for m in self.syn_map.get(t, []):
                    need.update([m] if isinstance(m, str) else m)
        load = sorted(need - self.seeded)
        for sid in self.seg_ids:
            self.reader.load_postings(sid, load)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            groups = [
                [t] + list(self.syn_map.get(t, []))
                for t in sorted(set(terms))
            ]
            top = score_all_syngraph(
                self.reader, self.seg_ids, groups, self.k
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


def syngraph_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    syn_map: dict,
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Multi-word synonym query pipeline over a positional index:
    (query_id, terms) -> (query_id, rank, doc_id, score)."""
    return queries.map_batches(
        SynGraphSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "syn_map": syn_map, "k": k,
            "packs_ref": packs_ref,
        },
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

    Vectorized anchor sweep over the CACHED fixed-radix key arrays
    (doc*_POS_M + pos, built once per term in :func:`_pos_pack`): any
    satisfying assignment has a minimum position, and that minimum is an
    occurrence of one of the terms — so for each anchor term j, test
    every occurrence p of j (restricted to the docid-intersection
    candidates) for "every term has an occurrence in
    [p, p + window - 1]" with two searchsorteds per term, then OR-reduce
    per doc.  O(m^2 · occ) numpy kernels, no per-doc Python loop and no
    per-query key rebuild.  ``window`` is capped at ``_POS_SLACK`` (the
    radix headroom that makes cross-doc key bleed impossible)."""
    uniq = sorted(set(terms))
    if not uniq or window < 1:
        return np.empty(0, dtype=np.int64)
    if window > _POS_SLACK:
        raise ValueError(
            f"window {window} exceeds the positional key radix headroom "
            f"({_POS_SLACK}); raise _POS_SLACK/_POS_M"
        )
    packs = []
    for t in uniq:
        p = _pos_pack(reader, seg_ids, t)
        if p is None:
            return np.empty(0, dtype=np.int64)
        packs.append(p)
    if len(uniq) == 2:
        # exact 2-term fast path: a doc matches iff SOME cross-pair of
        # occurrences sits within w-1 — one searchsorted of the smaller
        # key array into the larger (nearest neighbour above and below),
        # instead of the general anchor sweep's four full-array probes
        # plus candidate-set gathers.  Key radix guarantees a pair within
        # w-1 (<= _POS_SLACK) never spans two docs.
        a, b = packs[0][4], packs[1][4]
        if a.size > b.size:
            a, b = b, a
        pos = np.searchsorted(b, a)
        ok = np.zeros(a.size, dtype=bool)
        hasup = pos < b.size
        ok[hasup] = b[pos[hasup]] - a[hasup] <= window - 1
        hasdn = pos > 0
        ok[hasdn] |= a[hasdn] - b[pos[hasdn] - 1] <= window - 1
        return np.unique(a[ok] // _POS_M)
    order = np.argsort([p[0].size for p in packs], kind="stable")
    cand = packs[order[0]][0]
    for oi in order[1:]:
        # sorted membership probe (np.isin would re-sort both arrays)
        cand = cand[_member(packs[oi][0], cand)]
        if cand.size == 0:
            return cand
    if len(uniq) == 1:
        return cand
    hit = np.zeros(cand.size, dtype=bool)
    for j in range(len(packs)):
        docids_j, _dls, _pos, occ_bounds_j, keys_j = packs[j]
        # anchor occurrences of term j inside candidate docs: gather the
        # cached keys by posting ranges
        idx = np.searchsorted(docids_j, cand)
        starts, ends = occ_bounds_j[idx], occ_bounds_j[idx + 1]
        anchors = keys_j[_ranges_to_indices(starts, ends)]
        anchor_ci = np.repeat(np.arange(cand.size), ends - starts)
        ok = np.ones(anchors.size, dtype=bool)
        for i in range(len(packs)):
            if i == j:
                continue
            ki = packs[i][4]
            lo = np.searchsorted(ki, anchors)
            hi = np.searchsorted(ki, anchors + window, side="left")
            # pos < _POS_M - _POS_SLACK and window <= _POS_SLACK, so the
            # probe interval can never cross into the next doc's keys
            ok &= hi > lo
        hit[anchor_ci[ok]] = True
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
    if reader.deleted.size and docs.size:
        from .deletes import live_mask

        docs = docs[live_mask(docs, reader.deleted)]
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

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts} - self.seeded
        )
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
    packs_ref=None,
) -> "ray.data.Dataset":
    """Proximity query pipeline: (query_id, terms, window) -> (query_id,
    rank, doc_id, score) over a ``positions=True`` index.  ``packs_ref``
    as in :func:`phrase_search`."""
    return queries.map_batches(
        WindowSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# --------------------------------------------------- ordered span-near

def match_ordered(
    reader: IndexReader, seg_ids: list[int], terms: list[str], slop: int
) -> np.ndarray:
    """Lucene ``SpanNearQuery(in_order=true)``: docs containing
    occurrences of the terms IN QUERY ORDER at strictly increasing
    positions p1 < p2 < ... < pm with total width
    ``pm - p1 <= slop + m - 1`` (the Lucene ``matchWidth - minWidth <=
    slop`` rule).  Returns matching doc_ids ascending.

    Greedy minimal chain, fully vectorized: for every occurrence of the
    first term (the anchor), the earliest-successor chain — next
    occurrence of term i+1 strictly after the chain's current position,
    one ``searchsorted(side='right')`` per term over the cached
    fixed-radix key arrays — minimizes the final position, so an anchor
    starts a valid span iff its greedy chain does.  O(m · occ) probes,
    no per-doc Python loop.  A successor that bleeds into a later doc
    inflates the width by >= ``_POS_SLACK`` (positions are
    ``< _POS_M - _POS_SLACK``), which the guard below keeps strictly
    above any admissible width, so cross-doc chains can never match."""
    if not terms or slop < 0:
        return np.empty(0, dtype=np.int64)
    if slop + len(terms) > _POS_SLACK:
        raise ValueError(
            f"slop {slop} with {len(terms)} terms exceeds the positional "
            f"key radix headroom ({_POS_SLACK}); raise _POS_SLACK/_POS_M"
        )
    packs = []
    for t in terms:  # query order, duplicates allowed
        p = _pos_pack(reader, seg_ids, t)
        if p is None:
            return np.empty(0, dtype=np.int64)
        packs.append(p)
    anchors = packs[0][4]
    cur = anchors
    for p in packs[1:]:
        ki = p[4]
        idx = np.searchsorted(ki, cur, side="right")
        keep = idx < ki.size
        anchors = anchors[keep]
        cur = ki[idx[keep]]
        if anchors.size == 0:
            return np.empty(0, dtype=np.int64)
    ok = cur - anchors <= slop + (len(packs) - 1)
    return np.unique(anchors[ok] // _POS_M)


def score_ordered(
    reader: IndexReader,
    seg_ids: list[int],
    terms: list[str],
    slop: int,
    k: int,
) -> list[tuple[float, int]]:
    """Ordered span-near top-k: docs passing :func:`match_ordered`,
    ranked by the plain BM25 sum over the distinct terms — identical
    per-(doc, term) contributions to the exact scorer, so this is the
    ordered positional filter composed with the shared ranking."""
    docs = match_ordered(reader, seg_ids, terms, slop)
    if reader.deleted.size and docs.size:
        from .deletes import live_mask

        docs = docs[live_mask(docs, reader.deleted)]
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


class OrderedSearcherActor:
    """Actor-pool stage: batch of (query_id, terms[in order], slop) ->
    (query_id, rank, doc_id, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts} - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms, slop in zip(
            batch["query_id"].to_pylist(),
            batch["terms"].to_pylist(),
            batch["slop"].to_pylist(),
        ):
            top = score_ordered(
                self.reader, self.seg_ids, list(terms), int(slop), self.k
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


def ordered_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Ordered span-near pipeline: (query_id, terms, slop) -> (query_id,
    rank, doc_id, score) over a ``positions=True`` index.  ``packs_ref``
    as in :func:`phrase_search`."""
    return queries.map_batches(
        OrderedSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ---------------------------------- sequential dependence model (SDM)

SDM_MU = 2000.0
SDM_WINDOW = 8
SDM_LAMBDAS = (0.85, 0.10, 0.05)


def pair_window_counts(
    reader: IndexReader, seg_ids: list[int], ta: str, tb: str, window: int
) -> Optional[tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """Per-doc count of (occurrence-of-``ta``, occurrence-of-``tb``)
    index pairs with ``|pos_a - pos_b| <= window - 1`` (the SDM #uwN
    co-occurrence statistic; every (i, j) combination counts once, and
    for ``ta == tb`` the self-pair is excluded).  Returns ``(docids,
    counts, dls, corpus_total)`` over docs with count > 0, or None when
    either term is absent.  Two searchsorteds per ``ta`` occurrence over
    the cached fused key arrays + one ``reduceat`` per doc — the key
    radix (positions < _POS_M - _POS_SLACK, window <= _POS_SLACK) makes
    cross-doc pairs impossible, so the corpus-wide arrays need no
    per-doc loop."""
    if window < 1 or window > _POS_SLACK:
        raise ValueError(
            f"window {window} outside [1, {_POS_SLACK}] "
            "(positional key radix headroom)"
        )
    p_a = _pos_pack(reader, seg_ids, ta)
    p_b = _pos_pack(reader, seg_ids, tb)
    if p_a is None or p_b is None:
        return None
    ka, kb = p_a[4], p_b[4]
    lo = np.searchsorted(kb, ka - (window - 1), side="left")
    hi = np.searchsorted(kb, ka + (window - 1), side="right")
    cnt = (hi - lo).astype(np.int64)
    if ta == tb:
        cnt -= 1  # each ta occurrence found itself in kb
    docs_occ = ka // _POS_M
    change = np.empty(docs_occ.size, dtype=bool)
    change[0] = True
    change[1:] = docs_occ[1:] != docs_occ[:-1]
    starts = np.flatnonzero(change)
    docs = docs_occ[starts]
    sums = np.add.reduceat(cnt, starts)
    keep = sums > 0
    docs, sums = docs[keep], sums[keep]
    if docs.size == 0:
        return None
    dls = p_a[1][np.searchsorted(p_a[0], docs)]
    return docs, sums, dls, int(sums.sum())


def score_sdm(
    reader: IndexReader,
    seg_ids: list[int],
    terms: list[str],
    k: int,
    *,
    mu: float = SDM_MU,
    window: int = SDM_WINDOW,
    lambdas: tuple[float, float, float] = SDM_LAMBDAS,
) -> list[tuple[float, int]]:
    """Sequential dependence model (Metzler & Croft, SIGIR 2005 — the
    Indri/Galago MRF retrieval model): three feature families combined
    with pinned weights (0.85, 0.10, 0.05) —

    * unigram: every DISTINCT query term,
    * ordered bigram (#1): every ADJACENT query-term pair's exact
      phrase count (:func:`match_phrase`),
    * unordered window (#uw8): the same pairs' within-8 co-occurrence
      pair counts (:func:`pair_window_counts`),

    each feature scored with the SAME pinned LM-Dirichlet contribution
    shape as ``score_all_lmd`` — ln(1 + tf*T/(mu*cf_x)) +
    ln(mu/(dl+mu)), where cf_x is the feature's own collection count
    (bigram/window collection counts come for free from the fused
    corpus-wide arrays) and T is the corpus token total — summed over
    PRESENT features only (the join semantics every oracle shares).
    Candidate docs are the union of any present feature's docs."""
    T = float(reader.total_len)
    lam_t, lam_o, lam_u = lambdas
    per_docs: list[np.ndarray] = []
    per_contrib: list[np.ndarray] = []

    def add(docids, tfs, dls, cf_x: int, lam: float) -> None:
        if docids.size == 0:
            return
        contrib = lam * (
            np.log(1.0 + tfs.astype(np.float64) * T / (mu * float(cf_x)))
            + np.log(mu / (dls.astype(np.float64) + mu))
        )
        per_docs.append(docids)
        per_contrib.append(contrib)

    uniq = sorted(set(terms))
    cfs = reader.cfs(uniq)
    for t in uniq:
        if not cfs.get(t, 0):
            continue
        arrs = reader.term_tf_dl(seg_ids, t)
        if arrs is not None:
            add(arrs[0], arrs[1], arrs[2], cfs[t], lam_t)
    for ta, tb in zip(terms, terms[1:]):  # query order, as written
        docs, counts, dls = match_phrase(reader, seg_ids, [ta, tb])
        cf_o = int(counts.sum())
        if cf_o:
            add(docs, counts, dls, cf_o, lam_o)
        pw = pair_window_counts(reader, seg_ids, ta, tb, window)
        if pw is not None:
            add(pw[0], pw[1], pw[2], pw[3], lam_u)
    if not per_contrib:
        return []
    lo = min(int(d[0]) for d in per_docs)
    hi = max(int(d[-1]) for d in per_docs)
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for docids, contrib in zip(per_docs, per_contrib):
        idx = docids - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if reader.deleted.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand + lo, reader.deleted)]
    return _topk_exact(scores[cand], cand + lo, k)


class SdmSearcherActor:
    """Actor-pool stage: batch of (query_id, terms[in order]) ->
    (query_id, rank, doc_id, score) under the SDM scorer."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts} - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            top = score_sdm(self.reader, self.seg_ids, list(terms), self.k)
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


def sdm_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """SDM pipeline: (query_id, terms) -> (query_id, rank, doc_id,
    score) over a ``positions=True`` index."""
    return queries.map_batches(
        SdmSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ----------------------------------------------- span_or within near

def match_ordered_groups(
    reader: IndexReader,
    seg_ids: list[int],
    groups: list[list[str]],
    slop: int,
) -> np.ndarray:
    """Lucene ``SpanNearQuery(in_order=true)`` over ``SpanOrQuery``
    clauses: each chain slot is a UNION of alternative terms — the
    slot's occurrence set is the merged (sorted) key set of its
    members — and the slots must match at strictly increasing positions
    with width <= slop + m - 1, exactly :func:`match_ordered`'s rule.
    Absent members drop out of their union; a slot whose EVERY member
    is absent can never match.  Same vectorized greedy
    earliest-successor chain (the merged key arrays are sorted, so one
    ``searchsorted`` per slot still works); a (doc, pos) can hold only
    one term, so the union never introduces duplicate keys."""
    if not groups or slop < 0:
        return np.empty(0, dtype=np.int64)
    if slop + len(groups) > _POS_SLACK:
        raise ValueError(
            f"slop {slop} with {len(groups)} slots exceeds the positional "
            f"key radix headroom ({_POS_SLACK}); raise _POS_SLACK/_POS_M"
        )
    slot_keys: list[np.ndarray] = []
    for g in groups:
        arrs = [
            p[4]
            for t in g
            if (p := _pos_pack(reader, seg_ids, t)) is not None
        ]
        if not arrs:
            return np.empty(0, dtype=np.int64)
        keys = arrs[0] if len(arrs) == 1 else np.sort(np.concatenate(arrs))
        slot_keys.append(keys)
    anchors = slot_keys[0]
    cur = anchors
    for ki in slot_keys[1:]:
        idx = np.searchsorted(ki, cur, side="right")
        keep = idx < ki.size
        anchors = anchors[keep]
        cur = ki[idx[keep]]
        if anchors.size == 0:
            return np.empty(0, dtype=np.int64)
    ok = cur - anchors <= slop + (len(slot_keys) - 1)
    return np.unique(anchors[ok] // _POS_M)


def score_ordered_groups(
    reader: IndexReader,
    seg_ids: list[int],
    groups: list[list[str]],
    slop: int,
    k: int,
) -> list[tuple[float, int]]:
    """span_or-near top-k: docs passing :func:`match_ordered_groups`,
    ranked by the plain BM25 sum over the DISTINCT member terms of all
    slots (same composition rule as :func:`score_ordered`: positional
    filter + the shared term ranking)."""
    docs = match_ordered_groups(reader, seg_ids, groups, slop)
    if reader.deleted.size and docs.size:
        from .deletes import live_mask

        docs = docs[live_mask(docs, reader.deleted)]
    if docs.size == 0:
        return []
    uniq = sorted({t for g in groups for t in g})
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


class SpanOrNearSearcherActor:
    """Actor-pool stage: batch of (query_id, groups[list<list<string>>],
    slop) -> (query_id, rank, doc_id, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {
                t
                for gs in batch["groups"].to_pylist()
                for g in gs
                for t in g
            }
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, gs, slop in zip(
            batch["query_id"].to_pylist(),
            batch["groups"].to_pylist(),
            batch["slop"].to_pylist(),
        ):
            top = score_ordered_groups(
                self.reader, self.seg_ids, [list(g) for g in gs],
                int(slop), self.k,
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


def span_or_near_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """span_or-within-near pipeline: (query_id, groups, slop) ->
    (query_id, rank, doc_id, score) over a ``positions=True`` index."""
    return queries.map_batches(
        SpanOrNearSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ------------------------------------------------------- intervals

def match_intervals(
    reader: IndexReader, seg_ids: list[int], terms: list[str], max_gaps: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lucene ``IntervalsQuery`` / ``Intervals.maxgaps(g,
    Intervals.ordered(...))`` semantics: MINIMAL ordered intervals —
    ordered matches (p1 < p2 < ... < pm) such that no other ordered
    match is strictly contained — filtered to total gap count
    ``(pm - p1 + 1) - m <= max_gaps``.  Returns ``(doc_ids, n_occ,
    dls)`` with ``n_occ`` = the doc's surviving minimal-interval count
    (the IntervalsSource freq), doc-ascending.

    The difference from :func:`match_ordered` is exactly minimality:
    span_near asks "does any admissible window exist" per doc, while
    intervals COUNT non-redundant occurrences — ``"a x b a b"`` has two
    minimal (a..b) intervals but one subsumes nothing of the other.

    Fully vectorized backward-greedy chain: for every occurrence of the
    LAST term (the end), take the LARGEST occurrence of term m-1
    strictly before it, then the largest of m-2 before that, ... — one
    ``searchsorted(side='left') - 1`` per term over the cached
    fixed-radix key arrays.  The greedy chain maximizes the start, so
    every ordered match ending at e contains the greedy interval
    (s(e), e); s(e) is non-decreasing in e, hence the minimal set is
    exactly {(s, min e over ends sharing s)} — one ``np.unique`` with
    ``return_index`` on the (doc-qualified) start keys.  A backward
    step that bleeds into an earlier doc inflates the key width past
    ``_POS_SLACK`` (positions are ``< _POS_M - _POS_SLACK``), which the
    gap filter below keeps strictly above any admissible width, so
    cross-doc chains can never match."""
    return match_intervals_groups(
        reader, seg_ids, [[t] for t in terms], max_gaps
    )


def match_intervals_groups(
    reader: IndexReader,
    seg_ids: list[int],
    groups: list[list[str]],
    max_gaps: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """:func:`match_intervals` generalized to ``Intervals.or`` slots:
    each chain slot is a UNION of alternative terms (merged sorted key
    set — duplicate-free, a (doc, pos) holds one term), and minimal
    intervals are counted over the union semantics.  The backward
    greedy chain and the staircase minimality argument only rely on
    each slot's occurrence set being sorted, so both carry over
    unchanged; ``match_intervals`` is the singleton-slot special
    case."""
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if not groups or max_gaps < 0:
        return empty
    if max_gaps + len(groups) > _POS_SLACK:
        raise ValueError(
            f"max_gaps {max_gaps} with {len(groups)} slots exceeds the "
            f"positional key radix headroom ({_POS_SLACK}); raise "
            "_POS_SLACK/_POS_M"
        )
    slot_keys: list[np.ndarray] = []
    last_packs: list[tuple] = []
    for gi, g in enumerate(groups):
        packs = [
            p
            for t in g
            if (p := _pos_pack(reader, seg_ids, t)) is not None
        ]
        if not packs:
            return empty
        keys = (
            packs[0][4]
            if len(packs) == 1
            else np.sort(np.concatenate([p[4] for p in packs]))
        )
        slot_keys.append(keys)
        if gi == len(groups) - 1:
            last_packs = packs
    ends = slot_keys[-1]
    cur = ends
    for ki in reversed(slot_keys[:-1]):
        idx = np.searchsorted(ki, cur, side="left") - 1
        keep = idx >= 0
        ends = ends[keep]
        cur = ki[idx[keep]]
        if ends.size == 0:
            return empty
    # ends is ascending and cur (starts) is non-decreasing along it, so
    # return_index picks the SMALLEST end per distinct start == minimal
    starts, first_idx = np.unique(cur, return_index=True)
    ends_min = ends[first_idx]
    ok = ends_min - starts <= max_gaps + (len(groups) - 1)
    if not np.any(ok):
        return empty
    docs, counts = np.unique(starts[ok] // _POS_M, return_counts=True)
    # per-doc lengths from the last slot's member packs (a matched doc
    # has a last-slot occurrence, so one member pack covers it)
    dd = np.concatenate([p[0] for p in last_packs])
    ll = np.concatenate([p[1] for p in last_packs])
    order = np.argsort(dd, kind="stable")
    dd, ll = dd[order], ll[order]
    keep = np.empty(dd.size, dtype=bool)
    keep[0] = True
    keep[1:] = dd[1:] != dd[:-1]
    dd, ll = dd[keep], ll[keep]
    dls = ll[np.searchsorted(dd, docs)]
    return docs, counts.astype(np.int64), dls


def score_intervals(
    reader: IndexReader,
    seg_ids: list[int],
    terms: list[str],
    max_gaps: int,
    k: int,
) -> list[tuple[float, int, int]]:
    """Intervals top-k: the minimal-interval count is the pseudo-term tf
    (the Lucene IntervalsSource freq feeding its per-field similarity),
    scored with the shared phrase/pseudo-term BM25 tail."""
    docs, counts, dls = match_intervals(reader, seg_ids, terms, max_gaps)
    return _score_pseudo(reader, docs, counts, dls, k)


def score_intervals_groups(
    reader: IndexReader,
    seg_ids: list[int],
    groups: list[list[str]],
    max_gaps: int,
    k: int,
) -> list[tuple[float, int, int]]:
    """Union-slot intervals top-k: minimal-interval count as the
    pseudo-term tf, shared BM25 pseudo-term tail."""
    docs, counts, dls = match_intervals_groups(
        reader, seg_ids, groups, max_gaps
    )
    return _score_pseudo(reader, docs, counts, dls, k)


class IntervalsOrSearcherActor:
    """Actor-pool stage: batch of (query_id, groups[list<list<string>>],
    max_gaps) -> (query_id, rank, doc_id, n_occ, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {
                t
                for gs in batch["groups"].to_pylist()
                for g in gs
                for t in g
            }
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_n, out_s = [], [], [], [], []
        for qid, gs, g in zip(
            batch["query_id"].to_pylist(),
            batch["groups"].to_pylist(),
            batch["max_gaps"].to_pylist(),
        ):
            top = score_intervals_groups(
                self.reader, self.seg_ids, [list(x) for x in gs],
                int(g), self.k,
            )
            for rank, (score, doc_id, n_occ) in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_n.append(n_occ)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "n_occ": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def intervals_or_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Union-slot intervals pipeline: (query_id, groups, max_gaps) ->
    (query_id, rank, doc_id, n_occ, score)."""
    return queries.map_batches(
        IntervalsOrSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class IntervalsSearcherActor:
    """Actor-pool stage: batch of (query_id, terms[in order], max_gaps)
    -> (query_id, rank, doc_id, n_occ, score)."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts} - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_n, out_s = [], [], [], [], []
        for qid, terms, g in zip(
            batch["query_id"].to_pylist(),
            batch["terms"].to_pylist(),
            batch["max_gaps"].to_pylist(),
        ):
            top = score_intervals(
                self.reader, self.seg_ids, list(terms), int(g), self.k
            )
            for rank, (score, doc_id, n_occ) in enumerate(top, 1):
                out_q.append(qid)
                out_r.append(rank)
                out_d.append(doc_id)
                out_n.append(n_occ)
                out_s.append(score)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "rank": pa.array(out_r, pa.int32()),
                "doc_id": pa.array(out_d, pa.int64()),
                "n_occ": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def intervals_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """Intervals pipeline: (query_id, terms, max_gaps) -> (query_id,
    rank, doc_id, n_occ, score) over a ``positions=True`` index.
    ``packs_ref`` as in :func:`phrase_search`."""
    return queries.map_batches(
        IntervalsSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
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
    min_should: int | None = None,
) -> list[tuple[float, int]]:
    """AND/OR/NOT candidate filtering + BM25 ranking over must+should.

    Candidates: docs containing ALL ``must`` terms (posting-set
    intersection, rarest first) — or, with no ``must``, ANY ``should``
    term — minus docs containing any ``must_not`` term.  Scores sum
    idf*w over the distinct must+should terms present per candidate, in
    ascending-term order (the pinned accumulation order), using GLOBAL
    df for idf — identical per-(doc, term) contributions to the plain
    BM25 scorer, so a boolean query with no filters ranks exactly like
    ``search`` does.

    ``min_should`` (Lucene minimumShouldMatch): candidates must contain
    at least this many DISTINCT ``should`` terms.  ``None`` keeps the
    classic default — 0 when ``must`` is present (should only boosts
    scoring), else 1 (any should term qualifies, the plain OR)."""
    must = sorted(set(must))
    should = sorted(set(should))
    must_not = sorted(set(must_not))
    if min_should is None:
        min_should = 0 if must else 1
    if min_should > len(should):
        return []
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
            cand = cand[_member(arrs[t][0], cand)]
            if cand.size == 0:
                return []
    else:
        parts = [arrs[t][0] for t in should if arrs[t] is not None]
        if not parts:
            return []
        cand = parts[0]
        for p in parts[1:]:
            cand = np.union1d(cand, p)
    if should and cand.size and (min_should > 1 or (must and min_should >= 1)):
        # count DISTINCT matched should terms per candidate (the union /
        # must intersection guarantees only >=1 / >=0 respectively)
        nm = np.zeros(cand.size, dtype=np.int32)
        for t in should:
            if arrs[t] is not None:
                nm += _member(arrs[t][0], cand)
        cand = cand[nm >= min_should]
        if cand.size == 0:
            return []
    for t in must_not:
        if arrs[t] is not None:
            cand = cand[~_member(arrs[t][0], cand)]
    if reader.deleted.size and cand.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand, reader.deleted)]
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

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None,
                 min_should: int | None = None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)
        self.min_should = min_should

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {
                t
                for col in ("must", "should", "must_not")
                for ts in batch[col].to_pylist()
                for t in ts
            }
            - self.seeded
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
                self.reader, self.seg_ids, list(mu), list(sh), list(mn),
                self.k, min_should=self.min_should,
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
    packs_ref=None,
    min_should: int | None = None,
) -> "ray.data.Dataset":
    """Boolean query pipeline: (query_id, must, should, must_not) ->
    (query_id, rank, doc_id, score).  ``packs_ref`` as in
    :func:`phrase_search` (boolean scoring only touches the pack-derived
    BM25 term arrays; positions ride along unused).  ``min_should`` is
    Lucene minimumShouldMatch (see :func:`score_boolean`)."""
    return queries.map_batches(
        BooleanSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
            "min_should": min_should,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# --------------------------------------------------------------- terms_set


def score_terms_set(
    reader: IndexReader,
    seg_ids: list[int],
    terms: list[str],
    k: int,
    req_mod: int = 3,
) -> list[tuple[float, int]]:
    """Elasticsearch ``terms_set`` query: an OR over ``terms`` whose
    minimum_should_match is a PER-DOCUMENT doc value — here the pinned
    derived field ``required = 1 + doc_id % req_mod`` (ES reads it via
    ``minimum_should_match_field``; the derivation keeps the oracle
    arithmetic).  Candidates are the posting-set union; the distinct
    matching-term count per candidate (the same vectorized membership
    sum as minimumShouldMatch) is compared against each candidate's OWN
    requirement; survivors score exactly like the boolean OR — idf*w
    summed in ascending-term order, the pinned accumulation."""
    terms = sorted(set(terms))
    arrs = {t: reader.term_arrays(seg_ids, t) for t in terms}
    parts = [arrs[t][0] for t in terms if arrs[t] is not None]
    if not parts:
        return []
    cand = parts[0]
    for p in parts[1:]:
        cand = np.union1d(cand, p)
    nm = np.zeros(cand.size, dtype=np.int32)
    for t in terms:
        if arrs[t] is not None:
            nm += _member(arrs[t][0], cand)
    cand = cand[nm >= 1 + (cand % req_mod)]
    if reader.deleted.size and cand.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand, reader.deleted)]
    if cand.size == 0:
        return []
    dfs = reader.dfs(terms)
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms:  # ascending-term accumulation order (pinned)
        if arrs[t] is None or dfs[t] == 0:
            continue
        docids, w = arrs[t]
        p = np.searchsorted(docids, cand)
        ok = p < docids.size
        ok[ok] &= docids[p[ok]] == cand[ok]
        scores[ok] += reader.idf(t) * w[p[ok]]
    return _topk_exact(scores, cand, k)


class TermsSetSearcherActor:
    """Actor-pool stage for terms_set queries: (query_id, terms) ->
    (query_id, rank, doc_id, score).  Index opened once per actor."""

    def __init__(self, index_dir: str, k: int, packs_ref=None,
                 req_mod: int = 3):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)
        self.req_mod = req_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts}
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, ts in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            top = score_terms_set(
                self.reader, self.seg_ids, list(ts), self.k,
                req_mod=self.req_mod,
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


def terms_set_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
    req_mod: int = 3,
) -> "ray.data.Dataset":
    """terms_set query pipeline (see :func:`score_terms_set`)."""
    return queries.map_batches(
        TermsSetSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
            "req_mod": req_mod,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


# ---------------------------------------------------------- common terms

def score_common_terms(
    reader: IndexReader,
    seg_ids: list[int],
    terms: list[str],
    k: int,
    cutoff: tuple[int, int] = (79, 100),
) -> list[tuple[float, int]]:
    """Lucene/Elasticsearch ``common`` (CommonTermsQuery) semantics: the
    query terms split at a document-frequency cutoff — candidate docs
    must match at least one LOW-frequency term (the selective part of
    the query drives recall), and HIGH-frequency terms never admit docs
    by themselves but still ADD their BM25 contribution to candidates
    (cutoff_frequency, low_freq_operator=or).  When every term is
    high-frequency the query degrades to a plain boolean OR (the ES
    fallback).  The split is exact integer arithmetic — low iff
    ``df * den <= n_docs * num`` — so the SQL oracle reproduces it from
    the same corpus without float ties."""
    terms = sorted(set(terms))
    num, den = cutoff
    dfs = reader.dfs(terms)
    low = [t for t in terms if dfs[t] * den <= reader.n_docs * num]
    gate = low if low else terms
    arrs = {t: reader.term_arrays(seg_ids, t) for t in terms}
    parts = [arrs[t][0] for t in gate if arrs[t] is not None]
    if not parts:
        return []
    cand = parts[0]
    for p in parts[1:]:
        cand = np.union1d(cand, p)
    if reader.deleted.size and cand.size:
        from .deletes import live_mask

        cand = cand[live_mask(cand, reader.deleted)]
    if cand.size == 0:
        return []
    scores = np.zeros(cand.size, dtype=np.float64)
    for t in terms:  # ascending-term accumulation order (pinned)
        if arrs[t] is None or dfs[t] == 0:
            continue
        docids, w = arrs[t]
        p = np.searchsorted(docids, cand)
        ok = p < docids.size
        ok[ok] &= docids[p[ok]] == cand[ok]
        scores[ok] += reader.idf(t) * w[p[ok]]
    return _topk_exact(scores, cand, k)


class CommonTermsSearcherActor:
    """Actor-pool stage for common-terms queries: (query_id, terms) ->
    (query_id, rank, doc_id, score).  Index opened once per actor."""

    def __init__(self, index_dir: str, k: int, packs_ref=None,
                 cutoff: tuple[int, int] = (79, 100)):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)
        self.cutoff = tuple(cutoff)

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted(
            {t for ts in batch["terms"].to_pylist() for t in ts}
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, ts in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            top = score_common_terms(
                self.reader, self.seg_ids, list(ts), self.k,
                cutoff=self.cutoff,
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


def common_terms_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
    cutoff: tuple[int, int] = (79, 100),
) -> "ray.data.Dataset":
    """common-terms query pipeline (see :func:`score_common_terms`)."""
    return queries.map_batches(
        CommonTermsSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
            "cutoff": cutoff,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
