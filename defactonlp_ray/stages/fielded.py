"""BM25F fielded retrieval (fulltext_index tier; SURVEY.md §2.6
extension — the reference stack is single-field, SURVEY.md §0; semantics
follow the simplified BM25F of Robertson/Zaragoza, "The Probabilistic
Relevance Framework" §3.3.2: per-field term frequencies and lengths
combine linearly with field weights into ONE pseudo-document

    tf_c(t, d)  = Σ_f w_f · tf_f(t, d)
    dl_c(d)     = Σ_f w_f · len_f(d)
    avgdl_c     = Σ_d dl_c(d) / N
    score(q, d) = Σ_t idf(t) · tf_c·(k1+1) / (tf_c + k1·(1−b+b·dl_c/avgdl_c))

with idf(t) = ln(1 + (N − df + ½)/(df + ½)) and df = docs containing t
in ANY field).  Field weights MUST be exact binary floats (2.0, 1.0,
0.5, …) so the weighted integer sums stay exact in float64 and the
engine matches the SQL oracle bit-for-bit before the round-6 edge.

Ray-Data shape: one physical index PER FIELD under
``<index_dir>/field=<name>/`` (each a normal segment index — resume,
append, compact, codecs all inherited), built from the same doc_id
space.  Serving is an actor pool whose reader aligns per-field posting
lists with one ``searchsorted`` per (term, field) and scores the union —
no shuffle, no per-row Python.  Per-field doc lengths come from the
fields' ``docstats`` tables (every doc of the build is present, even
with zero tokens in a field).

Doc deletes (stages/deletes.py) are read from the FIELDED ROOT dir:
``delete_docs(root, ids)`` masks every field at once.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.tokenizer import tokenize_column
from ..sources import manifest as mf
from .index_build import build_index
from .search import IndexReader, _topk_exact

K1 = 1.2
B = 0.75

DEFAULT_WEIGHTS = {"title": 2.0, "body": 1.0}

__all__ = [
    "split_fields",
    "build_fielded_index",
    "FieldedReader",
    "score_bm25f",
    "fielded_search",
    "score_dismax",
    "dismax_search",
    "score_cross_fields",
    "cross_fields_search",
]


def split_fields(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    title_len: int = 6,
) -> "ray.data.Dataset":
    """Derive (title, body) text columns: title = first ``title_len``
    tokens, body = the rest (pinned tokenizer language; equals DuckDB
    ``list_slice`` over ``string_split`` on the canonical corpus).
    Fully Arrow-vectorized (list_slice + binary_join)."""

    def split(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch[text_col])
        title = pc.binary_join(pc.list_slice(toks, 0, title_len), " ")
        body = pc.binary_join(pc.list_slice(toks, title_len, None), " ")
        return batch.append_column("title", title).append_column("body", body)

    return ds.map_batches(split, batch_format="pyarrow")


def _field_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, f"field={field}")


def build_fielded_index(
    ds: "ray.data.Dataset",
    index_dir: str,
    *,
    fields: tuple[str, ...] = ("title", "body"),
    doc_id_col: str = "doc_id",
    seg_docs: int = 8192,
    codec: str = "varint",
    resume: bool = True,
) -> str:
    """One segment index per field (same doc_id space).  ``ds`` must
    carry one text column per field (see :func:`split_fields`)."""
    ds = ds.select_columns([doc_id_col, *fields]).materialize()
    for f in fields:
        build_index(
            ds,
            _field_dir(index_dir, f),
            doc_id_col=doc_id_col,
            text_col=f,
            seg_docs=seg_docs,
            codec=codec,
            resume=resume,
        )
    return index_dir


class FieldedReader:
    """Per-actor state: one IndexReader per field + per-field doc-length
    arrays (docstats concatenated in doc order) + combined collection
    stats.  Deletes load from the fielded root."""

    def __init__(self, index_dir: str, weights: dict[str, float] | None = None):
        from .deletes import read_deletes

        self.weights = dict(weights or DEFAULT_WEIGHTS)
        self.fields = sorted(self.weights)
        self.readers = {
            f: IndexReader(_field_dir(index_dir, f)) for f in self.fields
        }
        self.deleted = read_deletes(index_dir)
        self._tp: dict[tuple[str, str], tuple | None] = {}
        self._dl: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        import pyarrow.parquet as pq

        for f in self.fields:
            fdir = _field_dir(index_dir, f)
            recs = mf.read_manifest(fdir)
            parts = [
                pq.read_table(
                    os.path.join(mf.segment_dir(fdir, sid), "docstats.parquet"),
                    columns=["doc_id", "doc_len"],
                )
                for sid in mf.live_segment_order(recs)
            ]
            tbl = pa.concat_tables(parts)
            ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            lens = tbl["doc_len"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(ids, kind="stable")
            self._dl[f] = (ids[order], lens[order])
        n_docs = {self._dl[f][0].size for f in self.fields}
        if len(n_docs) != 1:
            raise ValueError(
                f"fielded index {index_dir}: fields cover different doc "
                f"counts {sorted(n_docs)} — rebuild from one dataset"
            )
        self.n_docs = n_docs.pop()
        # exact integer sums scaled by exact-binary weights -> float64
        # total identical to the SQL oracle's sum(w_t*tl + w_b*bl)
        self.total_c = float(
            sum(self.weights[f] * int(self._dl[f][1].sum()) for f in self.fields)
        )
        self.avgdl_c = self.total_c / self.n_docs

    def field_len(self, field: str, docids: np.ndarray) -> np.ndarray:
        ids, lens = self._dl[field]
        pos = np.searchsorted(ids, docids)
        pos = np.minimum(pos, ids.size - 1)
        out = lens[pos].astype(np.float64)
        out[ids[pos] != docids] = 0.0  # doc absent from this field
        return out

    def load_terms(self, terms: list[str]) -> None:
        """Batch-preload: ONE filtered point-read per (field, segment)
        for the whole term set — the same batching the single-field
        searcher actors do (one read per term otherwise)."""
        missing = [
            t for t in terms
            if any((f, t) not in self._tp for f in self.fields)
        ]
        if not missing:
            return
        for f in self.fields:
            r = self.readers[f]
            for sid in r.seg_ids:
                r.load_postings(sid, missing)

    def term_postings(self, field: str, term: str):
        """(docids, tfs) concatenated across the field's segments in doc
        order, or None when absent — cached per (field, term)."""
        key = (field, term)
        if key in self._tp:
            return self._tp[key]
        r = self.readers[field]
        parts_d, parts_t = [], []
        for sid in r.seg_ids:
            row = r.postings(sid, term)
            if row is not None:
                parts_d.append(row["decoded"][0])
                parts_t.append(row["decoded"][1])
        out = (
            (np.concatenate(parts_d), np.concatenate(parts_t))
            if parts_d
            else None
        )
        self._tp[key] = out
        return out


def score_bm25f(
    freader: FieldedReader, terms: list[str], k: int
) -> list[tuple[float, int]]:
    """BM25F top-k over the union of per-field postings (ascending-term
    accumulation order, the engine-wide pinned policy)."""
    from .deletes import live_mask

    uniq = sorted(set(terms))
    per_term = []
    lo = hi = None
    for t in uniq:
        polys = [
            (f, freader.weights[f], freader.term_postings(f, t))
            for f in freader.fields
        ]
        polys = [(f, w, p) for f, w, p in polys if p is not None]
        if not polys:
            continue
        if len(polys) == 1:
            u = polys[0][2][0]
        else:
            u = np.union1d(*[p[0] for _f, _w, p in polys[:2]])
            for _f, _w, p in polys[2:]:
                u = np.union1d(u, p[0])
        tfc = np.zeros(u.size, dtype=np.float64)
        for _f, w, (d, tf) in polys:
            pos = np.searchsorted(u, d)
            tfc[pos] += w * tf.astype(np.float64)
        df = int(u.size)
        idf = math.log(1.0 + (freader.n_docs - df + 0.5) / (df + 0.5))
        dlc = np.zeros(u.size, dtype=np.float64)
        for f in freader.fields:
            dlc += freader.weights[f] * freader.field_len(f, u)
        # quotient FIRST, then idf: the pinned association order of the
        # single-field path (w cached per posting, idf applied after) —
        # the other order drifts an ulp and breaks the w=1 identity
        wq = (tfc * (K1 + 1.0)) / (
            tfc + K1 * (1.0 - B + B * dlc / freader.avgdl_c)
        )
        contrib = idf * wq
        per_term.append((t, u, contrib))
        tlo, thi = int(u[0]), int(u[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for _t, u, contrib in per_term:  # ascending-term order (pinned)
        idx = u - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if freader.deleted.size:
        cand = cand[live_mask(cand + lo, freader.deleted)]
    return _topk_exact(scores[cand], cand + lo, k)


def score_dismax(
    freader: FieldedReader, terms: list[str], k: int, tie: float = 0.5
) -> list[tuple[float, int]]:
    """Disjunction-max over fields (Lucene DisjunctionMaxQuery /
    Elasticsearch multi_match best_fields): each field scores the whole
    query as an independent BM25 index (its OWN df and avgdl — unlike
    BM25F's pseudo-document), then per doc

        score = max_f s_f + tie * (Σ_f s_f − max_f)

    ``tie`` must be an exact binary float (0.5, 0.25, …) for the pinned
    cross-engine float policy.  Field weights are ignored — dis_max
    rewards the single best field by construction.  Accumulation order:
    fields in sorted order, ascending terms within a field (pinned)."""
    from .deletes import live_mask

    uniq = sorted(set(terms))
    # candidate union across every (field, term) posting list
    all_parts = []
    per_field: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {}
    for f in freader.fields:
        lst = []
        for t in uniq:
            p = freader.term_postings(f, t)
            lst.append(p)
            if p is not None:
                all_parts.append(p[0])
        per_field[f] = lst
    if not all_parts:
        return []
    cand = np.unique(np.concatenate(all_parts))
    n = freader.n_docs
    total = np.zeros(cand.size, dtype=np.float64)
    best = np.full(cand.size, -np.inf, dtype=np.float64)
    for f in freader.fields:
        ids_f, lens_f = freader._dl[f]
        avgdl_f = float(int(lens_f.sum())) / n
        sf = np.zeros(cand.size, dtype=np.float64)
        hit = np.zeros(cand.size, dtype=bool)
        for t, p in zip(uniq, per_field[f]):
            if p is None:
                continue
            docids, tfs = p
            df = int(docids.size)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            dls = freader.field_len(f, docids)
            tfs_f = tfs.astype(np.float64)
            w = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls / avgdl_f)
            )
            pos = np.searchsorted(cand, docids)
            sf[pos] += idf * w
            hit[pos] = True
        # a field that never matched a doc contributes NO subquery score
        # (Lucene: dis_max maxes over MATCHING subqueries only)
        total += np.where(hit, sf, 0.0)
        best = np.maximum(best, np.where(hit, sf, -np.inf))
    matched = best > -np.inf
    cand, best, total = cand[matched], best[matched], total[matched]
    scores = best + tie * (total - best)
    if freader.deleted.size and cand.size:
        m = live_mask(cand, freader.deleted)
        cand, scores = cand[m], scores[m]
    if cand.size == 0:
        return []
    return _topk_exact(scores, cand, k)


def score_cross_fields(
    freader: FieldedReader, terms: list[str], k: int, tie: float = 0.0
) -> list[tuple[float, int]]:
    """multi_match ``cross_fields`` (Elasticsearch term-centric blending /
    Lucene BlendedTermQuery inside a per-term DisjunctionMaxQuery): each
    TERM is scored per field with that field's tf/length/avgdl but a
    BLENDED document frequency — df(t) = max over fields of the field df
    (the ES blending rule, which stops a term rare in one field from
    dominating just because that field is sparse) — and the term's
    contribution per doc is

        max_f s_f(t, d) + tie * (Σ_f s_f(t, d) − max_f)

    over the fields where the term MATCHES the doc (ES default
    ``tie_breaker=0`` -> pure max); the doc score sums the per-term
    combinations.  Contrast with best_fields/:func:`score_dismax`, which
    maxes whole-QUERY field scores: cross_fields treats the field set as
    one virtual field per term, so multi-term queries whose terms hit
    DIFFERENT fields still accumulate every term.  ``tie`` must be an
    exact binary float (0.0, 0.5, …) per the pinned cross-engine float
    policy.  Accumulation order: ascending terms, fields in sorted order
    within a term (pinned engine-wide).  Field weights are ignored, as in
    ES (cross_fields boosts are per-field query-time multipliers ES
    applies to tf, not implemented here)."""
    from .deletes import live_mask

    uniq = sorted(set(terms))
    n = freader.n_docs
    avgdl = {
        f: float(int(freader._dl[f][1].sum())) / n for f in freader.fields
    }
    per_term = []
    lo = hi = None
    for t in uniq:
        polys = [
            (f, freader.term_postings(f, t)) for f in freader.fields
        ]
        polys = [(f, p) for f, p in polys if p is not None]
        if not polys:
            continue
        df = max(int(p[0].size) for _f, p in polys)  # blended df
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        if len(polys) == 1:
            u = polys[0][1][0]
        else:
            u = np.union1d(*[p[0] for _f, p in polys[:2]])
            for _f, p in polys[2:]:
                u = np.union1d(u, p[0])
        best = np.full(u.size, -np.inf, dtype=np.float64)
        total = np.zeros(u.size, dtype=np.float64)
        for f, (d, tf) in polys:  # sorted-field order (pinned)
            dls = freader.field_len(f, d)
            tfs_f = tf.astype(np.float64)
            # quotient FIRST, then idf (the pinned association order)
            w = (tfs_f * (K1 + 1.0)) / (
                tfs_f + K1 * (1.0 - B + B * dls / avgdl[f])
            )
            s = idf * w
            pos = np.searchsorted(u, d)
            np.maximum.at(best, pos, s)
            total[pos] += s
        contrib = best if tie == 0.0 else best + tie * (total - best)
        per_term.append((u, contrib))
        tlo, thi = int(u[0]), int(u[-1])
        lo = tlo if lo is None else min(lo, tlo)
        hi = thi if hi is None else max(hi, thi)
    if not per_term:
        return []
    width = hi - lo + 1
    scores = np.zeros(width, dtype=np.float64)
    touched = np.zeros(width, dtype=bool)
    for u, contrib in per_term:  # ascending-term order (pinned)
        idx = u - lo
        scores[idx] += contrib
        touched[idx] = True
    cand = np.flatnonzero(touched)
    if freader.deleted.size:
        cand = cand[live_mask(cand + lo, freader.deleted)]
    if cand.size == 0:
        return []
    return _topk_exact(scores[cand], cand + lo, k)


class CrossFieldsSearcherActor:
    """Actor-pool stage: batch of (query_id, terms) -> (query_id, rank,
    doc_id, score) under cross_fields term-centric blending."""

    def __init__(self, index_dir: str, k: int = 10, tie: float = 0.0,
                 weights: dict[str, float] | None = None):
        self.freader = FieldedReader(index_dir, weights)
        self.k = k
        self.tie = tie

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
        self.freader.load_terms(all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            for rank, (score, doc_id) in enumerate(
                score_cross_fields(
                    self.freader, list(terms), self.k, self.tie
                ),
                1,
            ):
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


def cross_fields_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    tie: float = 0.0,
    weights: dict[str, float] | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """cross_fields query pipeline: (query_id, terms) -> (query_id, rank,
    doc_id, score); see :func:`score_cross_fields`."""
    from .util import pool_size

    return queries.map_batches(
        CrossFieldsSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "tie": tie, "weights": weights,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class DisMaxSearcherActor:
    """Actor-pool stage: batch of (query_id, terms) -> (query_id, rank,
    doc_id, score) under dis_max over fields."""

    def __init__(self, index_dir: str, k: int = 10, tie: float = 0.5,
                 weights: dict[str, float] | None = None):
        self.freader = FieldedReader(index_dir, weights)
        self.k = k
        self.tie = tie

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
        self.freader.load_terms(all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            for rank, (score, doc_id) in enumerate(
                score_dismax(self.freader, list(terms), self.k, self.tie), 1
            ):
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


def dismax_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    tie: float = 0.5,
    weights: dict[str, float] | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """dis_max query pipeline: (query_id, terms) -> (query_id, rank,
    doc_id, score); see :func:`score_dismax`."""
    from .util import pool_size

    return queries.map_batches(
        DisMaxSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "tie": tie, "weights": weights,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


class BM25FSearcherActor:
    """Actor-pool stage: batch of (query_id, terms) -> (query_id, rank,
    doc_id, score) under BM25F.  Reader state (per-field readers, doc
    lengths, stats) loads once per actor."""

    def __init__(self, index_dir: str, k: int = 10,
                 weights: dict[str, float] | None = None):
        self.freader = FieldedReader(index_dir, weights)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        all_terms = sorted({t for ts in batch["terms"].to_pylist() for t in ts})
        self.freader.load_terms(all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, terms in zip(
            batch["query_id"].to_pylist(), batch["terms"].to_pylist()
        ):
            for rank, (score, doc_id) in enumerate(
                score_bm25f(self.freader, list(terms), self.k), 1
            ):
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


def fielded_search(
    index_dir: str,
    queries: "ray.data.Dataset",
    *,
    k: int = 10,
    weights: dict[str, float] | None = None,
    concurrency: int = 4,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """BM25F query pipeline: (query_id, terms) -> (query_id, rank,
    doc_id, score)."""
    from .util import pool_size

    return queries.map_batches(
        BM25FSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "weights": weights,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
