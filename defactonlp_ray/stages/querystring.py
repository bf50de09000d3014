"""simple_query_string: a user-facing query-language front end compiled
onto the existing boolean + phrase primitives (fulltext_index tier; the
model is Elasticsearch's ``simple_query_string`` — the forgiving query
parser exposed straight to end users).

Grammar (the ES subset that maps onto this engine's operators):

* ``term``        -> SHOULD clause (default OR semantics)
* ``+term``       -> MUST clause
* ``-term``       -> MUST_NOT clause
* ``"w1 w2 ..."`` -> quoted phrase, MUST (consecutive positions over the
  positional index); ``+"..."`` is the same, ``-"..."`` is rejected
* no parentheses / fuzziness suffixes — documented subset

Matching: candidates contain ALL must terms, match ALL phrases, none of
the must_not terms; with no must/phrase clause at least one should term
(the classic boolean default the boolean_search operator pins).

Scoring: the pinned BM25 sum over the distinct must+should terms present
in the candidate (identical per-(doc, term) contributions to the plain
scorer) PLUS each phrase scored as a pseudo-term (tf = the doc's phrase
count, df = global matching-doc count) — the same composition Lucene
produces for a bool(term..., PhraseQuery...) tree.

Execution shape: one actor-pool ``map_batches`` stage; parsing is a pure
driver-side function (shared with the SQL-oracle generator so both
engines execute the identical parsed structure)."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .phrase import _get_and_seed, _member, match_phrase
from .search import B, K1, IndexReader, _topk_exact
from .util import pool_size

__all__ = ["parse_query_string", "score_query_string", "query_string_search"]

_TOKEN_RE = re.compile(r'([+-]?)"([^"]*)"|([+-]?)(\S+)')


def parse_query_string(q: str) -> dict:
    """Parse the simple_query_string subset -> ``{"must", "should",
    "must_not", "phrases"}`` (terms deduped downstream; phrases keep
    their word order).  Pure and deterministic — the SQL oracle calls
    the same function, so parse disagreements are impossible."""
    must: list[str] = []
    should: list[str] = []
    must_not: list[str] = []
    phrases: list[list[str]] = []
    for m in _TOKEN_RE.finditer(q):
        sign_p, phrase, sign_t, term = m.groups()
        if phrase is not None:
            if sign_p == "-":
                raise ValueError(
                    "negated phrases are outside the supported "
                    "simple_query_string subset"
                )
            words = [w for w in phrase.split(" ") if w]
            if words:
                phrases.append(words)
        elif term:
            if sign_t == "+":
                must.append(term)
            elif sign_t == "-":
                must_not.append(term)
            else:
                should.append(term)
    return {
        "must": must, "should": should,
        "must_not": must_not, "phrases": phrases,
    }


def score_query_string(
    reader: IndexReader,
    seg_ids: list[int],
    parsed: dict,
    k: int,
) -> list[tuple[float, int]]:
    """Execute one parsed query: boolean candidate filtering (must /
    phrases / must_not / should-any) + BM25-plus-phrase-pseudo-term
    scoring, bounded top-k by (-score, doc_id)."""
    must = sorted(set(parsed["must"]))
    should = sorted(set(parsed["should"]))
    must_not = sorted(set(parsed["must_not"]))
    phrases = [list(p) for p in dict.fromkeys(tuple(p) for p in parsed["phrases"])]

    ph = []
    for words in phrases:
        docs, counts, dls = match_phrase(reader, seg_ids, words)
        if reader.deleted.size and docs.size:
            from .deletes import live_mask

            m = live_mask(docs, reader.deleted)
            docs, counts, dls = docs[m], counts[m], dls[m]
        if docs.size == 0:
            return []  # every phrase is a MUST clause
        ph.append((docs, counts, dls))

    arrs = {
        t: reader.term_arrays(seg_ids, t)
        for t in set(must) | set(should) | set(must_not)
    }
    cand = None
    if must:
        if any(arrs[t] is None for t in must):
            return []
        order = sorted(must, key=lambda t: arrs[t][0].size)
        cand = arrs[order[0]][0]
        for t in order[1:]:
            cand = cand[_member(arrs[t][0], cand)]
            if cand.size == 0:
                return []
    for docs, _c, _d in sorted(ph, key=lambda x: x[0].size):
        cand = docs if cand is None else cand[_member(docs, cand)]
        if cand.size == 0:
            return []
    if cand is None:
        parts = [arrs[t][0] for t in should if arrs[t] is not None]
        if not parts:
            return []
        cand = parts[0]
        for p in parts[1:]:
            cand = np.union1d(cand, p)
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
    for docs, counts, dls in ph:
        df = int(docs.size)
        idf = math.log(1.0 + (reader.n_docs - df + 0.5) / (df + 0.5))
        pos = np.searchsorted(docs, cand)  # cand ⊆ docs by construction
        c = counts[pos].astype(np.float64)
        dl = dls[pos].astype(np.float64)
        scores += idf * (c * (K1 + 1.0)) / (
            c + K1 * (1.0 - B + B * dl / reader.avgdl)
        )
        touched[:] = True
    live = np.flatnonzero(touched)
    if live.size == 0:
        return []
    return _topk_exact(scores[live], cand[live], k)


class QueryStringSearcherActor:
    """Actor-pool stage: batch of (query_id, q[string]) -> (query_id,
    rank, doc_id, score).  Parsing happens per query in the actor (pure
    function); postings and positional packs load once per actor."""

    def __init__(self, index_dir: str, k: int = 10, packs_ref=None):
        self.reader = IndexReader(index_dir)
        self.k = k
        self.seg_ids = self.reader.seg_ids
        self.seeded = _get_and_seed(self.reader, packs_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = [parse_query_string(q) for q in batch["q"].to_pylist()]
        all_terms = sorted(
            {
                t
                for p in parsed
                for t in (
                    set(p["must"]) | set(p["should"]) | set(p["must_not"])
                    | {w for ph in p["phrases"] for w in ph}
                )
            }
            - self.seeded
        )
        for sid in self.seg_ids:
            self.reader.load_postings(sid, all_terms)
        out_q, out_r, out_d, out_s = [], [], [], []
        for qid, p in zip(batch["query_id"].to_pylist(), parsed):
            for rank, (score, doc_id) in enumerate(
                score_query_string(self.reader, self.seg_ids, p, self.k), 1
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


def query_string_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 256,
    packs_ref=None,
) -> "ray.data.Dataset":
    """simple_query_string pipeline: (query_id, query string) ->
    (query_id, rank, doc_id, score) over a ``positions=True`` index
    (phrases need positions; term-only queries work on any index)."""
    qds = ray.data.from_arrow(
        pa.table({
            "query_id": pa.array([q for q, _ in queries], pa.int64()),
            "q": pa.array([s for _, s in queries], pa.string()),
        })
    )
    return qds.map_batches(
        QueryStringSearcherActor,
        fn_constructor_kwargs={
            "index_dir": index_dir, "k": k, "packs_ref": packs_ref,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
