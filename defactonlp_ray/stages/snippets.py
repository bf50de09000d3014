"""Snippet / highlight extraction (serving-side post-ranking stage).

The reference stack returns whole documents/sentences (DrQA top docs,
fever-baselines sentence selection — unverified, SURVEY.md §0); search
serving additionally needs query-biased snippets (Lucene highlighter
semantics): for each (query, doc) result pair, the ``width``-token
window covering the MOST DISTINCT query terms, earliest window on ties.

Execution shape (the 10^12-doc trait): the result pairs are tiny
(queries × k) and the corpus is huge, so pairs broadcast via ``ray.put``
and the corpus STREAMS through one ``map_batches`` pass — each batch
filters to docs any query hit, tokenizes with the pinned vectorized
tokenizer, and emits one snippet row per pair.  No shuffle, no driver
materialization of anything corpus-sized.

Window rule (pinned, SQL-expressible for the oracle): candidate starts
are the positions of the query's terms in the doc; a window is
``[s, s + width - 1]`` in token positions; score = count of DISTINCT
query terms inside; pick max score, then smallest ``s``.  The snippet
string is the space-joined token slice — on the canonical test corpus
(lowercase single-space words) byte-equal to DuckDB's
``array_to_string(list_slice(...), ' ')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.tokenizer import tokenize_column
from .util import pool_size


def best_window(
    toks: list[str], terms: list[str], width: int
) -> tuple[int, int]:
    """(start, n_distinct_terms) of the best window; (-1, 0) if no term
    occurs.  Candidate starts are term occurrences; max distinct terms,
    smallest start on ties."""
    tset = sorted(set(terms))
    pos_of = {t: [] for t in tset}
    for i, tok in enumerate(toks):
        if tok in pos_of:
            pos_of[tok].append(i)
    starts = sorted(p for ps in pos_of.values() for p in ps)
    if not starts:
        return -1, 0
    # vectorized window scoring: for each term, membership of the window
    # [s, s+width) is ONE pair of searchsorteds over ALL candidate
    # starts (no per-start Python loop — head terms yield thousands of
    # starts per doc)
    sarr = np.asarray(starts, dtype=np.int64)
    n_arr = np.zeros(sarr.size, dtype=np.int64)
    for ps in (np.asarray(ps, dtype=np.int64)
               for ps in pos_of.values() if ps):
        n_arr += np.searchsorted(ps, sarr + width, side="left") > (
            np.searchsorted(ps, sarr, side="left")
        )
    best = int(np.argmax(n_arr))  # first max = earliest start (sorted)
    return int(sarr[best]), int(n_arr[best])


class SnippetStage:
    """map_batches stage over the corpus: emits (query_id, doc_id,
    start, n_terms, snippet) for every broadcast (query, doc) pair whose
    doc is in the batch.  ``pairs_ref``: ray.put of a dict
    ``doc_id -> [(query_id, terms), ...]``."""

    def __init__(self, pairs_ref, width: int = 8,
                 doc_id_col: str = "doc_id", text_col: str = "text"):
        self.pairs = (
            ray.get(pairs_ref)
            if isinstance(pairs_ref, ray.ObjectRef)
            else pairs_ref
        )
        self.width = width
        self.doc_id_col = doc_id_col
        self.text_col = text_col
        # the probe set is batch-invariant: build the Arrow value_set
        # once per actor, not once per corpus batch
        self._doc_set = pa.array(list(self.pairs), pa.int64())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch[self.doc_id_col], value_set=self._doc_set)
        out_q, out_d, out_s, out_n, out_t = [], [], [], [], []
        if pc.any(mask).as_py():
            sub = batch.filter(mask)
            toks_col = tokenize_column(sub[self.text_col])
            for d, toks in zip(
                sub[self.doc_id_col].to_pylist(), toks_col.to_pylist()
            ):
                for qid, terms in self.pairs[d]:
                    s, n = best_window(toks, list(terms), self.width)
                    out_q.append(qid)
                    out_d.append(d)
                    out_s.append(s)
                    out_n.append(n)
                    out_t.append(
                        " ".join(toks[s : s + self.width]) if s >= 0 else ""
                    )
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "start": pa.array(out_s, pa.int64()),
                "n_terms": pa.array(out_n, pa.int64()),
                "snippet": pa.array(out_t, pa.string()),
            }
        )


def extract_snippets(
    docs: "ray.data.Dataset",
    results: "pa.Table | list[tuple[int, int]]",
    query_terms: dict[int, list[str]],
    *,
    width: int = 8,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Snippets for ranked results: ``results`` is (query_id, doc_id)
    pairs (an Arrow table with those columns, or a list of tuples);
    ``query_terms`` maps query_id -> terms.  The pairs dict broadcasts
    once; ``docs`` streams."""
    if isinstance(results, pa.Table):
        pairs_iter = zip(
            results["query_id"].to_pylist(), results["doc_id"].to_pylist()
        )
    else:
        pairs_iter = iter(results)
    by_doc: dict[int, list[tuple[int, list[str]]]] = {}
    for qid, did in pairs_iter:
        by_doc.setdefault(int(did), []).append((int(qid), query_terms[int(qid)]))
    pairs_ref = ray.put(by_doc) if ray.is_initialized() else by_doc
    return docs.map_batches(
        SnippetStage,
        fn_constructor_kwargs={
            "pairs_ref": pairs_ref,
            "width": width,
            "doc_id_col": doc_id_col,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
