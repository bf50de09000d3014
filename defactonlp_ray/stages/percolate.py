"""Percolator — reverse search (fulltext_index tier; SURVEY.md §2.6
extension; the reference stack has no stored-query matching, SURVEY.md
§0; semantics follow Elasticsearch's percolate query restricted to
boolean term queries: a REGISTERED query set is matched against a
STREAM of documents, emitting ``(query_id, doc_id)`` for every document
that satisfies a query).

Query model: ``must`` terms (ALL must occur in the document) and
``must_not`` terms (NONE may occur) — the same AND/NOT algebra as
``stages/phrase.score_boolean``, applied in the reverse direction.

Scale shape: the query set is the SMALL side (stored alerts /
subscriptions — thousands, not billions) and ships once in the task
closure as two flat Arrow tables; the corpus STREAMS through one
``map_batches`` pass and never shuffles.  Per batch everything is
vectorized: the pinned tokenizer's distinct ``(doc, term)`` kernel, an
``is_in`` pre-filter down to the query vocabulary, then two hash joins
(must-hit counting against the per-query required count; must_not
anti-join).  Output is O(matches), so a 100-TB corpus percolates in one
embarrassingly-parallel pass with per-batch output proportional to the
alert hit rate.  At millions of stored queries the documented upgrade
is the Elasticsearch one: index the queries' rarest term into an
inverted map and probe only queries whose rarest term occurs in the
doc — the per-batch joins below already express that probe once the
term->query map is the small table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["percolate"]


class _PercolateMatcher:
    """``map_batches`` task: batch of (doc_id, text) -> (query_id,
    doc_id) matches against the closure-shipped query set."""

    def __init__(self, queries: list[tuple[int, list[str], list[str]]]):
        must_q, must_t, not_q, not_t = [], [], [], []
        for qid, must, must_not in queries:
            if not must:
                raise ValueError(f"query {qid}: at least one must term required")
            for t in sorted(set(must)):
                must_q.append(qid)
                must_t.append(t)
            for t in sorted(set(must_not)):
                not_q.append(qid)
                not_t.append(t)
        self.must = pd.DataFrame({"query_id": np.asarray(must_q, np.int64),
                                  "term": must_t})
        self.need = self.must.groupby("query_id").size()
        self.must_not = pd.DataFrame({"query_id": np.asarray(not_q, np.int64),
                                      "term": not_t})
        # is_in pre-filter vocabulary: every term any query mentions
        self.vocab = pa.array(sorted(set(must_t) | set(not_t)), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        from ..functions.tokenizer import term_count_table

        tf, _dl = term_count_table(batch["text"], batch["doc_id"])
        tf = tf.filter(pc.is_in(tf["term"], value_set=self.vocab))
        if tf.num_rows == 0:
            return empty
        pairs = tf.select(["doc_id", "term"]).to_pandas()
        hits = pairs.merge(self.must, on="term")
        if len(hits) == 0:
            return empty
        cnt = hits.groupby(["query_id", "doc_id"], as_index=False).size()
        cnt = cnt[cnt["size"].to_numpy() ==
                  self.need.reindex(cnt["query_id"]).to_numpy()]
        m = cnt[["query_id", "doc_id"]]
        if len(self.must_not) and len(m):
            excl = pairs.merge(self.must_not, on="term")[
                ["query_id", "doc_id"]].drop_duplicates()
            m = m.merge(excl, on=["query_id", "doc_id"], how="left",
                        indicator=True)
            m = m[m["_merge"] == "left_only"][["query_id", "doc_id"]]
        return pa.table({
            "query_id": pa.array(m["query_id"].to_numpy(np.int64)),
            "doc_id": pa.array(m["doc_id"].to_numpy(np.int64)),
        })


def percolate(
    docs: "ray.data.Dataset",
    queries: list[tuple[int, list[str], list[str]]],
) -> "ray.data.Dataset":
    """Match a stream of ``(doc_id, text)`` documents against a stored
    query set of ``(query_id, must_terms, must_not_terms)``; returns the
    ``(query_id, doc_id)`` pairs where the doc contains ALL must terms
    and NO must_not term.  One streaming corpus pass, queries in the
    task closure — see the module docstring for the scale contract."""
    return docs.map_batches(
        _PercolateMatcher(queries), batch_format="pyarrow"
    )
