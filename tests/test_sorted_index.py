"""Index sorting + early-terminated top-k (stages/sorted_index.py).

Reference model: pure-Python conjunction over the tokenized corpus,
ordered by (n_chars DESC, doc_id ASC).  The early-termination claim is
asserted directly: a broad query must stop after the first segment(s),
never opening the rest.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages.search import IndexReader
from defactonlp_ray.stages.sorted_index import (
    build_sorted_index,
    sorted_conjunction_topk,
    sorted_search,
)

SEG_DOCS = 64


@pytest.fixture(scope="module")
def docs_tbl(sf_dir):
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars"],
    )


@pytest.fixture(scope="module")
def sidx(sf_dir, docs_tbl, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sortedidx"))
    build_sorted_index(
        ray.data.from_arrow(docs_tbl), idx, sort_col="n_chars",
        seg_docs=SEG_DOCS, resume=False,
    )
    return idx


def _py_topk(docs_tbl, terms, k):
    rows = []
    for d, t, nc in zip(
        docs_tbl["doc_id"].to_pylist(),
        docs_tbl["text"].to_pylist(),
        docs_tbl["n_chars"].to_pylist(),
    ):
        toks = set(tokenize(t))
        if all(w in toks for w in terms):
            rows.append((int(nc), int(d)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return rows[:k]


@pytest.mark.parametrize(
    "terms", [["the", "data"], ["hash", "join", "table"], ["table"], ["zz"]]
)
def test_sorted_topk_equals_python(sidx, docs_tbl, terms):
    reader = IndexReader(sidx)
    ids, _opened = sorted_conjunction_topk(reader, terms, k=10)
    from defactonlp_ray.stages.sorted_index import _sortmap_lookup

    m = _sortmap_lookup(sidx, ids)
    got = [(m[i][1], m[i][0]) for i in ids.tolist()]
    assert got == _py_topk(docs_tbl, terms, 10), terms


def test_broad_query_opens_one_segment(sidx, docs_tbl):
    """A term matching (nearly) every doc fills k inside segment 0 —
    the remaining segments are never opened."""
    reader = IndexReader(sidx)
    assert len(reader.seg_ids) > 2
    ids, opened = sorted_conjunction_topk(reader, ["the"], k=10)
    assert ids.size == 10
    assert opened == 1


def test_absent_term_opens_all_segments_but_matches_nothing(sidx):
    reader = IndexReader(sidx)
    ids, opened = sorted_conjunction_topk(reader, ["zzqq"], k=10)
    assert ids.size == 0
    assert opened == len(reader.seg_ids)


def test_hits_are_global_sort_prefix(sidx, docs_tbl):
    """The k-th hit's sort_val must be >= every unmatched doc's... no —
    >= every MATCHED doc's value outside the top-k (the global-prefix
    property the index order guarantees)."""
    reader = IndexReader(sidx)
    ids, _ = sorted_conjunction_topk(reader, ["table"], k=5)
    from defactonlp_ray.stages.sorted_index import _sortmap_lookup

    m = _sortmap_lookup(sidx, ids)
    vals = [m[i][1] for i in ids.tolist()]
    assert vals == sorted(vals, reverse=True)
    full = _py_topk(docs_tbl, ["table"], 10**9)
    if len(full) > 5:
        assert vals[-1] >= full[5][0]


def test_sorted_search_pipeline_and_resume(sidx, sf_dir, docs_tbl):
    import pyarrow as pa

    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "terms": pa.array(
                    [["the"], ["hash", "join"]], pa.list_(pa.string())
                ),
            }
        )
    )
    res = sorted_search(sidx, qds, k=5, concurrency=2).to_pandas()
    for qid, terms in ((0, ["the"]), (1, ["hash", "join"])):
        g = res[res["query_id"] == qid].sort_values("rank")
        want = _py_topk(docs_tbl, terms, 5)
        assert list(zip(g["sort_val"], g["doc_id"])) == want
    # resume: a second build call is a no-op (the _SUCCESS short-circuit)
    before = os.stat(os.path.join(sidx, "sortmap", "_SUCCESS")).st_mtime_ns
    build_sorted_index(
        ray.data.from_arrow(docs_tbl), sidx, sort_col="n_chars",
        seg_docs=SEG_DOCS, resume=True,
    )
    after = os.stat(os.path.join(sidx, "sortmap", "_SUCCESS")).st_mtime_ns
    assert before == after
