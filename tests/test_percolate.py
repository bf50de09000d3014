"""Percolator (stages/percolate.py): stored boolean term queries match
against a streaming corpus — reverse search.  Reference check: a plain
Python set-algebra evaluation per (query, doc)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages.percolate import _PercolateMatcher, percolate

TEXTS = [
    "data query fast",          # 0
    "merge sort slow",          # 1
    "merge sort scan",          # 2
    "data the a dup",           # 3
    "",                         # 4: empty doc
    "query data data query",    # 5: repeated terms count once
]
QUERIES = [
    (0, ["data", "query"], []),
    (1, ["merge", "sort"], ["slow"]),
    (2, ["dup"], []),
    (3, ["zzz"], []),
    (4, ["the", "a"], ["dup"]),
]


def _reference(texts, queries):
    out = []
    for qid, must, must_not in queries:
        for d, t in enumerate(texts):
            toks = set(tokenize(t))
            if set(must) <= toks and not (set(must_not) & toks):
                out.append((qid, d))
    return sorted(out)


def _docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def test_percolate_equals_python_reference():
    got = percolate(_docs_ds(TEXTS), QUERIES).to_pandas()
    got = sorted(map(tuple, got.to_numpy()))
    assert got == _reference(TEXTS, QUERIES)
    # spot semantics: doc 1 has 'slow' -> excluded from query 1
    assert (1, 1) not in got and (1, 2) in got
    # doc 3 has 'dup' -> excluded from query 4 despite matching musts
    assert (4, 3) not in got


def test_percolate_matcher_empty_batch_and_no_vocab_overlap():
    m = _PercolateMatcher(QUERIES)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert m(empty).num_rows == 0
    off = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array(["unrelated words only"])})
    out = m(off)
    assert out.num_rows == 0
    assert out.schema.names == ["query_id", "doc_id"]


def test_percolate_requires_must_terms():
    with pytest.raises(ValueError):
        _PercolateMatcher([(0, [], ["x"])])


def test_percolate_duplicate_must_terms_collapse():
    # a query registered with repeated must terms must not demand tf >= 2
    got = percolate(_docs_ds(["data fast"]), [(0, ["data", "data"], [])])
    assert got.to_pandas()["doc_id"].tolist() == [0]
