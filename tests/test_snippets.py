"""Snippet extraction (stages/snippets.py): window rule unit tests +
distributed stage vs a brute-force serial oracle."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages.snippets import best_window, extract_snippets


def _brute_best_window(toks, terms, width):
    """Independent O(n·width) check: every term-occurrence start."""
    tset = set(terms)
    starts = [i for i, t in enumerate(toks) if t in tset]
    if not starts:
        return -1, 0
    best = None
    for s in starts:
        n = len(tset & set(toks[s : s + width]))
        if best is None or n > best[1]:
            best = (s, n)
    return best


def test_best_window_basic():
    toks = "the quick brown fox jumps over the lazy dog".split()
    # both terms fit in a width-3 window starting at 'quick'
    assert best_window(toks, ["quick", "fox"], 3) == (1, 2)
    # earliest window wins ties: 'the' occurs at 0 and 6
    assert best_window(toks, ["the"], 3) == (0, 1)
    assert best_window(toks, ["missing"], 3) == (-1, 0)


def test_best_window_distinct_not_total():
    toks = "a a a b".split()
    # window [0,2] has 3 copies of 'a' but only 1 distinct; [1,3] has 2
    assert best_window(toks, ["a", "b"], 3) == (1, 2)


def test_best_window_matches_brute(  ):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(60):
        toks = [vocab[i] for i in rng.integers(0, 12, size=30)]
        terms = sorted({vocab[i] for i in rng.integers(0, 12, size=3)})
        width = int(rng.integers(2, 8))
        assert best_window(toks, terms, width) == _brute_best_window(
            toks, terms, width
        ), (toks, terms, width)


def test_extract_snippets_stage_matches_serial():
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(
                [
                    " ".join(
                        f"w{(i * 7 + j * 3) % 11}" for j in range(20 + i % 5)
                    )
                    for i in range(40)
                ]
            ),
        }
    )
    docs = ray.data.from_arrow(docs_tbl).repartition(5)
    qterms = {0: ["w0", "w3"], 1: ["w5"], 2: ["zz"]}
    pairs = [(0, 1), (0, 7), (1, 2), (1, 39), (2, 3)]
    out = (
        extract_snippets(docs, pairs, qterms, width=6, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(out) == len(pairs)
    texts = {d: t for d, t in zip(docs_tbl["doc_id"].to_pylist(),
                                  docs_tbl["text"].to_pylist())}
    for _, row in out.iterrows():
        toks = tokenize(texts[row["doc_id"]])
        s, n = _brute_best_window(toks, qterms[row["query_id"]], 6)
        assert (row["start"], row["n_terms"]) == (s, n)
        want = " ".join(toks[s : s + 6]) if s >= 0 else ""
        assert row["snippet"] == want


def test_extract_snippets_arrow_pairs_table():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["alpha beta gamma", "delta beta"]),
            }
        )
    )
    pairs = pa.table(
        {
            "query_id": pa.array([0, 0], pa.int64()),
            "doc_id": pa.array([0, 1], pa.int64()),
        }
    )
    out = (
        extract_snippets(docs, pairs, {0: ["beta"]}, width=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["snippet"].tolist() == ["beta gamma", "beta"]
    assert out["start"].tolist() == [1, 1]
