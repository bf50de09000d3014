"""Sequential dependence model (Metzler & Croft 2005).

* pair_window_counts vs a brute-force per-doc pair enumeration
  (including the duplicate-term self-pair exclusion).
* The dependency property the independent-term scorers can't express:
  with equal unigram evidence, the doc containing the adjacent phrase
  outranks the doc with scattered terms, which outranks nothing.
* Unigram-only degenerate case (1-term query) equals the pinned LMD
  contribution ordering up to the 0.85 scale factor.
"""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages import phrase as P
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.search import IndexReader


def _build(tmp_path_factory, docs, tag):
    out = str(tmp_path_factory.mktemp(tag))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": [docs[i] for i in sorted(docs)],
            }
        )
    )
    build_index(ds, out, seg_docs=64, positions=True)
    return out


def _brute_pairs(tokens, ta, tb, window):
    pa_ = [i for i, x in enumerate(tokens) if x == ta]
    pb_ = [i for i, x in enumerate(tokens) if x == tb]
    n = 0
    for i, j in itertools.product(pa_, pb_):
        if abs(i - j) <= window - 1 and not (ta == tb and i == j):
            n += 1
    return n


def test_pair_window_counts_bruteforce(tmp_path_factory):
    pages = fixtures.make_pages(120)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    idx = _build(tmp_path_factory, docs, "idx_sdm_pairs")
    reader = IndexReader(idx)
    for ta, tb in [("hash", "join"), ("data", "data"), ("scan", "slow")]:
        pw = P.pair_window_counts(reader, reader.seg_ids, ta, tb, 8)
        got = (
            dict(zip(pw[0].tolist(), pw[1].tolist())) if pw is not None else {}
        )
        want = {}
        tot = 0
        for doc_id, text in docs.items():
            n = _brute_pairs(tokenize(text), ta, tb, 8)
            tot += n
            if n:
                want[doc_id] = n
        assert got == want, (ta, tb)
        if pw is not None:
            assert pw[3] == tot


def test_dependency_ordering(tmp_path_factory):
    # same unigram profile (one "a", one "b", same doc length) in docs
    # 0-2; only adjacency/proximity differ.  SDM must order:
    # adjacent > within-window > out-of-window.
    docs = {
        0: "a b f0 f1 f2 f3 f4 f5 f6 f7 f8 f9",           # adjacent
        1: "a f0 f1 b f2 f3 f4 f5 f6 f7 f8 f9",           # within uw8
        2: "a f0 f1 f2 f3 f4 f5 f6 f7 f8 f9 b",           # gap 11: no pair
        3: "c c c c c c c c c c c c",                      # noise
    }
    idx = _build(tmp_path_factory, docs, "idx_sdm_dep")
    reader = IndexReader(idx)
    top = P.score_sdm(reader, reader.seg_ids, ["a", "b"], 5)
    order = [d for _s, d in top]
    assert order[:3] == [0, 1, 2]
    scores = {d: s for s, d in top}
    assert scores[0] > scores[1] > scores[2]


def test_unigram_only_query(tmp_path_factory):
    docs = {i: t for i, t in enumerate(
        fixtures.make_pages(80)["text"].to_pylist()
    )}
    idx = _build(tmp_path_factory, docs, "idx_sdm_uni")
    reader = IndexReader(idx)
    term = tokenize(docs[0])[0]  # guaranteed present in the corpus
    top = P.score_sdm(reader, reader.seg_ids, [term], 5)
    assert len(top) >= 1
    # single term, no pairs: ordering equals the LMD ordering (the SDM
    # unigram feature is the LMD contribution scaled by 0.85 > 0)
    from defactonlp_ray.stages.search import score_all_lmd

    cfs = reader.cfs([term])
    lmd = score_all_lmd(reader, reader.seg_ids, [term], cfs, 5)
    assert [d for _s, d in top] == [d for _s, d in lmd]
    for (s_sdm, d1), (s_lmd, d2) in zip(top, lmd):
        assert d1 == d2
        assert s_sdm == pytest.approx(0.85 * s_lmd, rel=1e-12)
