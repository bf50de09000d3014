"""LM-Dirichlet scorer and synonym-group (Lucene SynonymQuery) retrieval.

* LMD vs an independent scalar reference (math.log): rank set + score
  closeness at 1e-9 — the engine applies np.log to posting ARRAYS, so
  1-ulp libm divergence from math.log is possible and bit-exactness is
  deliberately not claimed here (the round(score,6) DuckDB oracle in
  test_oracle_parity is the cross-engine rank gate).
* LMD shared-index route == reader route bit-for-bit (same kernels).
* Synonym scoring: singleton groups == plain BM25 bit-for-bit (merged
  tf sums are integers, idf is scalar math.log in both paths), and the
  general case matches a scalar reference bit-for-bit for the same
  reason (no transcendentals over arrays in the synonym path).
"""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.functions.tokenizer import tokenize
from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.index_build import build_index

N_DOCS = 400
K = 10


@pytest.fixture(scope="module")
def corpus():
    pages = fixtures.make_pages(N_DOCS)
    return {i: t for i, t in enumerate(pages["text"].to_pylist())}


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_lmd"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": list(corpus.values()),
            }
        )
    )
    build_index(ds, out, seg_docs=128)
    return out


@pytest.fixture(scope="module")
def queries():
    return fixtures.make_query_terms(20)


def _qds(queries):
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in queries], pa.int64()),
                "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
            }
        )
    )


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


class _Stats:
    """Scalar tf/dl/cf/df over the corpus dict (independent of the index)."""

    def __init__(self, corpus):
        self.doc_tf = {}
        self.doc_len = {}
        self.cf = Counter()
        self.df = Counter()
        for doc_id in sorted(corpus):
            toks = tokenize(corpus[doc_id])
            tf = Counter(toks)
            self.doc_tf[doc_id] = tf
            self.doc_len[doc_id] = len(toks)
            for t, c in tf.items():
                self.cf[t] += c
                self.df[t] += 1
        self.n_docs = len(corpus)
        self.total_len = sum(self.doc_len.values())
        self.avgdl = self.total_len / self.n_docs


@pytest.fixture(scope="module")
def stats(corpus):
    return _Stats(corpus)


def _lmd_reference(st: _Stats, terms, k, mu=2000.0):
    T = float(st.total_len)
    scores = {}
    for t in sorted(set(terms)):
        cf = st.cf.get(t, 0)
        if not cf:
            continue
        for doc_id, tf in st.doc_tf.items():
            if t in tf:
                c = math.log(1.0 + tf[t] * T / (mu * cf)) + math.log(
                    mu / (st.doc_len[doc_id] + mu)
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + c
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_lmd_matches_scalar_reference(index_dir, stats, queries):
    got = _group(S.search(index_dir, _qds(queries), k=K, mode="lmd").take_all())
    for qid, terms in queries:
        want = _lmd_reference(stats, terms, K)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (qid, terms)
        assert np.allclose(
            [s for _, s in have], [s for _, s in want], rtol=1e-9, atol=0
        ), (qid, terms)


def test_lmd_shared_route_bit_equal(index_dir, queries):
    a = S.search(index_dir, _qds(queries), k=K, mode="lmd").take_all()
    b = S.search(index_dir, _qds(queries), k=K, mode="lmd", shared=True).take_all()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )
    assert key(a) == key(b)


def test_reader_cfs_match_corpus(index_dir, stats):
    reader = S.IndexReader(index_dir)
    terms = ["w0000", "w0001", "w0500", "nosuchterm"]
    cfs = reader.cfs(terms)
    for t in terms:
        assert cfs[t] == stats.cf.get(t, 0), t
    assert reader.total_len == stats.total_len


def _syn_reference(st: _Stats, terms, syn, k):
    scores = {}
    for t in sorted(set(terms)):
        members = sorted({t, *syn.get(t, [])})
        df_g = max(st.df.get(m, 0) for m in members)
        present = [m for m in members if st.df.get(m, 0)]
        if not present:
            continue
        idf = math.log(1.0 + (st.n_docs - df_g + 0.5) / (df_g + 0.5))
        for doc_id, tf in st.doc_tf.items():
            tfm = float(sum(tf.get(m, 0) for m in present))
            if not tfm:
                continue
            dl = st.doc_len[doc_id]
            w = (tfm * (S.K1 + 1.0)) / (
                tfm + S.K1 * (1.0 - S.B + S.B * dl / st.avgdl)
            )
            scores[doc_id] = scores.get(doc_id, 0.0) + idf * w
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_synonym_singleton_groups_equal_plain_bm25(index_dir, queries):
    plain = S.search(index_dir, _qds(queries), k=K).take_all()
    syn = S.search(index_dir, _qds(queries), k=K, mode="synonym",
                   syn_map={}).take_all()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )
    assert key(plain) == key(syn)


def test_synonym_matches_scalar_reference(index_dir, stats, queries):
    syn = {
        "w0000": ["w0001", "w0100"],
        "w0003": ["nosuchterm"],
        "w0010": ["w0500"],
    }
    got = _group(
        S.search(
            index_dir, _qds(queries), k=K, mode="synonym", syn_map=syn
        ).take_all()
    )
    for qid, terms in queries:
        want = _syn_reference(stats, terms, syn, K)
        assert got.get(qid, []) == want, (qid, terms)
