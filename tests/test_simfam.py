"""DFR InL2 / IB SPL-D / DFI chi-squared similarity family.

* Each model vs an independent scalar reference (math.log over dict
  stats): rank set + score closeness at 1e-9 — same exactness policy as
  the LMD test (the round(score,6) DuckDB oracle in test_oracle_parity
  is the cross-engine gate).
* DFI's independence gate: a (term, doc) with tf <= expected contributes
  exactly 0, and a doc whose every matched term is at-or-below
  expectation is excluded from results entirely.
* SPL's pinned lambda = (df+0.5)/(N+1): a term present in EVERY doc
  (df == N, where Lucene's LambdaDF formula poles at 1/(1-1)) still
  yields finite scores.
* Shared-pack route == per-actor reader route bit-for-bit (same kernel,
  same arrays).
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

N_DOCS = 300
K = 10


@pytest.fixture(scope="module")
def corpus():
    pages = fixtures.make_pages(N_DOCS)
    return {i: t for i, t in enumerate(pages["text"].to_pylist())}


def _build(tmp_path_factory, corpus, tag):
    out = str(tmp_path_factory.mktemp(tag))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": list(corpus.values()),
            }
        )
    )
    build_index(ds, out, seg_docs=96)
    return out


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, corpus):
    return _build(tmp_path_factory, corpus, "idx_simfam")


@pytest.fixture(scope="module")
def queries():
    return fixtures.make_query_terms(16)


def _qds(queries):
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in queries], pa.int64()),
                "terms": pa.array(
                    [t for _, t in queries], pa.list_(pa.string())
                ),
            }
        )
    )


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


class _Stats:
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


_LN2 = math.log(2.0)


def _reference(st: _Stats, terms, model, k):
    N = float(st.n_docs)
    T = float(st.total_len)
    scores: dict[int, float] = {}
    matched: set[int] = set()
    for t in sorted(set(terms)):
        df = st.df.get(t, 0)
        if not df:
            continue
        for doc_id, tf in st.doc_tf.items():
            if t not in tf:
                continue
            matched.add(doc_id)
            dl = st.doc_len[doc_id]
            if model == "dfi":
                e = st.cf[t] * float(dl) / T
                c = (
                    math.log((tf[t] - e) ** 2 / e + 1.0) / _LN2
                    if tf[t] > e
                    else 0.0
                )
            elif model == "lmjm":
                c = math.log(
                    1.0 + ((1.0 - 0.1) * tf[t] / dl) / (0.1 * st.cf[t] / T)
                )
            elif model == "f2exp":
                c = (
                    tf[t] / (tf[t] + 0.5 + 0.5 * dl / st.avgdl)
                ) * math.pow(N / df, 0.35)
            elif model == "pl2":
                lam = st.cf[t] / N
                tfn = tf[t] * math.log(1.0 + st.avgdl / dl) / _LN2
                c = (1.0 / (tfn + 1.0)) * (
                    tfn * math.log(tfn / lam) / _LN2
                    + (lam + 1.0 / (12.0 * tfn) - tfn) / _LN2
                    + 0.5 * math.log(2.0 * math.pi * tfn) / _LN2
                )
            elif model == "dph":
                if tf[t] >= dl:
                    c = 0.0
                else:
                    f = tf[t] / dl
                    c = ((1.0 - f) * (1.0 - f) / (tf[t] + 1.0)) * (
                        tf[t]
                        * math.log(
                            (tf[t] * st.avgdl / dl) * (N / st.cf[t])
                        )
                        / _LN2
                        + 0.5
                        * math.log(2.0 * math.pi * tf[t] * (1.0 - f))
                        / _LN2
                    )
            else:
                tfn = tf[t] * math.log(1.0 + st.avgdl / dl) / _LN2
                if model == "dfr":
                    c = tfn / (tfn + 1.0) * (
                        math.log((N + 1.0) / (df + 0.5)) / _LN2
                    )
                else:  # spl
                    lam = (df + 0.5) / (N + 1.0)
                    c = (
                        -math.log(
                            (lam ** (tfn / (tfn + 1.0)) - lam) / (1.0 - lam)
                        )
                        / _LN2
                    )
            scores[doc_id] = scores.get(doc_id, 0.0) + c
    if model == "dfi":
        scores = {d: s for d, s in scores.items() if s > 0.0}
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize(
    "model", ["dfr", "spl", "dfi", "lmjm", "f2exp", "pl2", "dph"]
)
def test_simfam_matches_scalar_reference(index_dir, stats, queries, model):
    got = _group(
        S.search(index_dir, _qds(queries), k=K, mode=model).take_all()
    )
    for qid, terms in queries:
        want = _reference(stats, terms, model, K)
        have = got.get(qid, [])
        assert [d for d, _ in have] == [d for d, _ in want], (model, qid, terms)
        assert np.allclose(
            [s for _, s in have], [s for _, s in want], rtol=1e-9, atol=1e-12
        ), (model, qid, terms)


def test_dfi_drops_at_or_below_expectation(tmp_path_factory):
    # "x" appears once in every doc and doc lengths are equal, so for
    # "x": expected = cf*dl/T = N*dl/(N*dl) * ... = exactly 1.0 = tf —
    # at expectation, contributes 0, and an x-only query returns nothing.
    docs = {i: "x f0 f1 f2 f3" for i in range(8)}
    # one doc where "y" is bursty (above expectation)
    docs[3] = "x y y y f3"
    idx = _build(tmp_path_factory, docs, "idx_dfi_gate")
    qs = [(0, ["x"]), (1, ["y"]), (2, ["x", "y"])]
    got = _group(S.search(idx, _qds(qs), k=5, mode="dfi").take_all())
    assert got.get(0, []) == []  # every contribution exactly 0 -> dropped
    assert [d for d, _ in got[1]] == [3]
    assert [d for d, _ in got[2]] == [3]  # x adds 0, y carries doc 3


def test_spl_finite_for_universal_term(tmp_path_factory):
    # df == N: Lucene's LambdaDF ((df+1)/(N+1) = 1) poles; the pinned
    # (df+0.5)/(N+1) keeps lambda < 1 and every score finite/positive.
    docs = {i: f"u u w{i} pad pad" for i in range(6)}
    idx = _build(tmp_path_factory, docs, "idx_spl_pole")
    got = _group(S.search(idx, _qds([(0, ["u"])]), k=10, mode="spl").take_all())
    rows = got.get(0, [])
    assert len(rows) == 6
    assert all(np.isfinite(s) and s > 0.0 for _, s in rows)


@pytest.mark.parametrize("mode", ["dfr", "lmd", "dfi"])
def test_fanout_route_equals_fused(index_dir, queries, mode):
    # per-segment scoring with GLOBAL stats + merge == the fused route
    # (docs live in exactly one segment; every model here is an additive
    # per-term sum) — also covers the SegSearcher stat-wiring for the
    # stat-dependent modes (lmd needs cfs, dfr dfs, dfi both)
    a = S.search(index_dir, _qds(queries), k=K, mode=mode).take_all()
    b = S.search_fanout(index_dir, _qds(queries), k=K, mode=mode).take_all()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )
    assert key(a) == key(b)


def test_dfr_shared_route_bit_equal(index_dir, queries):
    a = S.search(index_dir, _qds(queries), k=K, mode="dfr").take_all()
    b = S.search(
        index_dir, _qds(queries), k=K, mode="dfr", shared=True
    ).take_all()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )
    assert key(a) == key(b)


# ------------------------------- SAAT anytime serving (same fixtures)

def test_saat_full_budget_is_exact_and_anytime_monotone(index_dir, queries):
    from defactonlp_ray.stages.search import IndexReader, score_all_saat

    reader = IndexReader(index_dir)
    for _qid, terms in queries[:8]:
        uniq = sorted(set(terms))
        dfs = reader.dfs(uniq)
        idfs = {t: reader.idf(t) for t in uniq}
        for sid in reader.seg_ids:
            reader.load_postings(sid, [t for t in uniq if dfs[t] > 0])
        full, done_f, total = score_all_saat(
            reader, reader.seg_ids, uniq, idfs, 10, budget_frac=1.0
        )
        if not full:
            continue
        assert done_f == total
        # integer scores, exact quantized ranking at full budget
        assert all(isinstance(s, int) and s >= 1 for s, _d in full)
        prev_done = 0
        full_scores = dict((d, s) for s, d in full)
        for frac in (0.25, 0.5, 0.75, 1.0):
            part, done, tot = score_all_saat(
                reader, reader.seg_ids, uniq, idfs, 10, budget_frac=frac
            )
            assert tot == total
            assert done >= prev_done  # budget monotone in work
            prev_done = done
            # the anytime invariant: a partial budget processes a
            # SUBSET of postings, so every reported score is a lower
            # bound on the doc's full quantized score
            for s, d in part:
                if d in full_scores:
                    assert s <= full_scores[d], (terms, frac, d)
        # at budget 1.0 the set and scores are exactly the full ranking
        last, done_l, _ = score_all_saat(
            reader, reader.seg_ids, uniq, idfs, 10, budget_frac=1.0
        )
        assert last == full and done_l == total


def test_saat_stored_equals_kernel_at_stored_scale(
    index_dir, queries, tmp_path_factory
):
    # the stored impact layout replays the in-memory kernel exactly
    # when the kernel quantizes against the stored global wmax
    import ray.data as rd

    from defactonlp_ray.stages.impacts import (
        build_impact_index, saat_stored_search,
    )
    from defactonlp_ray.stages.search import IndexReader, score_all_saat

    out = str(tmp_path_factory.mktemp("impacts")) + "/idx"
    wmax = build_impact_index(index_dir, out, concurrency=2)
    assert wmax > 0
    res = saat_stored_search(out, _qds(queries), k=K, concurrency=2).take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (int(r["score"]), r["doc_id"])
        )
    reader = IndexReader(index_dir)
    for qid, terms in queries:
        uniq = sorted(set(terms))
        dfs = reader.dfs(uniq)
        idfs = {t: reader.idf(t) for t in uniq}
        for sid in reader.seg_ids:
            reader.load_postings(sid, [t for t in uniq if dfs[t] > 0])
        want, _d, _t = score_all_saat(
            reader, reader.seg_ids, uniq, idfs, K, wmax=wmax
        )
        assert got.get(qid, []) == want, (qid, terms)


def test_saat_stored_budget_is_bounded_lower_estimate(
    index_dir, queries, tmp_path_factory
):
    from defactonlp_ray.stages.impacts import (
        build_impact_index, saat_stored_search,
    )

    out = str(tmp_path_factory.mktemp("impacts_b")) + "/idx"
    build_impact_index(index_dir, out, concurrency=2)
    full = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in saat_stored_search(
            out, _qds(queries), k=K, concurrency=2
        ).take_all()
    }
    part = saat_stored_search(
        out, _qds(queries), k=K, budget_frac=0.5, concurrency=2
    ).take_all()
    assert part  # budgeted serving still answers
    for r in part:
        key = (r["query_id"], r["doc_id"])
        if key in full:
            assert r["score"] <= full[key]


def test_impact_index_staleness_rebuild(index_dir, tmp_path_factory):
    # the trgm-fix shape (ADVICE r03): a mutated source dictionary
    # (what append/compact does) must force a rebuild, not serve stale
    # impacts
    import glob
    import json
    import os
    import time

    from defactonlp_ray.stages.impacts import _meta_path, build_impact_index

    out = str(tmp_path_factory.mktemp("impacts_stale")) + "/idx"
    w1 = build_impact_index(index_dir, out, concurrency=2)
    m1 = json.load(open(_meta_path(out)))
    assert build_impact_index(index_dir, out, concurrency=2) == w1  # idempotent
    root = os.path.join(index_dir, "stats", "term_df")
    files = (
        [root]
        if os.path.isfile(root)
        else [
            p
            for p in glob.glob(os.path.join(root, "**", "*"), recursive=True)
            if os.path.isfile(p)
        ]
    )
    os.utime(files[0], ns=(time.time_ns(), time.time_ns() + 1))
    w2 = build_impact_index(index_dir, out, concurrency=2)
    m2 = json.load(open(_meta_path(out)))
    assert m2["fingerprint"] != m1["fingerprint"]
    assert w2 == w1  # same content -> same scale after the rebuild


def test_impact_index_crash_resume(index_dir, tmp_path_factory):
    # meta-less leftover dir (crash between rename and meta write) and
    # a stale .tmp must both be cleared, not mixed into the new build
    import json
    import os
    import shutil

    from defactonlp_ray.stages.impacts import _meta_path, build_impact_index

    out = str(tmp_path_factory.mktemp("impacts_crash")) + "/idx"
    w1 = build_impact_index(index_dir, out, concurrency=2)
    # simulate the crash: drop meta, plant a bogus tmp
    os.remove(_meta_path(out))
    os.makedirs(out + ".tmp/bucket=0", exist_ok=True)
    with open(out + ".tmp/bucket=0/junk.parquet", "w") as f:
        f.write("not parquet")
    w2 = build_impact_index(index_dir, out, concurrency=2)
    assert w2 == w1
    assert os.path.exists(_meta_path(out))
    assert not os.path.exists(out + ".tmp")
    meta = json.load(open(_meta_path(out)))
    assert meta["wmax"] == w1


@pytest.mark.parametrize("budget", [0.3, 0.6])
def test_saat_stored_budget_equals_kernel(
    index_dir, queries, tmp_path_factory, budget
):
    # the two-phase prefix read (metadata plan + impact>=cut fetch) is
    # bit-equal to the in-memory kernel at the same budget and scale
    from defactonlp_ray.stages.impacts import (
        build_impact_index, saat_stored_search,
    )
    from defactonlp_ray.stages.search import IndexReader, score_all_saat

    out = str(tmp_path_factory.mktemp(f"impacts_pb{int(budget*10)}")) + "/idx"
    wmax = build_impact_index(index_dir, out, concurrency=2)
    res = saat_stored_search(
        out, _qds(queries), k=K, budget_frac=budget, concurrency=2
    ).take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (int(r["score"]), r["doc_id"])
        )
    reader = IndexReader(index_dir)
    for qid, terms in queries:
        uniq = sorted(set(terms))
        dfs = reader.dfs(uniq)
        idfs = {t: reader.idf(t) for t in uniq}
        for sid in reader.seg_ids:
            reader.load_postings(sid, [t for t in uniq if dfs[t] > 0])
        want, _d, _t = score_all_saat(
            reader, reader.seg_ids, uniq, idfs, K,
            budget_frac=budget, wmax=wmax,
        )
        assert got.get(qid, []) == want, (qid, terms, budget)
