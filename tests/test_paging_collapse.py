"""search_after pagination and field collapsing.

* page1 + page2 (cursor-pushed) == top-20 of the plain ranking under
  the round(score,6) policy — completeness: the cursor mask must never
  drop a doc that belongs on page 2.
* collapse == scalar reference (best doc per group by (rounded score
  DESC, doc_id ASC), groups ranked by their winner) — and every
  returned source is distinct per query.
* cursor on an unsupported mode raises.
"""

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
    out = str(tmp_path_factory.mktemp("idx_page"))
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
    return fixtures.make_query_terms(15)


def _qds(queries):
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in queries], pa.int64()),
                "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
            }
        )
    )


def _rounded_rank(rows, k):
    """(doc, round6(score)) per query ranked by (score DESC, doc ASC)."""
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(
            (round(r["score"], 6), r["doc_id"])
        )
    out = {}
    for qid, items in per_q.items():
        items.sort(key=lambda sd: (-sd[0], sd[1]))
        out[qid] = items[:k]
    return out


def test_page2_completes_top20(index_dir, queries):
    full = _rounded_rank(
        S.search(index_dir, _qds(queries), k=40).take_all(), 20
    )
    p1 = _rounded_rank(S.search(index_dir, _qds(queries), k=20).take_all(), 10)
    qmap = dict(queries)
    rows = [
        (qid, qmap[qid], items[-1][0], items[-1][1])
        for qid, items in p1.items()
        if len(items) == 10
    ]
    qt = pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "terms": pa.array([r[1] for r in rows], pa.list_(pa.string())),
            "after_score": pa.array([r[2] for r in rows], pa.float64()),
            "after_doc": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    p2 = _rounded_rank(
        S.search(index_dir, ray.data.from_arrow(qt), k=20).take_all(), 10
    )
    for qid, items in p1.items():
        want = full[qid]
        got = items + p2.get(qid, [])
        assert got == want, qid


def test_after_cursor_rejected_on_wand(index_dir, queries):
    qt = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "terms": pa.array([["w0000"]], pa.list_(pa.string())),
            "after_score": pa.array([1.0], pa.float64()),
            "after_doc": pa.array([5], pa.int64()),
        }
    )
    with pytest.raises(Exception):
        S.search(index_dir, ray.data.from_arrow(qt), k=5, mode="wand").take_all()


@pytest.fixture(scope="module")
def groups(corpus):
    # deterministic 7-way grouping of docs
    names = [f"g{j}" for j in range(7)]
    codes = np.array([i % 7 for i in corpus], dtype=np.int32)
    return {"codes": codes, "names": names}


def _collapse_reference(corpus, groups, terms, k):
    # scalar BM25 over the corpus, then best-per-group on rounded scores
    doc_tf, doc_len = {}, {}
    df = Counter()
    for doc_id in sorted(corpus):
        toks = tokenize(corpus[doc_id])
        doc_tf[doc_id] = Counter(toks)
        doc_len[doc_id] = len(toks)
        for t in set(toks):
            df[t] += 1
    n = len(corpus)
    avgdl = sum(doc_len.values()) / n
    import math

    scores = {}
    for t in sorted(set(terms)):
        if not df.get(t):
            continue
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        for doc_id, tf in doc_tf.items():
            if t in tf:
                w = (tf[t] * (S.K1 + 1.0)) / (
                    tf[t] + S.K1 * (1.0 - S.B + S.B * doc_len[doc_id] / avgdl)
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * w
    best = {}
    for doc_id, sc in scores.items():
        g = int(groups["codes"][doc_id])
        key = (-round(sc, 6), doc_id)
        if g not in best or key < best[g][0]:
            best[g] = (key, doc_id, round(sc, 6))
    winners = sorted(
        ((sc, d, g) for g, (_, d, sc) in best.items()),
        key=lambda x: (-x[0], x[1]),
    )
    return [
        (groups["names"][g], d, sc) for sc, d, g in winners[:k]
    ]


def test_collapse_matches_scalar_reference(index_dir, corpus, groups, queries):
    got = {}
    res = S.search(
        index_dir, _qds(queries), k=5, mode="collapse",
        group_ref=groups,
    ).take_all()
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (r["source"], r["doc_id"], r["score"])
        )
    for qid, terms in queries:
        want = _collapse_reference(corpus, groups, terms, 5)
        assert got.get(qid, []) == want, (qid, terms)
        srcs = [s for s, _, _ in got.get(qid, [])]
        assert len(srcs) == len(set(srcs))


def test_mlt_excludes_seed_docs():
    from defactonlp_ray.pipelines import queries as Q

    res = Q.q_mlt_topk("/root/testdata/sf0.01")
    assert len(res) > 0
    assert not (res["doc_id"] == res["query_id"]).any()
    assert set(res["query_id"]) <= set(Q._MLT_SEEDS)


def test_count_mode_matches_reference(index_dir, corpus, queries):
    got = {
        r["query_id"]: r["n_hits"]
        for r in S.search(index_dir, _qds(queries), mode="count").take_all()
    }
    doc_terms = {d: set(tokenize(t)) for d, t in corpus.items()}
    for qid, terms in queries:
        want = sum(
            1 for toks in doc_terms.values() if toks & set(terms)
        )
        assert got.get(qid, 0) == want, (qid, terms)


def test_auto_equals_taat_end_to_end(index_dir, queries):
    a = S.search(index_dir, _qds(queries), k=K, mode="auto").take_all()
    b = S.search(index_dir, _qds(queries), k=K, mode="taat").take_all()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )
    assert key(a) == key(b)


def test_auto_wand_branch_identical(index_dir, queries, monkeypatch):
    # force the planner's WAND branch (driver-side actor instances see
    # the patched threshold) and assert the route is still exact
    monkeypatch.setattr(S, "AUTO_WAND_MIN_POSTINGS", 0)
    qt = pa.table(
        {
            "query_id": pa.array([q for q, _ in queries], pa.int64()),
            "terms": pa.array(
                [t[:1] for _, t in queries], pa.list_(pa.string())
            ),  # single-term: dmax >= 4*(dsum-dmax) holds
        }
    )
    auto = S.SearcherActor(index_dir=index_dir, k=K, mode="auto")(qt)
    taat = S.SearcherActor(index_dir=index_dir, k=K, mode="taat")(qt)
    assert auto.equals(taat)


def test_hybrid_rrf_fusion_properties():
    from defactonlp_ray.pipelines import queries as Q

    res = Q.q_hybrid_rrf("/root/testdata/sf0.01")
    assert set(res["query_id"]) == {0, 1, 2}
    # max possible fused score is rank-1 in BOTH legs: 2/61
    assert (res["score"] <= round(2.0 / 61.0, 6)).all()
    assert (res["score"] > 0).all()
    for _qid, g in res.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
