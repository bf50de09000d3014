"""End-to-end index build + BM25 query tests (SURVEY.md §5.2.3-4):

* engine top-k == pure-Python oracle top-k — docids AND float64 scores
  bit-for-bit (the rank-identity gate),
* WAND == exact TAAT,
* fan-out/merge (Q4) == single-actor path,
* parallelism invariance (different segment sizes -> identical results),
* resume from manifest produces an identical index.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from defactonlp_ray import fixtures, oracle
from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.index_build import build_index

N_DOCS = 600
N_QUERIES = 40
K = 10


@pytest.fixture(scope="module")
def corpus():
    pages = fixtures.make_pages(N_DOCS)
    # docs = unique urls (content as-is), doc_id = row index (urls ascend)
    docs = {i: t for i, t in enumerate(pages["text"].to_pylist())}
    return docs


@pytest.fixture(scope="module")
def queries():
    return fixtures.make_query_terms(N_QUERIES)


@pytest.fixture(scope="module")
def oracle_index(corpus):
    return oracle.OracleIndex(corpus)


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx"))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": list(corpus.values()),
            }
        )
    )
    build_index(ds, out, seg_docs=200)
    return out


def _qds(queries):
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in queries], pa.int64()),
                "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
            }
        )
    )


def _as_map(result_tbl):
    out = {}
    for r in result_tbl.to_pylist():
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


def test_build_layout_and_manifest(index_dir):
    recs = mf.read_manifest(index_dir)
    assert len(recs) == 3  # 600 docs / 200 per segment
    for sid, rec in recs.items():
        assert os.path.isdir(mf.segment_dir(index_dir, sid))
        for key in ("n_docs", "total_len", "n_terms", "n_postings",
                    "codec_version", "tokenizer_version", "doc_lo", "doc_hi"):
            assert key in rec
    assert os.path.exists(os.path.join(index_dir, "stats", "collection.json"))


def test_global_stats_match_oracle(index_dir, oracle_index):
    reader = S.IndexReader(index_dir)
    assert reader.n_docs == oracle_index.n_docs
    assert reader.avgdl == oracle_index.avgdl  # int/int division, bit-exact
    terms = ["w0000", "w0001", "w0500", "alice", "nosuchterm"]
    dfs = reader.dfs(terms)
    for t in terms:
        assert dfs[t] == len(oracle_index.postings.get(t, ())), t


def test_rank_and_score_identity_vs_oracle(index_dir, oracle_index, queries):
    res = S.search(index_dir, _qds(queries), k=K).take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, terms in queries:
        want = oracle_index.bm25_topk(terms, K)
        assert got.get(qid, []) == want, f"query {qid} {terms}"


def test_tfidf_route_matches_oracle(index_dir, oracle_index, queries):
    """DrQA-style tf-idf diagnostic scorer: rank AND float64 score
    identity vs oracle.tfidf_topk (duplicate query terms weighted)."""
    dup_queries = [(qid, terms + terms[:1]) for qid, terms in queries[:15]]
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in dup_queries], pa.int64()),
                "terms": pa.array([t for _, t in dup_queries], pa.list_(pa.string())),
            }
        )
    )
    res = S.search(index_dir, qds, k=K, mode="tfidf").take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, terms in dup_queries:
        want = oracle_index.tfidf_topk(terms, K)
        assert got.get(qid, []) == want, f"query {qid} {terms}"


def test_wand_equals_exact(index_dir, queries):
    exact = S.search(index_dir, _qds(queries), k=K).take_all()
    wand = S.search(index_dir, _qds(queries), k=K, mode="wand").take_all()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(exact) == key(wand)


def test_fanout_equals_single_path(index_dir, queries):
    a = S.search(index_dir, _qds(queries), k=K).take_all()
    b = S.search_fanout(index_dir, _qds(queries), k=K).take_all()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(a) == key(b)


def test_segmentation_invariance(tmp_path, corpus, oracle_index, queries):
    """Different segment size (different parallel layout) -> identical
    scores/ranks (SURVEY.md §5.2.4)."""
    out = str(tmp_path / "idx_alt")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": list(corpus.values()),
            }
        )
    )
    build_index(ds, out, seg_docs=97)  # deliberately unaligned
    res = S.search(out, _qds(queries), k=K).take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, terms in queries:
        assert got.get(qid, []) == oracle_index.bm25_topk(terms, K)


def test_pfor_codec_end_to_end(tmp_path, corpus, oracle_index, queries):
    out = str(tmp_path / "idx_pfor")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": list(corpus.values()),
            }
        )
    )
    build_index(ds, out, seg_docs=200, codec="pfor")
    res = S.search(out, _qds(queries[:10]), k=K).take_all()
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, terms in queries[:10]:
        assert got.get(qid, []) == oracle_index.bm25_topk(terms, K)


def test_resume_skips_done_segments(tmp_path, corpus, index_dir, queries):
    """Kill/resume (SURVEY.md §7.5): delete one segment + its manifest
    status, rebuild with resume=True -> only the missing segment is
    rebuilt and the index is identical."""
    import shutil

    out = str(tmp_path / "idx_resume")
    shutil.copytree(index_dir, out)
    # simulate a crash that lost segment 1
    shutil.rmtree(mf.segment_dir(out, 1))
    before = mf.read_manifest(out)
    assert set(before) == {0, 2}

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(corpus), pa.int64()),
                "text": list(corpus.values()),
            }
        )
    )
    build_index(ds, out, seg_docs=200, resume=True)
    after = mf.read_manifest(out)
    assert set(after) == {0, 1, 2}
    # untouched segments keep their original files; rebuilt segment equals
    # the original build bit-for-bit (deterministic builder)
    for sid in (0, 1, 2):
        a = pq.read_table(os.path.join(mf.segment_dir(index_dir, sid), "postings.parquet"))
        b = pq.read_table(os.path.join(mf.segment_dir(out, sid), "postings.parquet"))
        assert a.equals(b), sid
    # results identical
    r1 = S.search(index_dir, _qds(queries[:5]), k=K).take_all()
    r2 = S.search(out, _qds(queries[:5]), k=K).take_all()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert key(r1) == key(r2)


# ------------------------------------------------ request cache

def test_cached_searcher_hits_and_equality(index_dir):
    import pyarrow as pa

    from defactonlp_ray.stages.search import CachedSearcherActor, SearcherActor

    batch = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "terms": pa.array(
                [["the", "data"], ["hash", "join"]], pa.list_(pa.string())
            ),
        }
    )
    cached = CachedSearcherActor(index_dir=index_dir, k=10)
    plain = SearcherActor(index_dir=index_dir, k=10)
    first = cached(batch)
    assert cached.misses == 2 and cached.hits == 0
    second = cached(batch)
    assert cached.hits == 2 and cached.misses == 2
    assert first.equals(second)
    assert first.equals(plain(batch))


def test_cached_searcher_epoch_changes_on_delete(index_dir, tmp_path):
    import shutil

    import pyarrow as pa

    from defactonlp_ray.stages.deletes import delete_docs
    from defactonlp_ray.stages.search import CachedSearcherActor

    idx = str(tmp_path / "epochidx")
    shutil.copytree(index_dir, idx)
    a = CachedSearcherActor(index_dir=idx, k=10)
    delete_docs(idx, [0, 1, 2])
    b = CachedSearcherActor(index_dir=idx, k=10)
    assert a._epoch != b._epoch
