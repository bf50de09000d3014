"""Doc-level deletes (stages/deletes.py + index_build.expunge_deletes).

Reference check model — the Lucene live-docs semantics:
* masking: deleted docs vanish from results, survivors' scores are
  UNCHANGED (stale stats), so a deleted-index top-k equals the full
  ranking of a clean index with the deleted rows dropped;
* expunge: rewritten index is bit-exact with a from-scratch build over
  the live corpus (fresh stats), across TAAT/WAND/phrase/boolean/window.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.deletes import (
    clear_delete_files,
    delete_docs,
    live_mask,
    read_deletes,
)
from defactonlp_ray.stages.index_build import build_index, expunge_deletes
from defactonlp_ray.stages.phrase import (
    boolean_search,
    phrase_search,
    window_search,
)

QUERIES = [
    (0, ["hash", "join"]),
    (1, ["scan"]),
    (2, ["merge", "sort"]),
    (3, ["the", "data", "query"]),
]


def _qds():
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in QUERIES], pa.int64()),
                "terms": pa.array(
                    [t for _, t in QUERIES], pa.list_(pa.string())
                ),
            }
        )
    )


# ------------------------------------------------------------ unit


def test_live_mask():
    deleted = np.array([2, 5, 9], dtype=np.int64)
    docids = np.array([0, 2, 3, 5, 8, 9, 10], dtype=np.int64)
    assert live_mask(docids, deleted).tolist() == [
        True, False, True, False, True, False, True,
    ]
    assert live_mask(docids, np.empty(0, dtype=np.int64)).all()
    assert live_mask(np.empty(0, dtype=np.int64), deleted).size == 0


def test_delete_files_union_and_atomicity(tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    assert read_deletes(idx).size == 0
    delete_docs(idx, [5, 3, 3])
    delete_docs(idx, [3, 7])
    assert read_deletes(idx).tolist() == [3, 5, 7]
    # a crashed half-write leaves only an ignored .tmp file
    ddir = os.path.join(idx, "deletes")
    with open(os.path.join(ddir, "del-000099-0.parquet.tmp"), "wb") as f:
        f.write(b"garbage")
    assert read_deletes(idx).tolist() == [3, 5, 7]
    ids, files = read_deletes(idx, return_files=True)
    assert len(files) == 2
    clear_delete_files(files)
    assert read_deletes(idx).size == 0


# ------------------------------------------------- fixtures


@pytest.fixture(scope="module")
def corpus(sf_dir):
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return tbl, ids[ids % 5 == 1]  # ~20% deleted


@pytest.fixture(scope="module")
def del_index(sf_dir, corpus, tmp_path_factory):
    """Positional index over the full corpus with ~20% docs deleted."""
    idx = str(tmp_path_factory.mktemp("delidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, positions=True, resume=False)
    delete_docs(idx, corpus[1])
    return idx


@pytest.fixture(scope="module")
def clean_index(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cleanidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, positions=True, resume=False)
    return idx


@pytest.fixture(scope="module")
def live_index(sf_dir, corpus, tmp_path_factory):
    """From-scratch build over the live (non-deleted) docs only."""
    idx = str(tmp_path_factory.mktemp("liveidx"))
    tbl, dele = corpus
    m = live_mask(
        tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), dele
    )
    docs = ray.data.from_arrow(tbl.filter(pa.array(m)))
    build_index(docs, idx, seg_docs=128, positions=True, resume=False)
    return idx


# ------------------------------------------ masking (stale stats)


def test_masked_topk_equals_filtered_full_ranking(del_index, clean_index, corpus):
    dele = set(corpus[1].tolist())
    full = S.search(clean_index, _qds(), k=10_000, concurrency=2).to_pandas()
    got = S.search(del_index, _qds(), k=10, concurrency=2).to_pandas()
    for qid, _terms in QUERIES:
        want = (
            full[(full.query_id == qid) & ~full.doc_id.isin(dele)]
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .head(10)
        )
        g = got[got.query_id == qid].sort_values("rank")
        assert g.doc_id.tolist() == want.doc_id.tolist()
        assert np.array_equal(g.score.to_numpy(), want.score.to_numpy())


def test_wand_equals_taat_with_deletes(del_index):
    reader = S.IndexReader(del_index)
    assert reader.deleted.size > 0
    for _qid, terms in QUERIES:
        ts = sorted(set(terms))
        reader.dfs(ts)
        idfs = {t: reader.idf(t) for t in ts}
        taat = S.score_all_taat(reader, reader.seg_ids, ts, idfs, 10)
        wand = S.score_all_wand(reader, reader.seg_ids, ts, idfs, 10)
        assert taat == wand


def test_shared_index_applies_deletes(del_index):
    shared = S.build_shared_index(del_index)
    sreader = S.SharedIndexReader(shared)
    reader = S.IndexReader(del_index)
    for _qid, terms in QUERIES:
        ts = sorted(set(terms))
        reader.dfs(ts)
        idfs = {t: reader.idf(t) for t in ts}
        a = S.score_all_taat(reader, reader.seg_ids, ts, idfs, 10)
        b = S.score_all_taat(sreader, sreader.seg_ids, ts, idfs, 10)
        assert a == b


def test_tfidf_masks_deletes(del_index, clean_index, corpus):
    dele = set(corpus[1].tolist())
    rd = S.IndexReader(del_index)
    rc = S.IndexReader(clean_index)
    terms = ["hash", "join", "table"]
    full = S.score_all_tfidf(rc, rc.seg_ids, terms, 10_000)
    want = [(s, d) for s, d in full if d not in dele][:10]
    got = S.score_all_tfidf(rd, rd.seg_ids, terms, 10)
    assert got == want


def test_phrase_and_window_mask_deletes(del_index, clean_index, corpus):
    dele = set(corpus[1].tolist())
    pq_ = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "terms": pa.array(
                [["table", "scan"], ["hash", "join"]], pa.list_(pa.string())
            ),
        }
    )
    got = phrase_search(
        del_index, ray.data.from_arrow(pq_), k=10, concurrency=2
    ).to_pandas()
    assert not got.doc_id.isin(dele).any()
    wq = pq_.append_column("window", pa.array([4, 6], pa.int64()))
    gotw = window_search(
        del_index, ray.data.from_arrow(wq), k=10, concurrency=2
    ).to_pandas()
    assert not gotw.doc_id.isin(dele).any()
    # window matching itself ignores deletes only in the final mask:
    # clean-index results minus deleted = deleted-index results
    cleanw = window_search(
        clean_index, ray.data.from_arrow(wq), k=10_000, concurrency=2
    ).to_pandas()
    for qid in (0, 1):
        want = cleanw[(cleanw.query_id == qid) & ~cleanw.doc_id.isin(dele)]
        g = gotw[gotw.query_id == qid]
        assert g.doc_id.tolist() == want.head(len(g)).doc_id.tolist()


def test_boolean_masks_deletes(del_index, corpus):
    dele = set(corpus[1].tolist())
    q = pa.table(
        {
            "query_id": pa.array([0], pa.int64()),
            "must": pa.array([["hash"]], pa.list_(pa.string())),
            "should": pa.array([["join"]], pa.list_(pa.string())),
            "must_not": pa.array([["slow"]], pa.list_(pa.string())),
        }
    )
    got = boolean_search(
        del_index, ray.data.from_arrow(q), k=50, concurrency=2
    ).to_pandas()
    assert len(got) > 0
    assert not got.doc_id.isin(dele).any()


# -------------------------------------------- expunge (fresh stats)


def test_expunge_bit_exact_with_fresh_live_build(del_index, live_index):
    n = expunge_deletes(del_index)
    assert n > 0
    assert read_deletes(del_index).size == 0  # applied files cleared
    a = (
        S.search(del_index, _qds(), k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        S.search(live_index, _qds(), k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert np.array_equal(a.score.to_numpy(), b.score.to_numpy())
    # positional streams survived the decode-filter-re-encode
    pq_ = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "terms": pa.array(
                    [["table", "scan"], ["batch", "batch"]],
                    pa.list_(pa.string()),
                ),
            }
        )
    )
    pa_ = (
        phrase_search(del_index, pq_, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pq2 = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "terms": pa.array(
                    [["table", "scan"], ["batch", "batch"]],
                    pa.list_(pa.string()),
                ),
            }
        )
    )
    pb = (
        phrase_search(live_index, pq2, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pa_, pb)
    # idempotent: nothing left to expunge
    assert expunge_deletes(del_index) == 0


def test_expunge_retires_fully_deleted_segment(sf_dir, tmp_path):
    """Deleting every doc of one segment retires it with no replacement."""
    idx = str(tmp_path / "idx")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, positions=False, resume=False)
    from defactonlp_ray.sources import manifest as mf

    recs = mf.read_manifest(idx)
    sid0 = mf.live_segment_order(recs)[0]
    ids = pq.read_table(
        os.path.join(mf.segment_dir(idx, sid0), "docstats.parquet"),
        columns=["doc_id"],
    )["doc_id"].to_numpy(zero_copy_only=False)
    n_before = len(mf.live_segment_order(recs))
    delete_docs(idx, ids)
    assert expunge_deletes(idx) == 1
    live = mf.live_segment_order(mf.read_manifest(idx))
    assert len(live) == n_before - 1
    assert sid0 not in live
    # index still serves, minus that segment's docs
    res = S.search(idx, _qds(), k=10, concurrency=2).to_pandas()
    assert not res.doc_id.isin(set(ids.tolist())).any()


def test_resume_after_expunge_does_not_resurrect(sf_dir, tmp_path):
    """Regression: build_index(resume=True) on an expunged index must
    treat tombstoned sids as done — rebuilding them would duplicate the
    live docs and resurrect the deleted ones."""
    from defactonlp_ray.sources import manifest as mf

    idx = str(tmp_path / "idx")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, positions=False, resume=False)
    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    dele = ids[ids % 5 == 1]
    delete_docs(idx, dele)
    assert expunge_deletes(idx) > 0
    before = set(mf.live_segment_order(mf.read_manifest(idx)))
    r1 = (
        S.search(idx, _qds(), k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    build_index(docs, idx, seg_docs=128, positions=False, resume=True)
    after = set(mf.live_segment_order(mf.read_manifest(idx)))
    assert after == before  # nothing rebuilt
    r2 = (
        S.search(idx, _qds(), k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(r1, r2)


def test_fully_deleted_term_wand_taat_equal(sf_dir, tmp_path):
    """Delete every doc containing one term: its WAND pack collapses to
    None, TAAT sees no live candidates — both routes agree, and a query
    mixing it with live terms still ranks the live contributions."""
    idx = str(tmp_path / "idx")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, resume=False)
    reader0 = S.IndexReader(idx)
    arrs = reader0.term_arrays(reader0.seg_ids, "merge")
    assert arrs is not None
    delete_docs(idx, arrs[0])  # every doc containing 'merge'
    reader = S.IndexReader(idx)
    for terms in (["merge"], ["merge", "scan"]):
        ts = sorted(set(terms))
        reader.dfs(ts)
        idfs = {t: reader.idf(t) for t in ts}
        taat = S.score_all_taat(reader, reader.seg_ids, ts, idfs, 10)
        wand = S.score_all_wand(reader, reader.seg_ids, ts, idfs, 10)
        assert taat == wand
        if terms == ["merge"]:
            assert taat == []
        else:
            assert len(taat) > 0
            assert not any(d in set(arrs[0].tolist()) for _s, d in taat)
