"""Point-in-time snapshot reads over the append-only manifest log."""

import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages.index_build import (
    append_index,
    build_index,
    compact_index,
)
from defactonlp_ray.stages.search import IndexReader, search


def _docs_ds(lo: int, hi: int) -> "ray.data.Dataset":
    pages = fixtures.make_pages_range(lo, hi)
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pages["text"],
            }
        )
    )


@pytest.fixture(scope="module")
def snap_index():
    idx = os.path.join(tempfile.mkdtemp(), "idx")
    build_index(_docs_ds(0, 400), idx, seg_docs=128)
    v1 = mf.manifest_version(idx)
    append_index(_docs_ds(400, 800), idx, seg_docs=128)
    yield idx, v1
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)


def _queries_ds():
    qs = fixtures.make_query_terms(6)
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in qs], pa.int64()),
                "terms": pa.array(
                    [t for _, t in qs], pa.list_(pa.string())
                ),
            }
        )
    )


def test_manifest_version_monotonic(snap_index):
    idx, v1 = snap_index
    assert 0 < v1 < mf.manifest_version(idx)
    # snapshot membership is a strict subset of the live set
    snap = set(mf.read_manifest(idx, at=v1))
    live = set(mf.read_manifest(idx))
    assert snap < live


def test_snapshot_reader_stats_are_pre_append(snap_index):
    idx, v1 = snap_index
    r_now = IndexReader(idx)
    r_at = IndexReader(idx, at=v1)
    assert r_now.n_docs == 800
    assert r_at.n_docs == 400
    assert r_at.total_len < r_now.total_len
    # df derived from pinned segments only
    qs = fixtures.make_query_terms(6)
    terms = sorted({t for _, ts in qs for t in ts})
    df_at, df_now = r_at.dfs(terms), r_now.dfs(terms)
    assert any(df_at[t] < df_now[t] for t in terms)
    assert all(df_at[t] <= df_now[t] for t in terms)


def test_snapshot_query_equals_pre_append_index(snap_index):
    idx, v1 = snap_index
    # an independent from-scratch index over the same first 400 docs
    idx2 = os.path.join(tempfile.mkdtemp(), "idx2")
    try:
        build_index(_docs_ds(0, 400), idx2, seg_docs=128)
        a = (
            search(idx, _queries_ds(), k=10, concurrency=2, at=v1)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        b = (
            search(idx2, _queries_ds(), k=10, concurrency=2)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
    finally:
        shutil.rmtree(os.path.dirname(idx2), ignore_errors=True)


def test_snapshot_preload_matches_point_reads(snap_index):
    idx, v1 = snap_index
    a = (
        search(idx, _queries_ds(), k=10, concurrency=2, at=v1)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        search(idx, _queries_ds(), k=10, concurrency=2, at=v1, preload=True)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_snapshot_incompatible_with_shared(snap_index):
    idx, v1 = snap_index
    with pytest.raises(ValueError, match="snapshot"):
        search(idx, _queries_ds(), k=5, at=v1, shared=True)


def test_compaction_invalidates_snapshot():
    """A snapshot survives appends (test above) but NOT a compaction
    that retires its segments — compaction GCs the retired dirs as part
    of its commit, and the snapshot read must fail loudly, never
    silently serve a partial segment set."""
    idx = os.path.join(tempfile.mkdtemp(), "idx")
    try:
        build_index(_docs_ds(0, 300), idx, seg_docs=64)
        v1 = mf.manifest_version(idx)
        compact_index(idx, target_seg_docs=1024)
        with pytest.raises(ValueError, match="garbage-collected"):
            mf.read_manifest(idx, at=v1)
        # the CURRENT view is unaffected
        assert mf.read_manifest(idx)
    finally:
        shutil.rmtree(os.path.dirname(idx), ignore_errors=True)


# ------------------------------------------------------------------ aliases


def test_alias_resolution_and_flip(snap_index):
    idx, _v1 = snap_index
    root = tempfile.mkdtemp()
    try:
        alias = os.path.join(root, "prod.alias")
        mf.set_alias(alias, idx)
        assert mf.resolve_alias(alias) == os.path.abspath(idx)
        # identity for plain dirs
        assert mf.resolve_alias(idx) == idx
        # queries through the alias == queries against the dir
        a = search(alias, _queries_ds(), k=5, concurrency=2).to_pandas()
        b = search(idx, _queries_ds(), k=5, concurrency=2).to_pandas()
        key = ["query_id", "rank"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_alias_flip_switches_target(snap_index):
    idx, _v1 = snap_index
    root = tempfile.mkdtemp()
    try:
        idx2 = os.path.join(root, "idx2")
        build_index(_docs_ds(0, 200), idx2, seg_docs=128)
        alias = os.path.join(root, "prod.alias")
        mf.set_alias(alias, idx2)
        r_small = IndexReader(alias)
        assert r_small.n_docs == 200
        mf.set_alias(alias, idx)  # the flip
        r_big = IndexReader(alias)
        assert r_big.n_docs == 800
        # the pre-flip reader keeps serving its resolved dir
        assert r_small.n_docs == 200
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_alias_rejects_chains_and_bad_names(snap_index):
    idx, _v1 = snap_index
    root = tempfile.mkdtemp()
    try:
        a1 = os.path.join(root, "a.alias")
        a2 = os.path.join(root, "b.alias")
        mf.set_alias(a1, idx)
        mf.set_alias(a2, a1)  # points at another alias
        with pytest.raises(ValueError, match="chain"):
            mf.resolve_alias(a2)
        with pytest.raises(ValueError, match="alias path"):
            mf.set_alias(os.path.join(root, "notanalias"), idx)
    finally:
        shutil.rmtree(root, ignore_errors=True)
