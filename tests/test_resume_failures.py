"""Failure-injection resume tests (SURVEY.md §7.5, north_rule resumability):

* a crash mid-build leaves no committed segment for the failed partition
  (atomic tmp+rename), and a resumed build completes it,
* duplicate manifest lines (retried task re-append) replay idempotently,
* stale tmp dirs are invisible to readers.
"""

import json
import os
import shutil

import pyarrow as pa
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages import index_build as ib
from defactonlp_ray.stages import search as S


def _docs_ds(n=600):
    pages = fixtures.make_pages(n)
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pages["text"]})
    )


def test_crash_mid_segment_leaves_no_partial(tmp_path, monkeypatch):
    out = str(tmp_path / "crash_idx")
    real = ib._build_segment_table

    calls = {"n": 0}

    def flaky(group, sid, *args, **kwargs):
        if sid == 1:
            # simulate a worker dying inside the atomic-write window
            raise RuntimeError("injected crash")
        return real(group, sid, *args, **kwargs)

    monkeypatch.setattr(ib, "_build_segment_table", flaky)
    with pytest.raises(Exception):
        ib.build_index(_docs_ds(), out, seg_docs=200, layout="grouped")
    # no committed segment 1; no stray tmp dirs
    recs = mf.read_manifest(out)
    assert 1 not in recs
    seg_root = os.path.join(out, "segments")
    if os.path.isdir(seg_root):
        assert not [d for d in os.listdir(seg_root) if d.startswith(".tmp-")]

    monkeypatch.setattr(ib, "_build_segment_table", real)
    ib.build_index(_docs_ds(), out, seg_docs=200, layout="grouped", resume=True)
    assert set(mf.read_manifest(out)) == {0, 1, 2}
    # index is fully queryable after the resumed build
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0], pa.int64()),
                "terms": pa.array([["w0000", "w0001"]], pa.list_(pa.string())),
            }
        )
    )
    assert len(S.search(out, qds, k=5).take_all()) == 5


def test_manifest_duplicate_lines_idempotent(tmp_path):
    out = str(tmp_path / "dup_idx")
    ib.build_index(_docs_ds(400), out, seg_docs=200)
    recs_before = mf.read_manifest(out)
    # a retried task re-appends its manifest line after a crash
    dup = dict(recs_before[0])
    mf.append_manifest(out, dup)
    mf.append_manifest(out, dup)
    recs_after = mf.read_manifest(out)
    assert recs_after == recs_before


def test_manifest_ignores_records_without_segment_dir(tmp_path):
    out = str(tmp_path / "ghost_idx")
    os.makedirs(out)
    mf.append_manifest(out, {"sid": 7, "n_docs": 10, "total_len": 100,
                             "n_terms": 5, "n_postings": 20})
    assert mf.read_manifest(out) == {}  # rename is the commit point
