"""Index fsck (stages/fsck.py): a clean index reports zero errors with
corpus-true totals; targeted on-disk corruptions are each detected."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages.fsck import fsck_index
from defactonlp_ray.stages.index_build import build_index

TEXTS = [
    "data query fast data",
    "merge sort scan",
    "query window stream batch",
    "hash join table data",
    "slow scan",
    "the a big",
]


@pytest.fixture()
def idx(tmp_path):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS),
    }))
    out = str(tmp_path / "idx")
    build_index(docs, out, seg_docs=3, resume=False)
    return out


def test_clean_index_passes(idx):
    rep = fsck_index(idx)
    assert rep["n_errors"].iloc[0] == 0, rep.attrs["errors"]
    toks = [t for s in TEXTS for t in s.split()]
    assert rep["n_docs"].iloc[0] == len(TEXTS)
    assert rep["total_len"].iloc[0] == len(toks)
    assert rep["n_terms"].iloc[0] == len(set(toks))
    assert rep["n_postings"].iloc[0] == len(
        {(d, t) for d, s in enumerate(TEXTS) for t in s.split()}
    )


def _seg_path(idx, which=0):
    sid = mf.live_segment_order(mf.read_manifest(idx))[which]
    return os.path.join(mf.segment_dir(idx, sid), "postings.parquet")


def test_detects_corrupt_posting_count(idx):
    p = _seg_path(idx)
    t = pq.read_table(p).to_pandas()
    t.loc[0, "n"] = int(t.loc[0, "n"]) + 1  # declared length lie
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), p)
    rep = fsck_index(idx)
    assert rep["n_errors"].iloc[0] > 0
    assert any("decode" in e or "declared" in e for e in rep.attrs["errors"])


def test_detects_corrupt_cf(idx):
    p = _seg_path(idx)
    t = pq.read_table(p).to_pandas()
    t.loc[0, "cf"] = int(t.loc[0, "cf"]) + 5
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), p)
    rep = fsck_index(idx)
    assert any("cf" in e for e in rep.attrs["errors"])


def test_detects_dictionary_mismatch(idx):
    f = os.path.join(idx, "stats", "term_df")  # single parquet file
    t = pq.read_table(f).to_pandas()
    t.loc[0, "df"] = int(t.loc[0, "df"]) + 1
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    rep = fsck_index(idx)
    assert any("dictionary mismatch" in e for e in rep.attrs["errors"])


def test_detects_collection_stats_drift(idx):
    p = os.path.join(idx, "stats", "collection.json")
    coll = json.load(open(p))
    coll["n_docs"] += 1
    json.dump(coll, open(p, "w"))
    rep = fsck_index(idx)
    assert any("collection n_docs" in e for e in rep.attrs["errors"])


def test_detects_missing_docstats_row(idx):
    sid = mf.live_segment_order(mf.read_manifest(idx))[0]
    p = os.path.join(mf.segment_dir(idx, sid), "docstats.parquet")
    t = pq.read_table(p).to_pandas().iloc[1:]
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), p)
    rep = fsck_index(idx)
    assert any("absent from docstats" in e for e in rep.attrs["errors"])


def test_segment_catalog_matches_reference(idx):
    from defactonlp_ray.stages.fsck import segment_catalog

    cat = segment_catalog(idx)
    # seg_docs=3 over 6 docs -> sids 0 and 1, 3 docs each
    assert cat["sid"].tolist() == [0, 1]
    assert cat["n_docs"].tolist() == [3, 3]
    for _i, row in cat.iterrows():
        lo, hi = int(row.sid) * 3, int(row.sid) * 3 + 3
        seg_texts = TEXTS[lo:hi]
        toks = [t for s in seg_texts for t in s.split()]
        assert row.total_len == len(toks)
        assert row.n_terms == len(set(toks))
        assert row.n_postings == len(
            {(d, t) for d, s in enumerate(seg_texts) for t in s.split()}
        )
