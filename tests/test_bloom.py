"""Per-segment term Bloom filters (stages/bloom.py)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from defactonlp_ray.stages.bloom import (
    BloomCountActor,
    bloom_maybe,
    build_term_blooms,
)
from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.search import IndexReader, search
from defactonlp_ray.sources import manifest as mf


@pytest.fixture(scope="module")
def bidx(sf_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("bloomidx"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=128, resume=False)
    n = build_term_blooms(idx)
    assert n > 0
    return idx


def test_no_false_negatives_whole_vocab(bidx):
    """Every term actually IN a segment must probe 'maybe' — exhaustive
    over every segment's full vocabulary."""
    recs = mf.read_manifest(bidx)
    for sid in mf.live_segment_order(recs):
        terms = pq.read_table(
            os.path.join(mf.segment_dir(bidx, sid), "postings.parquet"),
            columns=["term"],
        )["term"].to_pylist()
        assert bloom_maybe(bidx, sid, terms).all(), sid


def test_absent_terms_mostly_pruned(bidx):
    """Fabricated absent terms should be pruned in (almost) every
    segment — at 10 bits/term the false-positive rate is ~1%, so over
    100 probes expect <= ~10 leaks (generous bound)."""
    recs = mf.read_manifest(bidx)
    sids = mf.live_segment_order(recs)
    absent = [f"zz-absent-{i}" for i in range(100 // len(sids) + 1)]
    leaks = sum(
        int(bloom_maybe(bidx, sid, absent).sum()) for sid in sids
    )
    assert leaks <= 10, leaks


def test_bloom_count_equals_plain_count(bidx):
    queries = [(0, ["the", "data"]), (1, ["hash"]), (2, ["zz-absent", "scan"])]
    qds = pa.table(
        {
            "query_id": pa.array([q for q, _ in queries], pa.int64()),
            "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
        }
    )
    actor = BloomCountActor(bidx)
    got = actor(qds).to_pandas().sort_values("query_id").reset_index(drop=True)
    want = (
        search(bidx, ray.data.from_arrow(qds), mode="count", concurrency=2)
        .to_pandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # pruning evidence: the absent term skipped its point-read in (at
    # least most) segments
    assert actor.skipped > 0


def test_missing_sidecar_degrades_to_maybe(bidx, tmp_path):
    assert bloom_maybe(str(tmp_path), 0, ["anything"]).all()


def test_build_is_idempotent(bidx):
    assert build_term_blooms(bidx) == 0
