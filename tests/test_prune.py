"""Static impact pruning (stages/prune.py): pinned-rule exactness vs a
brute-force reference, retained global stats, serving compatibility and
idempotent reuse."""

from __future__ import annotations

import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

from defactonlp_ray.stages.index_build import build_index
from defactonlp_ray.stages.prune import prune_index
from defactonlp_ray.stages.search import IndexReader, search
from defactonlp_ray.functions.tokenizer import tokenize

N_KEEP = 6


@pytest.fixture(scope="module")
def pruned_pair(sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("prune")
    idx = str(root / "full")
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    build_index(docs, idx, seg_docs=16, resume=False)  # several segments
    pidx = prune_index(idx, str(root / "pruned"), N_KEEP, concurrency=2)
    return idx, pidx


@pytest.fixture(scope="module")
def ref_kept(sf_dir):
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    toks = {
        int(d): tokenize(t)
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / len(dl)
    per = collections.defaultdict(list)
    for d, ts in toks.items():
        for t, c in collections.Counter(ts).items():
            w = (c * 2.2) / (c + 1.2 * (1 - 0.75 + 0.75 * dl[d] / avgdl))
            per[t].append((-w, d))
    return {t: sorted(d for _, d in sorted(v)[:N_KEEP]) for t, v in per.items()}


def test_prune_matches_bruteforce(pruned_pair, ref_kept):
    _, pidx = pruned_pair
    r = IndexReader(pidx)
    for t in sorted(ref_kept):
        for sid in r.seg_ids:
            r.load_postings(sid, [t])
        arrs = r.term_tf_dl(r.seg_ids, t)
        got = sorted(arrs[0].tolist()) if arrs is not None else []
        assert got == ref_kept[t], t


def test_prune_retains_global_stats(pruned_pair):
    idx, pidx = pruned_pair
    full, pr = IndexReader(idx), IndexReader(pidx)
    assert pr.avgdl == full.avgdl
    assert pr.n_docs == full.n_docs
    terms = ["the", "table", "data"]
    assert pr.dfs(terms) == full.dfs(terms)


def test_pruned_serving_scores_subset_of_full(pruned_pair):
    """Surviving (term, doc) pairs score bit-identically: a pruned hit's
    score never exceeds the full index's score for the same doc, and a
    doc whose postings all survived scores exactly equal."""
    idx, pidx = pruned_pair
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([0], pa.int64()),
                "terms": pa.array([["table", "scan"]], pa.list_(pa.string())),
            }
        )
    )
    full = {
        r["doc_id"]: r["score"]
        for r in search(idx, qds, k=1000, concurrency=2).take_all()
    }
    pruned = search(pidx, qds, k=1000, concurrency=2).take_all()
    assert pruned, "query terms exist in the corpus"
    for r in pruned:
        assert r["doc_id"] in full
        assert r["score"] <= full[r["doc_id"]] + 1e-12


def test_prune_idempotent_reuse(pruned_pair):
    idx, pidx = pruned_pair
    meta0 = os.path.getmtime(os.path.join(pidx, "_SUCCESS"))
    assert prune_index(idx, pidx, N_KEEP) == pidx
    assert os.path.getmtime(os.path.join(pidx, "_SUCCESS")) == meta0


def test_prune_rejects_bad_nkeep(pruned_pair):
    idx, _ = pruned_pair
    with pytest.raises(ValueError):
        prune_index(idx, "/tmp/never", 0)
