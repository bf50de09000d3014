"""Skew + property tests (SURVEY.md §5.2.2, §7.5).

* Zipf head-term skew: the per-(term, segment) pre-aggregation bounds the
  term-stats shuffle at n_segments rows per term no matter how hot the
  term; segment sizes stay balanced because segmentation is by doc range.
* WAND == exhaustive TAAT on random corpora (hypothesis).
* Codec roundtrip through a full encode_postings row with pathological
  gap patterns.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from defactonlp_ray import fixtures, oracle
from defactonlp_ray.sources import manifest as mf
from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.index_build import build_index


def test_head_term_skew_bounded(tmp_path):
    """w0000 appears in nearly every fixture doc (Zipf s=1.1); after the
    per-segment pre-agg its stats rows number exactly n_segments, and no
    segment is >1.5x the mean size."""
    n = 1200
    pages = fixtures.make_pages(n)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pages["text"]})
    )
    idx = str(tmp_path / "skew_idx")
    build_index(ds, idx, seg_docs=200)
    recs = mf.read_manifest(idx)
    sizes = [r["n_docs"] for r in recs.values()]
    assert max(sizes) <= 1.5 * (sum(sizes) / len(sizes))
    # head term: one stats row per segment, never one row per document
    rows_per_seg = []
    for sid in recs:
        t = pq.read_table(
            os.path.join(mf.segment_dir(idx, sid), "postings.parquet"),
            columns=["term", "n"],
            filters=[("term", "=", "w0000")],
        )
        assert t.num_rows <= 1
        if t.num_rows:
            rows_per_seg.append(t["n"][0].as_py())
    assert len(rows_per_seg) == len(recs)  # present in every segment
    # and it IS a head term (appears in most docs of each segment)
    assert min(rows_per_seg) > 100  # of 200 docs per segment


@st.composite
def tiny_corpus(draw):
    n_docs = draw(st.integers(3, 25))
    vocab = [f"t{i}" for i in range(draw(st.integers(2, 8)))]
    docs = {}
    for i in range(n_docs):
        ln = draw(st.integers(1, 30))
        docs[i] = " ".join(
            vocab[draw(st.integers(0, len(vocab) - 1))] for _ in range(ln)
        )
    q = [vocab[draw(st.integers(0, len(vocab) - 1))] for _ in range(draw(st.integers(1, 4)))]
    return docs, q


@given(tiny_corpus())
@settings(max_examples=60, deadline=None)
def test_wand_equals_exhaustive_on_random_corpora(data):
    """Block-max WAND must equal the oracle exhaustive scorer on arbitrary
    corpora — using in-memory posting rows (no Ray)."""
    docs, q = data
    oidx = oracle.OracleIndex(docs)
    want = oidx.bm25_topk(q, 5)

    from defactonlp_ray.stages.codec import encode_postings

    class FakeReader:
        n_docs = oidx.n_docs
        avgdl = oidx.avgdl

        def postings(self, sid, term):
            plist = oidx.postings.get(term)
            if not plist:
                return None
            dids = np.array([d for d, _ in plist], dtype=np.int64)
            tfs = np.array([c for _, c in plist], dtype=np.int64)
            dls = np.array([oidx.doc_len[d] for d, _ in plist], dtype=np.int64)
            row = encode_postings(dids, tfs, dls)
            row["decoded"] = (dids, tfs, dls)
            return row

    reader = FakeReader()
    uniq = sorted(set(q))
    idfs = {t: oidx.idf(t) for t in uniq}
    got = S.score_segment_wand(reader, 0, uniq, idfs, 5)
    assert [(d, s) for s, d in got] == want


@given(
    st.lists(st.integers(0, 2**31), min_size=1, max_size=300, unique=True),
    st.sampled_from(["varint", "pfor"]),
)
@settings(max_examples=60, deadline=None)
def test_encode_postings_roundtrip_property(ids, codec):
    from defactonlp_ray.stages.codec import decode_postings, encode_postings

    dids = np.array(sorted(ids), dtype=np.int64)
    tfs = np.arange(1, dids.size + 1, dtype=np.int64)
    dls = np.full(dids.size, 7, dtype=np.int64)
    row = encode_postings(dids, tfs, dls, codec)
    d, t, l = decode_postings(row)
    assert np.array_equal(d, dids) and np.array_equal(t, tfs) and np.array_equal(l, dls)
