"""C1-C3 codec tests: roundtrip identity + block-metadata invariants
(SURVEY.md §5.2.2 — property-based via hypothesis)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from defactonlp_ray.stages import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr), len(vals)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(codec.pfor_decode(codec.pfor_encode(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True
    )
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(codec.delta_decode(codec.delta_encode(arr)), arr)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        codec.delta_encode(np.array([3, 2, 5], dtype=np.int64))


@pytest.mark.parametrize("c", ["varint", "pfor"])
def test_postings_roundtrip_and_blockmax(c):
    rng = np.random.default_rng(7)
    n = 1000
    docids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 40, n).astype(np.int64)
    dls = rng.integers(30, 400, n).astype(np.int64)
    row = codec.encode_postings(docids, tfs, dls, codec=c)
    d, t, l = codec.decode_postings(row)
    assert np.array_equal(d, docids)
    assert np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
    # C3 invariants: per-block skip pointer is the block's last docid;
    # max_tf / min_dl dominate every member (block-max upper bound validity)
    for bi in range(row["n"] // codec.BLOCK + (row["n"] % codec.BLOCK != 0)):
        lo, hi = bi * codec.BLOCK, min((bi + 1) * codec.BLOCK, n)
        assert row["blk_last_doc"][bi] == docids[hi - 1]
        assert row["blk_max_tf"][bi] == tfs[lo:hi].max()
        assert row["blk_min_dl"][bi] == dls[lo:hi].min()


def test_compression_actually_compresses():
    rng = np.random.default_rng(1)
    docids = np.sort(rng.choice(10**6, size=5000, replace=False)).astype(np.int64)
    gaps = codec.delta_encode(docids)
    assert len(codec.varint_encode(gaps)) < docids.nbytes / 3
    assert len(codec.pfor_encode(gaps)) < docids.nbytes / 3


def test_encode_postings_batch_matches_per_term():
    from defactonlp_ray.stages.codec import encode_postings, encode_postings_batch

    rng = np.random.default_rng(5)
    # build a (term, doc)-sorted synthetic segment: 40 terms, ragged lists
    bounds = [0]
    post_doc, tfs, dls = [], [], []
    for _t in range(40):
        n = int(rng.integers(1, 400))
        docs = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
        post_doc.append(docs)
        tfs.append(rng.integers(1, 30, size=n, dtype=np.int64))
        dls.append(rng.integers(5, 500, size=n, dtype=np.int64))
        bounds.append(bounds[-1] + n)
    post_doc = np.concatenate(post_doc)
    tfs = np.concatenate(tfs)
    dls = np.concatenate(dls)
    bounds = np.array(bounds, dtype=np.int64)
    for codec in ("varint", "pfor"):
        batch = encode_postings_batch(post_doc, tfs, dls, bounds, codec)
        for i in range(40):
            lo, hi = bounds[i], bounds[i + 1]
            single = encode_postings(post_doc[lo:hi], tfs[lo:hi], dls[lo:hi], codec)
            assert batch["doc_blob"][i] == single["doc_blob"], (codec, i)
            assert batch["tf_blob"][i] == single["tf_blob"]
            assert batch["dl_blob"][i] == single["dl_blob"]
            o0, o1 = batch["blk_offsets"][i], batch["blk_offsets"][i + 1]
            assert list(batch["blk_last_doc"][o0:o1]) == single["blk_last_doc"]
            assert list(batch["blk_max_tf"][o0:o1]) == single["blk_max_tf"]
            assert list(batch["blk_min_dl"][o0:o1]) == single["blk_min_dl"]
            assert int(batch["n"][i]) == single["n"]
            assert int(batch["cf"][i]) == int(tfs[lo:hi].sum())


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=40, deadline=None)
def test_pfor_decode_many_property(blobs):
    from defactonlp_ray.stages.codec import pfor_decode_many, pfor_encode

    vals = [np.array(v, dtype=np.uint64) for v in blobs]
    out, counts = pfor_decode_many([pfor_encode(v) for v in vals])
    assert list(counts) == [v.size for v in vals]
    assert np.array_equal(out, np.concatenate(vals) if vals else out)
