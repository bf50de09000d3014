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
