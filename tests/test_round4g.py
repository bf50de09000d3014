"""Block-split invariance for the third-continuation operators: the
same table written with different parquet row-group sizes (hence
different Ray block splits) must produce IDENTICAL results — the
direct test of the partial-merge claims (MaxSim's Max groupby across
straddled groups, the range join's bucket replication, LLR's
marginal joins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import pytest


def _write_sf(tmp_path, name: str, table: pa.Table, row_group_size: int):
    d = tmp_path / f"sf_{name}_{row_group_size}"
    d.mkdir()
    pq.write_table(table, str(d / f"{name}.parquet"),
                   row_group_size=row_group_size)
    return str(d)


@pytest.fixture(scope="module")
def embeddings_tbl():
    rng = np.random.default_rng(17)
    n, dim = 24, 8
    vecs = np.round(rng.normal(size=(n, dim)), 3)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
    })


def test_ann_maxsim_invariant_to_block_split(tmp_path, embeddings_tbl):
    from defactonlp_ray.pipelines.queries import q_ann_maxsim

    outs = []
    for rgs in (4, 100):
        sf = _write_sf(tmp_path, "embeddings", embeddings_tbl, rgs)
        outs.append(q_ann_maxsim(sf))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # groups of 4 with row groups of 4: block boundaries align with
    # group boundaries; row groups of 100: one block.  A third layout
    # misaligned with the group width exercises straddling directly.
    sf = _write_sf(tmp_path, "embeddings", embeddings_tbl, 5)
    pd.testing.assert_frame_equal(outs[0], q_ann_maxsim(sf))


@pytest.fixture(scope="module")
def events_tbl():
    rng = np.random.default_rng(23)
    n = 300
    base = np.datetime64("2025-03-01T00:00:00", "us")
    ts = base + rng.integers(0, 5 * 24 * 3600, size=n).astype(
        "timedelta64[s]"
    ).astype("timedelta64[us]")
    order = np.argsort(ts)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(
            rng.integers(0, 9, size=n).astype(np.int64)[order]
        ),
        "ts": pa.array(ts[order], pa.timestamp("us")),
        "event_type": pa.array(
            np.where(rng.random(n) < 0.3, "error", "click")[order]
        ),
    })


def test_range_join_invariant_to_block_split(tmp_path, events_tbl):
    from defactonlp_ray.pipelines.queries import q_events_range_join

    outs = []
    for rgs in (16, 1000):
        sf = _write_sf(tmp_path, "events", events_tbl, rgs)
        outs.append(q_events_range_join(sf).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.fixture(scope="module")
def docs_tbl():
    rng = np.random.default_rng(31)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
    texts = [
        " ".join(rng.choice(words, size=int(rng.integers(3, 15))))
        for _ in range(60)
    ]
    return pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })


def test_bigram_llr_invariant_and_nonnegative(tmp_path, docs_tbl):
    from defactonlp_ray.pipelines.queries import q_bigram_llr

    outs = []
    for rgs in (7, 1000):
        sf = _write_sf(tmp_path, "documents", docs_tbl, rgs)
        outs.append(q_bigram_llr(sf).to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # the G-statistic is a deviance: mathematically >= 0 (floating
    # error may graze 0 from below by < 1e-6 after rounding)
    assert (outs[0]["llr"] >= -1e-6).all()
