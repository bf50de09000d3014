"""Round-4 regression tests: VERDICT r03 asks #1/#3/#7 + ADVICE items.

* connected_components / neardup_clusters block-format robustness (the
  r03 driver crash: pandas blocks reaching Arrow-only projections).
* cooccur_pmi df-ceiling + per-doc pair cap (bounds emitted pairs).
* high-diameter chain auto-routes through star contraction.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


# ------------------------------------------------ PMI pair-cap property


def test_cooccur_pmi_doc_term_cap_bounds_pairs(tmp_path, monkeypatch):
    """A document with more distinct terms than the cap contributes
    exactly C(cap, 2) pairs — the alphabetically-first ``cap`` terms —
    never vocabulary² (VERDICT r03 What's-wrong #3)."""
    from defactonlp_ray.pipelines import queries as Q

    # 26 distinct rare terms in one doc; a second unrelated doc keeps
    # their df (=1) under the 0.8*n_docs ceiling
    terms = [f"t{c}" for c in "abcdefghijklmnopqrstuvwxyz"]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([" ".join(terms), "zfiller"]),
    }), os.path.join(sf, "documents.parquet"))

    monkeypatch.setattr(Q, "_PMI_DOC_TERM_CAP", 4)
    res = Q.q_cooccur_pmi(sf)
    # C(4,2) = 6 pairs over the 4 smallest terms; without the cap this
    # doc would emit C(26,2) = 325 pairs (top-20 of them returned)
    assert len(res) == 6
    kept = sorted(terms)[:4]
    got_pairs = set(zip(res["term_a"], res["term_b"]))
    import itertools

    assert got_pairs == set(itertools.combinations(kept, 2))
    assert (res["n_ab"] == 1).all()


def test_cooccur_pmi_df_ceiling_drops_stopword_class(tmp_path):
    """Terms present in >80% of documents are excluded from pairing."""
    from defactonlp_ray.pipelines import queries as Q

    # 'stop' in all 10 docs (df=10 > 0.8*10); 'rare' + one partner rare
    texts = ["stop raxe ryye" if i < 5 else "stop other words" for i in range(10)]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
    }), os.path.join(sf, "documents.parquet"))
    res = Q.q_cooccur_pmi(sf)
    assert "stop" not in set(res["term_a"]) | set(res["term_b"])
    assert ("raxe", "ryye") in set(zip(res["term_a"], res["term_b"]))


# ---------------------------------------- CC block-format + star routing


def test_connected_components_handles_pandas_blocks():
    """Aggregate outputs can arrive as pandas blocks at some
    parallelisms; every projection downstream must coerce to Arrow
    first (the r03 ``neardup_clusters`` driver crash)."""
    from defactonlp_ray.stages.dedup import connected_components

    # force pandas blocks INTO the pipeline at the source
    pdf = pd.DataFrame({
        "id_a": [1, 2, 10, 11, 20],
        "id_b": [2, 3, 11, 12, 20],
    })
    ds = ray.data.from_pandas([pdf.iloc[:2], pdf.iloc[2:]])
    out = connected_components(ds).to_pandas().sort_values("node")
    got = dict(zip(out["node"], out["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_connected_components_long_chain_auto_routes_star():
    """A chain of 600 nodes has diameter 599: min-label would need ~600
    rounds; the auto router must pick star contraction and converge in
    O(log n) materialized rounds."""
    from defactonlp_ray.stages import dedup as D

    n = 600
    ds = ray.data.from_arrow(pa.table({
        "id_a": pa.array(list(range(n - 1)), pa.int64()),
        "id_b": pa.array(list(range(1, n)), pa.int64()),
    }))
    out = D.connected_components(ds, max_rounds=30).to_pandas()
    assert len(out) == n
    assert (out["label"] == 0).all()


def test_connected_components_method_star_equals_minlabel():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, 80)
    b = rng.integers(0, 50, 80)
    from defactonlp_ray.stages.dedup import connected_components

    ds = ray.data.from_arrow(pa.table({
        "id_a": pa.array(a, pa.int64()),
        "id_b": pa.array(b, pa.int64()),
    }))
    m = connected_components(ds, method="minlabel").to_pandas()
    s = connected_components(ds, method="star").to_pandas()
    m = m.sort_values("node").reset_index(drop=True)
    s = s.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(m, s)
