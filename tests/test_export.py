"""Training-export stages (stages/export.py): shard assignment is a
pure function of the id (parallelism-invariant), the done-marker makes
re-runs no-ops, and a partial run without the marker is rebuilt to a
byte-compatible state."""

import json
import os

import pyarrow as pa
import pytest
import ray.data

from defactonlp_ray.stages import export as E


def _docs(n=300):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "n_chars": pa.array([10 + (i % 7) for i in range(n)], pa.int64()),
            }
        )
    )


def test_shard_bounds():
    assert E.shard_bounds(4) == ["3f", "7f", "bf", "ff"]
    assert E.shard_bounds(1) == ["ff"]
    assert E.shard_bounds(256)[0] == "00"
    with pytest.raises(ValueError):
        E.shard_bounds(3)


def test_assign_shards_partition_invariant():
    a = E.assign_shards(_docs().repartition(1), 4).to_pandas()
    b = E.assign_shards(_docs().repartition(7), 4).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a["shard"]) == {0, 1, 2, 3}


def test_export_resume_and_partial_rebuild(tmp_path):
    out = str(tmp_path / "exp")
    m1 = E.export_shards(_docs(), out, n_shards=4)
    assert m1["total_rows"] == 300
    assert sum(m1["rows_per_shard"].values()) == 300
    marker = os.path.join(out, "_EXPORT_DONE.json")
    stamp = os.path.getmtime(marker)
    # marked run: resume is a no-op (files untouched)
    m2 = E.export_shards(_docs(), out, n_shards=4)
    assert m2 == m1
    assert os.path.getmtime(marker) == stamp
    # unmarked partial run: rebuilt from scratch, same result
    os.remove(marker)
    with open(os.path.join(out, "shard=0", "garbage.parquet"), "wb") as f:
        f.write(b"not parquet")
    m3 = E.export_shards(_docs(), out, n_shards=4)
    assert m3 == m1
    assert not os.path.exists(os.path.join(out, "shard=0", "garbage.parquet"))
    # different shard count against a marked dir: rebuilt (marker mismatch)
    m8 = E.export_shards(_docs(), out, n_shards=8)
    assert m8["n_shards"] == 8 and m8["total_rows"] == 300


def test_stratified_sample_rates():
    n = 4000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(["en" if i % 2 else "de" for i in range(n)]),
            }
        )
    )
    got = E.stratified_sample(ds, {"en": "19"}, default="7f").to_pandas()
    en = (got["lang"] == "en").sum()
    de = (got["lang"] == "de").sum()
    # en ~ 26/256 of 2000 ~= 203, de ~ 128/256 of 2000 = 1000
    assert 120 < en < 300
    assert 850 < de < 1150
    # determinism
    again = E.stratified_sample(ds, {"en": "19"}, default="7f").to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


def test_kmv_sample_partition_invariant_and_quantiles():
    from defactonlp_ray.functions.sketches import kmv_quantiles, kmv_sample

    n = 3000
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "n_chars": pa.array([(i * 37) % 1000 for i in range(n)], pa.int64()),
        }
    )
    a = kmv_sample(ray.data.from_arrow(tbl).repartition(1), k=128)
    b = kmv_sample(ray.data.from_arrow(tbl).repartition(11), k=128)
    assert a == b  # merge-lossless: bottom-k invariant to partitioning
    assert len(a) == 128
    # hash sample approximates uniform: p50 of (i*37)%1000 is ~500
    q = kmv_quantiles(ray.data.from_arrow(tbl), k=512)
    assert abs(q["p50"] - 500) < 120
    assert q["p95"] > q["p50"]
