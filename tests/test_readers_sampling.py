"""S4 claims reader (jsonl + parquet, nested evidence) and K4 seeded
sampling determinism."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.sources.readers import read_claims


def test_read_claims_parquet_roundtrip(tmp_path):
    claims = fixtures.make_claims(40, n_pages=200)
    path = str(tmp_path / "claims.parquet")
    pq.write_table(claims, path)
    ds = read_claims(path)
    got = ds.take_all()
    assert len(got) == 40
    ev = [r["evidence"] for r in got if r["evidence"]]
    assert ev and isinstance(ev[0][0], list)  # 3-deep nesting preserved


def test_read_claims_jsonl(tmp_path):
    claims = fixtures.make_claims(25, n_pages=100).to_pylist()
    path = str(tmp_path / "claims.jsonl")
    with open(path, "w") as f:
        for r in claims:
            f.write(json.dumps(r) + "\n")
    ds = read_claims(path)
    got = sorted(ds.take_all(), key=lambda r: r["query_id"])
    assert len(got) == 25
    assert got[0]["claim"] == claims[0]["claim"]
    # nested evidence survives the json reader
    want_ev = [r["evidence"] for r in claims]
    got_ev = [r["evidence"] for r in got]
    assert got_ev == want_ev


def test_seeded_sampling_deterministic(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    a = sorted(r["doc_id"] for r in ds.random_sample(0.3, seed=42).take_all())
    b = sorted(r["doc_id"] for r in ds.random_sample(0.3, seed=42).take_all())
    c = sorted(r["doc_id"] for r in ds.random_sample(0.3, seed=7).take_all())
    assert a == b
    assert a != c
