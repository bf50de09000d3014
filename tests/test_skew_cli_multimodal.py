"""Salted groupby exactness, CLI entry points, audio/video stub stages."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.stages import multimodal, skew


def test_salted_group_sum_exact():
    rng = np.random.default_rng(5)
    # heavy skew: half the rows share one key
    keys = np.where(rng.random(20000) < 0.5, "hot", rng.integers(0, 500, 20000).astype(str))
    vals = rng.integers(1, 100, 20000)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys.tolist()), "v": pa.array(vals, pa.int64())})
    ).repartition(8)
    from ray.data.aggregate import Sum

    plain = ds.groupby("k").aggregate(Sum("v", alias_name="sum")).to_pandas()
    salted = skew.salted_group_sum(ds, "k", "v", salt=16, alias="sum").to_pandas()
    a = plain.sort_values("k").reset_index(drop=True)
    b = salted.sort_values("k").reset_index(drop=True)
    assert list(a["k"]) == list(b["k"])
    assert list(a["sum"]) == list(b["sum"])


def test_audio_stub_pipeline():
    base = ray.data.from_items([{"doc_id": i} for i in range(30)])
    out = (
        multimodal.add_fake_audio(base)
        .map_batches(
            multimodal.DecodeAudioStage,
            fn_constructor_kwargs={"strict": False},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    assert len(out) == 30
    for r in out:
        assert r["dec_sample_rate"] in (16000, 44100)
        assert r["rms"] > 0
        assert "audio" not in r


def test_frame_sample():
    ds = ray.data.from_items(
        [{"doc_id": 1, "frames": list(range(25))}]
    )
    out = multimodal.frame_sample(ds, every_n=10).take_all()
    assert [(r["frame_idx"], r["frame"]) for r in out] == [(0, 0), (10, 10), (20, 20)]


@pytest.mark.parametrize("mode", ["taat", "tfidf"])
def test_cli_build_and_search(tmp_path, mode):
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(fixtures.make_pages(300), pages_path)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "defactonlp_ray.cli", "build",
         "--pages", pages_path, "--index", idx, "--seg-docs", "128",
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["docs"] > 0 and info["segments"] >= 2

    claims_path = str(tmp_path / "claims.parquet")
    pq.write_table(fixtures.make_claims(5, n_pages=300), claims_path)
    r2 = subprocess.run(
        [sys.executable, "-m", "defactonlp_ray.cli", "search",
         "--index", idx, "--claims", claims_path, "--k", "3",
         "--mode", mode, "--num-cpus", "4", "--limit", "50"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    rows = [json.loads(l) for l in r2.stdout.strip().splitlines() if l.startswith("{")]
    assert rows and {"query_id", "rank", "doc_id", "score"} <= set(rows[0])


def test_cli_append_and_compact(tmp_path):
    import pyarrow as pa

    pages = fixtures.make_pages(400)
    docs_a = pa.table(
        {"doc_id": pa.array(range(250), pa.int64()),
         "text": pages["text"].slice(0, 250)}
    )
    docs_b = pa.table(
        {"doc_id": pa.array(range(250, 400), pa.int64()),
         "text": pages["text"].slice(250)}
    )
    a_path = str(tmp_path / "a.parquet")
    b_path = str(tmp_path / "b.parquet")
    pq.write_table(docs_a, a_path)
    pq.write_table(docs_b, b_path)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, RAY_ADDRESS="local")

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "defactonlp_ray.cli", *args,
             "--num-cpus", "4"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    # build directly from the docs parquet via the library (the build
    # subcommand expects raw pages); append + compact via the CLI
    import ray.data

    from defactonlp_ray.stages.index_build import build_index

    build_index(ray.data.read_parquet(a_path), idx, seg_docs=100)
    info = run("append", "--docs", b_path, "--index", idx,
               "--seg-docs", "100")
    assert info["docs"] == 400
    info = run("compact", "--index", idx, "--target-seg-docs", "200")
    assert info["merges"] >= 1
    claims_path = str(tmp_path / "claims.parquet")
    pq.write_table(fixtures.make_claims(3, n_pages=400), claims_path)
    r = subprocess.run(
        [sys.executable, "-m", "defactonlp_ray.cli", "search",
         "--index", idx, "--claims", claims_path, "--k", "3",
         "--num-cpus", "4", "--limit", "20"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert rows


def test_cli_delete_and_expunge(tmp_path):
    import pyarrow as pa

    pages = fixtures.make_pages(300)
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "text": pages["text"]}),
        docs_path,
    )
    idx = str(tmp_path / "idx")
    env = dict(os.environ, RAY_ADDRESS="local")
    from defactonlp_ray.stages.index_build import build_index

    build_index(
        ray.data.read_parquet(docs_path), idx, seg_docs=128, resume=False
    )
    r = subprocess.run(
        [sys.executable, "-m", "defactonlp_ray.cli", "delete",
         "--index", idx, "--ids", "1,2,3,200"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["deleted"] == 4 and info["total_pending"] == 4
    r2 = subprocess.run(
        [sys.executable, "-m", "defactonlp_ray.cli", "expunge",
         "--index", idx, "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    info2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert info2["segments_rewritten"] == 2  # ids 1-3 in seg 0, 200 in seg 1
    assert info2["docs"] == 296
