"""Dedup family tests (D1/D2/F5 + near-dup variants) against planted
fixture duplicates and small python oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.stages import dedup


def _pages_ds(n=800):
    pages = fixtures.make_pages(n)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "url": pages["url"],
            "warc_ts": pages["warc_ts"],
            "text": pages["text"],
        }
    )
    return t, ray.data.from_arrow(t)


def test_exact_dedup_matches_python_oracle():
    t, ds = _pages_ds()
    out = dedup.exact_dedup(ds, text_col="text", id_col="doc_id").to_pandas()
    # oracle: min doc_id per distinct text
    df = t.to_pandas()
    want = df.sort_values("doc_id").drop_duplicates("text", keep="first")
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    assert len(out) < len(df)  # fixtures plant content dups


def test_url_dedup_latest_matches_oracle():
    t, ds = _pages_ds()
    out = dedup.url_dedup_latest(ds).to_pandas()
    df = t.to_pandas()
    want = df.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="last")
    got = out.sort_values("url").reset_index(drop=True)
    want = want.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert len(got) < len(df)  # fixtures plant url dups


def test_minhash_lsh_finds_planted_exact_dups():
    t, ds = _pages_ds(600)
    df = t.to_pandas()
    dup_groups = df.groupby("text")["doc_id"].apply(list)
    planted = set()
    for ids in dup_groups:
        if len(ids) > 1:
            ids = sorted(ids)
            for b in ids[1:]:
                planted.add((ids[0], b))
    assert planted, "fixture should contain exact dups"
    cand = dedup.minhash_lsh_candidates(ds).to_pandas()
    got = set(zip(cand["id_a"].astype(int), cand["id_b"].astype(int)))
    # identical texts have identical signatures -> all planted pairs found
    missing = {(a, b) for (a, b) in planted if (a, b) not in got}
    assert not missing, missing
    # verification keeps only true near-dups
    verified = dedup.verify_jaccard_pairs(
        ray.data.from_pandas(cand.astype({"id_a": np.int64, "id_b": np.int64})),
        dict(zip(df["doc_id"], df["text"])),
        threshold=0.9,
    ).to_pandas()
    vgot = set(zip(verified["id_a"].astype(int), verified["id_b"].astype(int)))
    assert planted <= vgot
    for _, r in verified.iterrows():
        assert r["jaccard"] >= 0.9


def test_simhash_identical_and_hamming():
    a = dedup.simhash64("alpha beta gamma delta epsilon zeta eta theta")
    b = dedup.simhash64("alpha beta gamma delta epsilon zeta eta theta")
    assert a == b
    c = dedup.simhash64("totally different words entirely unrelated content here")
    assert bin(a ^ c).count("1") > 4


def test_simhash_neardup_pairs_find_exact_dups():
    t, ds = _pages_ds(400)
    df = t.to_pandas()
    planted = set()
    for ids in df.groupby("text")["doc_id"].apply(sorted):
        for b in ids[1:]:
            planted.add((ids[0], b))
    out = dedup.simhash_neardup_pairs(ds, max_hamming=3).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert planted <= got


def test_embedding_neardup_pairs(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = dedup.embedding_neardup_pairs(ds, threshold=0.4).to_pandas()
    # oracle check on the full (tiny) matrix
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    cos = np.round((m @ m.T) / norms[:, None] / norms[None, :], 6)
    ia, ib = np.nonzero((cos >= 0.4) & (ids[:, None] < ids[None, :]))
    want = set(zip(ids[ia], ids[ib]))
    assert want, "threshold should produce at least one pair at sf0.001"
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert got == want
