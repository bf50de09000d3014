"""Tests: docids, ANN, sentences, NER, multimodal, textstats."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.functions import ner, textstats
from defactonlp_ray.stages import ann, docids, multimodal, sentences


def test_assign_doc_ids_is_url_rank():
    pages = fixtures.make_pages(300)
    # dedupe urls first (assignment assumes unique keys)
    import pandas as pd

    df = pages.to_pandas().drop_duplicates("url", keep="last")
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=1))  # shuffled input
    out = docids.assign_doc_ids(ds, key="url").to_pandas()
    out = out.sort_values("doc_id")
    assert list(out["url"]) == sorted(df["url"])
    assert list(out["doc_id"]) == list(range(len(df)))


def test_knn_brute_matches_numpy_oracle(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = m[:3]
    res = ann.knn_brute(ds, q, k=5)
    norms = np.linalg.norm(m, axis=1)
    qn = np.linalg.norm(q, axis=1)
    cos = np.round((q @ m.T) / qn[:, None] / norms[None, :], 6)
    for qi in range(3):
        order = np.lexsort((ids, -cos[qi]))[:5]
        want = list(ids[order])
        got = list(res[res["query_id"] == qi].sort_values("rank")["vec_id"])
        assert got == want


def test_knn_lsh_recall_vs_brute(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = m[:5]
    brute = ann.knn_brute(ds, q, k=10)
    # random embeddings: true neighbors sit at cos~0.3, so use short codes
    lsh = ann.knn_lsh(ds, q, k=10, n_bits=4, n_tables=8)
    recalls = []
    for qi in range(5):
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        l = set(lsh[lsh["query_id"] == qi]["vec_id"])
        recalls.append(len(b & l) / len(b))
        # the query IS row qi of the table -> exact self-match must be rank 1
        top1 = lsh[lsh["query_id"] == qi].sort_values("rank").iloc[0]
        assert top1["score"] == 1.0
    assert np.mean(recalls) >= 0.4, recalls  # approximate, but not broken


def test_sentence_split_and_explode():
    assert sentences.split_sentences("a b\nc d. e f.") == ["a b", "c d", "e f."]
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": "t one\nbody one. body two"}]
    )
    out = sentences.explode_sentences(ds).take_all()
    assert [(r["sent_id"], r["text"]) for r in out] == [
        (0, "t one"), (1, "body one"), (2, "body two"),
    ]


def test_evidence_flatten():
    claims = ray.data.from_arrow(fixtures.make_claims(30, n_pages=100))
    flat = sentences.flatten_evidence(claims).take_all()
    assert flat, "non-NEI claims must contribute evidence rows"
    for r in flat:
        assert r["page"].startswith("https://example.org/d/")
        assert r["sent"] == 0


def test_ner_rules():
    assert ner.extract_entities('Alice visited Paris with "The Big Book"') == [
        "The Big Book", "Alice", "Paris",
    ]
    assert ner.extract_entities("nothing capital here") == []
    assert ner.extract_entities("New York City is big") == ["New York City"]


def test_textstats_quality():
    out = textstats.quality_batch(pa.array(["the cat sat on the mat", ""]))
    r = out.to_pylist()[0]
    assert r["n_tokens"] == 6 and r["n_stopwords"] == 3  # the, on, the
    assert r["stop_ratio"] == 3 / 6
    assert r["mean_token_len"] == (3 + 3 + 3 + 2 + 3 + 3) / 6
    z = out.to_pylist()[1]
    assert z["n_tokens"] == 0 and z["stop_ratio"] == 0.0


def test_lang_id():
    assert textstats.lang_id("the cat is on the mat and it is fine") == "en"
    assert textstats.lang_id("der Hund ist das beste und die Katze") == "de"
    assert textstats.lang_id("这是一个中文句子") == "zh"
    assert textstats.lang_id("xyzzy") == "und"


def test_multimodal_stub_pipeline():
    base = ray.data.from_items([{"doc_id": i} for i in range(50)])
    with_img = multimodal.add_fake_images(base)
    out = multimodal.decode_images(with_img, strict=False).take_all()
    assert len(out) == 50
    for r in out:
        assert r["dec_width"] == 64 + (r["doc_id"] % 8) * 32
        assert r["dec_channels"] == 3
        assert 0 <= r["pixel_mean"] <= 255
        assert "image" not in r  # binary dropped after decode


def test_multimodal_strict_raises():
    base = ray.data.from_items([{"doc_id": 1}])
    with_img = multimodal.add_fake_images(base)
    with pytest.raises(Exception):
        multimodal.decode_images(with_img, strict=True).take_all()


def test_hamming_kernel_matches_naive():
    from defactonlp_ray.stages.ann import _hamming, binarize_signs

    rng = np.random.default_rng(11)
    m = rng.standard_normal((40, 128))
    q = rng.standard_normal((5, 128))
    words, qwords = binarize_signs(m), binarize_signs(q)
    got = _hamming(words, qwords)
    bits_m = m >= 0
    bits_q = q >= 0
    want = (bits_q[:, None, :] != bits_m[None, :, :]).sum(axis=2)
    assert np.array_equal(got, want)


def test_binarize_signs_rejects_ragged_dim():
    import pytest as _pytest

    from defactonlp_ray.stages.ann import binarize_signs

    with _pytest.raises(ValueError):
        binarize_signs(np.zeros((3, 70)))
