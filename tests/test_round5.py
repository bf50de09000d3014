"""Round-5 additions (VERDICT r04 next-round items).

#4: validate_extraction="sample" — deterministic md5-prefix sampled
extraction check as the at-scale default; full check still available.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

import ray
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.pipelines import flagship


def _prefix(url: str) -> str:
    return hashlib.md5(str(url).encode()).hexdigest()[:2]


def _corrupt_text(pages: pa.Table, row: int) -> pa.Table:
    texts = pages["text"].to_pylist()
    texts[row] = texts[row] + " CORRUPTED"
    return pages.set_column(
        pages.schema.get_field_index("text"), "text", pa.array(texts)
    )


def _rows_by_sampled(pages: pa.Table, *, sampled: bool, lang: str = "en"):
    urls = pages["url"].to_pylist()
    langs = pages["lang"].to_pylist()
    return [
        i for i, (u, l) in enumerate(zip(urls, langs))
        if l == lang
        and (_prefix(u) <= flagship.VALIDATE_SAMPLE_MAX) == sampled
    ]


def test_validate_sample_catches_sampled_row():
    pages = fixtures.make_pages(300)
    row = _rows_by_sampled(pages, sampled=True)[0]
    bad = _corrupt_text(pages, row)
    with pytest.raises(Exception, match="extraction invariant"):
        flagship.prepare_docs(
            ray.data.from_arrow(bad), validate_extraction="sample"
        ).materialize()


def test_validate_sample_skips_unsampled_row_full_catches_it():
    pages = fixtures.make_pages(300)
    row = _rows_by_sampled(pages, sampled=False)[0]
    bad = _corrupt_text(pages, row)
    # sample mode does not re-extract this row -> no raise
    n = flagship.prepare_docs(
        ray.data.from_arrow(bad), validate_extraction="sample"
    ).materialize().count()
    assert n > 0
    # full mode still catches it (tests/fixtures default)
    with pytest.raises(Exception, match="extraction invariant"):
        flagship.prepare_docs(
            ray.data.from_arrow(bad), validate_extraction=True
        ).materialize()


def test_evaluate_retrieval_join_route_matches_dict(tmp_path, monkeypatch):
    """VERDICT r04 #2: the distributed-join url attach must equal the
    driver-dict fast path, and 'auto' must pick the join above the
    broadcast limit."""
    from defactonlp_ray.stages import evaluate as EV

    n = 400
    pages = fixtures.make_pages(n)
    idx = str(tmp_path / "idx")
    index_dir, docs = flagship.build_pages_index(
        ray.data.from_arrow(pages), idx, seg_docs=256, lang=None
    )
    docs = docs.materialize()
    claims = ray.data.from_arrow(fixtures.make_claims(30, n_pages=n))
    res = flagship.retrieve(index_dir, claims, docs, k=10)
    res = res.select_columns(["query_id", "rank", "doc_id", "score"]).materialize()

    a = EV.evaluate_retrieval(res, claims, docs=docs, k=10, url_route="dict")
    b = EV.evaluate_retrieval(res, claims, docs=docs, k=10, url_route="join")
    assert a.equals(b)
    # corpus "above the broadcast limit": shrink the limit so auto picks join
    monkeypatch.setattr(EV, "URL_DICT_LIMIT", 10)
    c = EV.evaluate_retrieval(res, claims, docs=docs, k=10)
    assert a.equals(c)


SF001 = "/root/testdata/sf0.001"


def test_nsw_graph_matches_serial_and_recall_floor(tmp_path):
    """VERDICT r04 missing #4: the partitioned small-world graph route.
    Distributed build+search must equal the serial same-spec replay
    bit-for-bit, and recall@10 vs brute must clear a floor on the
    near-random fixture vectors."""
    import numpy as np

    from defactonlp_ray.pipelines import pinned
    from defactonlp_ray.pipelines.queries import q_ann_hnsw, q_ann_topk

    got = q_ann_hnsw(SF001).reset_index(drop=True)
    want = pinned.serial_ann_nsw(SF001).reset_index(drop=True)
    assert got[["query_id", "rank", "vec_id"]].equals(
        want[["query_id", "rank", "vec_id"]]
    )
    assert np.allclose(got["score"], want["score"])
    brute = q_ann_topk(SF001)
    recalls = []
    for qid, g in brute.groupby("query_id"):
        truth = set(g["vec_id"])
        hit = set(got[got["query_id"] == qid]["vec_id"])
        recalls.append(len(truth & hit) / len(truth))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_nsw_block_split_invariant(tmp_path):
    """The per-partition graph build must not depend on input block
    boundaries (map_groups sees whole partitions either way)."""
    import numpy as np
    import pyarrow.parquet as pq2

    from defactonlp_ray.stages import ann

    t = pq2.read_table(f"{SF001}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    a = ray.data.from_arrow(t).repartition(1)
    b = ray.data.from_arrow(t).repartition(7)
    rows = sorted(t.to_pylist(), key=lambda r: r["vec_id"])[:3]
    q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    res = []
    for i, ds in enumerate((a, b)):
        idx = str(tmp_path / f"nsw{i}")
        ann.build_nsw_index(ds, idx, n_lists=4, m=6, ef_construction=24)
        res.append(
            ann.knn_nsw(idx, q, k=5, n_probe=2, ef_search=24)
            .reset_index(drop=True)
        )
    assert res[0].equals(res[1])


def test_mixed_tokenizer_cjk_bigrams_and_latin_parity():
    """VERDICT r04 missing #5: the codepoint-class CJK fallback.
    Vectorized column path == pure-Python pinned path; Latin-only text
    tokenizes identically to simple-v1; CJK runs emit Lucene
    CJKAnalyzer-style overlapping bigrams."""
    from defactonlp_ray.functions.tokenizer import (
        tokenize,
        tokenize_mixed,
        tokenize_mixed_column,
    )

    cases = [
        "Hello 世界和平 world", "中", "abc中文def", "ひらがなとカタカナ",
        "한국어 text", "", "no cjk here 42", "混合mixed混合",
        "  界  ", "a中b中c", "語", "ＡＢＣ",  # fullwidth latin is dropped
    ]
    col = tokenize_mixed_column(pa.array(cases)).to_pylist()
    assert col == [tokenize_mixed(c) for c in cases]
    assert tokenize_mixed("Hello 世界和平 world") == [
        "hello", "世界", "界和", "和平", "world"]
    assert tokenize_mixed("中") == ["中"]
    latin = ["The Quick brown-fox 42!", "a  b\tc", "", "x"]
    assert [tokenize_mixed(c) for c in latin] == [tokenize(c) for c in latin]


def test_cjk_tokens_entry_matches_serial():
    from defactonlp_ray.pipelines import pinned
    from defactonlp_ray.pipelines.queries import q_cjk_tokens

    got = q_cjk_tokens(SF001).reset_index(drop=True)
    want = pinned.serial_cjk_tokens(SF001).reset_index(drop=True)
    assert got.equals(want)


def test_rows_with_keys_join_route_equals_broadcast(monkeypatch):
    """The bucket prefilter's two physical routes (broadcast is_in under
    BROADCAST_BUCKET_LIMIT, left_semi hash join above) must agree."""
    import numpy as np

    from defactonlp_ray.stages import dedup as D

    rng = np.random.default_rng(11)
    rows = pa.table({
        "doc_id": pa.array(np.arange(4000), pa.int64()),
        "bkey": pa.array(rng.integers(0, 500, 4000), pa.int64()),
    })
    keys = pa.table({"bkey": pa.array(np.arange(0, 500, 3), pa.int64())})
    ds = ray.data.from_arrow(rows)
    kds = ray.data.from_arrow(keys)
    a = (
        D._rows_with_keys(ds, "bkey", kds, keys.num_rows)
        .to_pandas().sort_values(["doc_id"]).reset_index(drop=True)
    )
    monkeypatch.setattr(D, "BROADCAST_BUCKET_LIMIT", 1)
    b = (
        D._rows_with_keys(ds, "bkey", kds, keys.num_rows)
        .to_pandas().sort_values(["doc_id"]).reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)


def test_cut_lineage_preserves_rows():
    from defactonlp_ray.stages.util import cut_lineage

    t = pa.table({"x": pa.array(range(1000), pa.int64())})
    mat = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()
    cut = cut_lineage(mat)
    assert cut.count() == 1000
    assert sorted(r["x"] for r in cut.take_all()) == list(range(1000))


def test_validate_modes_same_output_on_clean_corpus():
    pages = fixtures.make_pages(200)
    out = {}
    for mode in ("sample", True, False):
        out[mode] = (
            flagship.prepare_docs(
                ray.data.from_arrow(pages), validate_extraction=mode
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert out["sample"].equals(out[True])
    assert out["sample"].equals(out[False])
