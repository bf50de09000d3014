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
