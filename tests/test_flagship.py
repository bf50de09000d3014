"""Flagship pipeline test (SURVEY.md §3.1-§3.2): pages parquet -> dedup ->
extract-validate -> doc ids -> index -> NER+BM25 retrieval -> evaluation
join against fixture evidence."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from defactonlp_ray import fixtures
from defactonlp_ray.pipelines import flagship
from defactonlp_ray.stages import sentences as sent_stage


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    work = tmp_path_factory.mktemp("flagship")
    pages_path = os.path.join(str(work), "pages.parquet")
    pq.write_table(fixtures.make_pages(800), pages_path)
    idx = os.path.join(str(work), "index")
    pages = ray.data.read_parquet(pages_path)
    index_dir, docs = flagship.build_pages_index(
        pages, idx, seg_docs=256, lang="en"
    )
    return index_dir, docs.materialize()


def test_prepare_docs_contract(built):
    _, docs = built
    pdf = docs.to_pandas()
    assert list(pdf.columns) == ["doc_id", "url", "text", "title_norm"]
    assert pdf["url"].is_unique
    assert sorted(pdf["doc_id"]) == list(range(len(pdf)))
    # doc_id is url-rank (pinned §7.6.1)
    assert list(pdf.sort_values("doc_id")["url"]) == sorted(pdf["url"])
    # fused as-of dedup keeps the LATEST crawl per url (F5 semantics)
    raw = fixtures.make_pages(800).to_pandas()
    raw = raw[raw["lang"] == "en"]
    want = raw.sort_values(["url", "warc_ts"]).drop_duplicates("url", keep="last")
    merged = pdf.merge(want[["url", "text"]], on="url", suffixes=("", "_want"))
    assert (merged["text"] == merged["text_want"]).all()
    assert len(pdf) == len(want)


def test_prepare_docs_content_dedup():
    pages = ray.data.from_arrow(fixtures.make_pages(600))
    with_dup = flagship.prepare_docs(pages, lang=None).to_pandas()
    deduped = flagship.prepare_docs(pages, lang=None, content_dedup=True).to_pandas()
    assert len(deduped) < len(with_dup)  # fixtures plant ~2% content dups
    assert deduped["text"].is_unique
    # ids stay dense ranks after dedup
    assert sorted(deduped["doc_id"]) == list(range(len(deduped)))


def test_retrieval_routes(built):
    index_dir, docs = built
    claims = ray.data.from_arrow(fixtures.make_claims(30, n_pages=800))
    res = flagship.retrieve(index_dir, claims, docs, k=5).to_pandas()
    assert set(res["route"]) == {"bm25", "ner"}
    # per-claim dedup: no repeated doc for one claim
    assert not res.duplicated(["query_id", "doc_id"]).any()
    # every claim got some candidates
    assert res["query_id"].nunique() >= 25
    # NER-route rows exist because ~30% of fixture titles are bare entities
    ner_rows = res[res["route"] == "ner"]
    assert len(ner_rows) > 0


def test_sentence_retrieval_over_retrieved_docs(built):
    index_dir, docs = built
    claims_tbl = fixtures.make_claims(10, n_pages=800)
    claims = ray.data.from_arrow(claims_tbl)
    res = flagship.retrieve(index_dir, claims, docs, k=3).to_pandas()
    from defactonlp_ray.functions.tokenizer import tokenize

    per_claim = (
        res.groupby("query_id")["doc_id"].apply(list).to_dict()
    )
    claim_terms = {
        r["query_id"]: tokenize(r["claim"]) for r in claims_tbl.to_pylist()
    }
    triples = [
        (qid, dids, claim_terms[qid]) for qid, dids in per_claim.items()
    ]
    sents = sent_stage.explode_sentences(docs)
    wanted = {d for _, dids, _ in triples for d in dids}
    sents = sent_stage.semi_join_docs(sents, wanted)
    top = sent_stage.score_sentences_vs_claims(sents, triples, top_n=5).to_pandas()
    assert not top.empty
    assert (top.groupby("query_id").size() <= 5).all()
    assert set(top["doc_id"]) <= wanted
