"""Golden rank-identity against the COMMITTED oracle output (SURVEY.md
§5.3): the engine must reproduce goldens/golden_topk.parquet docids and
float64 scores bit-for-bit.  golden_meta.json version pins fail loudly
instead of comparing stale goldens."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from defactonlp_ray import fixtures, oracle
from defactonlp_ray.functions.extract import EXTRACTOR_VERSION
from defactonlp_ray.functions.ner import NER_VERSION
from defactonlp_ray.functions.tokenizer import TOKENIZER_VERSION
from defactonlp_ray.stages import search as S
from defactonlp_ray.stages.index_build import build_index

GOLDENS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")


@pytest.fixture(scope="module")
def meta():
    with open(os.path.join(GOLDENS, "golden_meta.json")) as f:
        return json.load(f)


def test_golden_versions_current(meta):
    assert meta["tokenizer_version"] == TOKENIZER_VERSION
    assert meta["extractor_version"] == EXTRACTOR_VERSION
    assert meta["ner_version"] == NER_VERSION
    assert meta["oracle_version"] == oracle.ORACLE_VERSION
    assert meta["fixtures_version"] == fixtures.FIXTURES_VERSION


def test_engine_matches_committed_goldens(tmp_path, meta):
    n = meta["n_docs"]
    pages = fixtures.make_pages(n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pages["text"],
            }
        )
    )
    idx = str(tmp_path / "golden_idx")
    build_index(ds, idx, seg_docs=512)
    queries = fixtures.make_query_terms(meta["n_queries"])
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in queries], pa.int64()),
                "terms": pa.array([t for _, t in queries], pa.list_(pa.string())),
            }
        )
    )
    got = S.search(idx, qds, k=meta["k"]).to_pandas()
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = (
        pq.read_table(os.path.join(GOLDENS, "golden_topk.parquet"))
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["query_id"]) == list(want["query_id"])
    assert list(got["doc_id"]) == list(want["doc_id"])
    # float64 bit-for-bit
    assert list(got["score"]) == list(want["score"])
